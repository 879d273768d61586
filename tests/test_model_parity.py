"""Numerical parity of the JAX model vs torch reference math, with weights
converted via paths_tpu.convert. These are the central fidelity tests."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from helpers_torch import (
    TorchAggregator,
    TorchLSTMCell,
    TorchProcessor,
    TorchRecursive,
    to_numpy_sd,
)
from paths_tpu.config import Config, PATHSProcessorConfig
from paths_tpu.convert import (
    aggregator_from_torch,
    lstm_from_torch,
    recursive_from_torch,
)
from paths_tpu.models.aggregator import aggregator_apply, pos_encode_1d, pos_encode_2d
from paths_tpu.models.batch import PatchBag
from paths_tpu.models.recursive import recursive_apply, recursive_init
from paths_tpu.nn.lstm import lstm_cell_apply

ATOL = 2e-5


def small_config(**model_kw) -> Config:
    mc = dict(patch_embed_dim=32, trans_dim=16, trans_heads=2, trans_layers=2,
              importance_mlp_hidden_dim=24, hierarchical_ctx_mlp_hidden_dim=20,
              pos_encoding_mode="2d", dropout=0.0, patch_size=256)
    mc.update(model_kw)
    return Config(model_config=PATHSProcessorConfig(**mc), num_levels=3,
                  top_k_patches=[2, 2], nbins=4, task="survival")


def torch_kwargs(cfg: Config):
    mc = cfg.model_config
    return dict(d=mc.patch_embed_dim, trans_dim=mc.trans_dim,
                heads=mc.trans_heads, layers=mc.trans_layers,
                imp_hidden=mc.importance_mlp_hidden_dim,
                hdim=mc.hierarchical_ctx_mlp_hidden_dim,
                num_logits=cfg.nbins, slide_ctx_mode=mc.slide_ctx_mode,
                pos_mode=mc.pos_encoding_mode,
                importance_mode=mc.importance_mode,
                patch_size=mc.patch_size)


def test_lstm_cell_parity():
    torch.manual_seed(0)
    cell = TorchLSTMCell(8, 8, 6)
    params = lstm_from_torch(to_numpy_sd(cell), prefix="")

    xs = np.random.default_rng(0).normal(size=(3, 5, 8)).astype(np.float32)
    hs = np.random.default_rng(1).normal(size=(3, 5, 8)).astype(np.float32)
    cs = np.random.default_rng(2).normal(size=(3, 5, 6)).astype(np.float32)

    with torch.no_grad():
        th, tc = cell(torch.tensor(xs), torch.tensor(hs), torch.tensor(cs))
    jh, jc = lstm_cell_apply(params, jnp.asarray(xs), jnp.asarray(hs), jnp.asarray(cs))
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=ATOL)


def test_aggregator_parity_empty_cond():
    torch.manual_seed(1)
    input_dim, model_dim, heads, layers = 12, 16, 2, 2
    tagg = TorchAggregator(input_dim, model_dim, heads, layers).eval()
    sd = {"x." + k: v for k, v in to_numpy_sd(tagg).items()}
    jagg = aggregator_from_torch(sd, "x", heads, layers)

    rng = np.random.default_rng(3)
    b, n = 3, 7
    fts = rng.normal(size=(b, n, input_dim)).astype(np.float32)
    locs = rng.integers(0, 30, size=(b, n, 2))
    num_ims = np.array([7, 4, 1])
    mask = np.arange(n)[None] < num_ims[:, None]
    fts = fts * mask[..., None]  # padding rows zero, like collate_fn

    for mode in ["1d", "2d"]:
        with torch.no_grad():
            xs_t = tagg.encode(torch.tensor(fts), torch.tensor(locs), mode)
            out_t = tagg(torch.zeros(b, 0, model_dim), xs_t, None,
                         torch.tensor(num_ims))
        if mode == "1d":
            xs_j = pos_encode_1d(jagg, jnp.asarray(fts))
        else:
            xs_j = pos_encode_2d(jagg, jnp.asarray(fts), jnp.asarray(locs))
        np.testing.assert_allclose(np.asarray(xs_j), xs_t.numpy(), atol=ATOL)
        out_j = aggregator_apply(jagg, jnp.zeros((b, 0, model_dim)), xs_j,
                                 None, jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=ATOL)


def test_aggregator_parity_empty_cond_nonzero_out_proj_bias():
    """Trained checkpoints have nonzero cross-attn out_proj.bias (it
    receives gradient); with the reference's empty encoder sequence, torch
    MHA over zero-length memory still emits that bias. Fresh torch init
    zeroes the bias, so the plain empty-cond test cannot catch a
    converted-checkpoint regression here (ADVICE.md round-1 high)."""
    torch.manual_seed(4)
    input_dim, model_dim, heads, layers = 12, 16, 2, 2
    tagg = TorchAggregator(input_dim, model_dim, heads, layers).eval()
    with torch.no_grad():
        for layer in tagg.transformer.decoder.layers:
            layer.multihead_attn.out_proj.bias.normal_()
    sd = {"x." + k: v for k, v in to_numpy_sd(tagg).items()}
    jagg = aggregator_from_torch(sd, "x", heads, layers)

    rng = np.random.default_rng(6)
    b, n = 2, 5
    fts = rng.normal(size=(b, n, input_dim)).astype(np.float32)
    locs = rng.integers(0, 30, size=(b, n, 2))
    num_ims = np.array([5, 3])
    mask = np.arange(n)[None] < num_ims[:, None]
    fts = fts * mask[..., None]

    with torch.no_grad():
        xs_t = tagg.encode(torch.tensor(fts), torch.tensor(locs), "2d")
        out_t = tagg(torch.zeros(b, 0, model_dim), xs_t, None,
                     torch.tensor(num_ims))
    xs_j = pos_encode_2d(jagg, jnp.asarray(fts), jnp.asarray(locs))
    out_j = aggregator_apply(jagg, jnp.zeros((b, 0, model_dim)), xs_j,
                             None, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=ATOL)


def test_aggregator_parity_nonempty_cond():
    """Exercise the encoder + cross-attention path (conditional sequence)."""
    torch.manual_seed(2)
    model_dim, heads, layers = 16, 2, 1
    tagg = TorchAggregator(model_dim, model_dim, heads, layers).eval()
    sd = {"a." + k: v for k, v in to_numpy_sd(tagg).items()}
    jagg = aggregator_from_torch(sd, "a", heads, layers)

    rng = np.random.default_rng(5)
    b, n, m = 2, 5, 4
    tgt = rng.normal(size=(b, n, model_dim)).astype(np.float32)
    src = rng.normal(size=(b, m, model_dim)).astype(np.float32)
    len2 = np.array([5, 3])
    len1 = np.array([4, 2])
    mask2 = np.arange(n)[None] < len2[:, None]
    mask1 = np.arange(m)[None] < len1[:, None]

    with torch.no_grad():
        out_t = tagg(torch.tensor(src), torch.tensor(tgt),
                     torch.tensor(len1), torch.tensor(len2))
    out_j = aggregator_apply(jagg, jnp.asarray(src), jnp.asarray(tgt),
                             jnp.asarray(mask1), jnp.asarray(mask2))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=ATOL)


def _random_bag(cfg: Config, depth, b, n, seed=0):
    mc = cfg.model_config
    rng = np.random.default_rng(seed)
    ds, dp = mc.ctx_dim()
    fts = rng.normal(size=(b, n, mc.patch_embed_dim)).astype(np.float32)
    locs = (rng.integers(0, 40, size=(b, n, 2)) * mc.patch_size)
    num_ims = rng.integers(1, n + 1, size=b)
    num_ims[0] = n  # reference asserts max == N
    mask = np.arange(n)[None] < num_ims[:, None]
    fts = fts * mask[..., None]
    ctx_slide = rng.normal(size=(b, depth, ds)).astype(np.float32)
    ctx_patch = rng.normal(size=(b, n, depth, dp)).astype(np.float32)
    bag = PatchBag(fts=jnp.asarray(fts), locs=jnp.asarray(locs, jnp.int32),
                   mask=jnp.asarray(mask),
                   parent_inds=jnp.zeros((b, n), jnp.int32),
                   ctx_slide=jnp.asarray(ctx_slide),
                   ctx_patch=jnp.asarray(ctx_patch))
    return bag, fts, locs, num_ims, ctx_slide, ctx_patch


def _parity_case(model_kw, depth, seed):
    cfg = small_config(**model_kw)
    torch.manual_seed(seed)
    tmodel = TorchRecursive(cfg.num_levels, lstm=cfg.model_config.lstm,
                            **torch_kwargs(cfg)).eval()
    params = recursive_from_torch(to_numpy_sd(tmodel), cfg)

    bag, fts, locs, num_ims, ctx_slide, ctx_patch = _random_bag(
        cfg, depth, b=3, n=6, seed=seed + 10)
    with torch.no_grad():
        out_t = tmodel(depth, torch.tensor(fts), torch.tensor(locs),
                       torch.tensor(num_ims), torch.tensor(ctx_slide),
                       torch.tensor(ctx_patch))
    out_j = recursive_apply(params, cfg, depth, bag)

    np.testing.assert_allclose(np.asarray(out_j["logits"]),
                               out_t["logits"].numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out_j["ctx_slide"]),
                               out_t["ctx_slide"].numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out_j["importance"]),
                               out_t["importance"].numpy(), atol=ATOL)
    # ctx_patch: compare only valid rows (padding rows diverge by design —
    # reference computes LSTM state for them too but never uses them)
    mask = np.asarray(bag.mask)
    np.testing.assert_allclose(np.asarray(out_j["ctx_patch"])[mask],
                               out_t["ctx_patch"].numpy()[mask], atol=ATOL)


def test_processor_parity_lstm_level0():
    _parity_case({}, depth=0, seed=7)


def test_processor_parity_lstm_deeper():
    _parity_case({}, depth=2, seed=8)


def test_processor_parity_rnn_branch():
    _parity_case({"lstm": False}, depth=1, seed=9)


def test_processor_parity_concat_ctx():
    _parity_case({"slide_ctx_mode": "concat"}, depth=2, seed=11)


def test_processor_parity_1d_posenc():
    _parity_case({"pos_encoding_mode": "1d"}, depth=1, seed=12)


def test_gradient_parity():
    """d(sum logits)/d(params) matches torch autograd for key tensors."""
    cfg = small_config()
    torch.manual_seed(21)
    tmodel = TorchRecursive(cfg.num_levels, lstm=True, **torch_kwargs(cfg))
    params = recursive_from_torch(to_numpy_sd(tmodel), cfg)

    depth = 1
    bag, fts, locs, num_ims, ctx_slide, ctx_patch = _random_bag(
        cfg, depth, b=2, n=5, seed=30)

    out_t = tmodel(depth, torch.tensor(fts), torch.tensor(locs),
                   torch.tensor(num_ims), torch.tensor(ctx_slide),
                   torch.tensor(ctx_patch))
    out_t["logits"].sum().backward()

    def loss_fn(p):
        out = recursive_apply(p, cfg, depth, bag)
        return jnp.sum(out["logits"])

    grads = jax.grad(loss_fn)(params)

    g_cls_t = tmodel.procs[depth].classification_layer.weight.grad.numpy().T
    np.testing.assert_allclose(
        np.asarray(grads["procs"][depth]["classification"]["w"]), g_cls_t,
        atol=1e-4)
    g_lstm_t = tmodel.lstm.forget_gate[0].weight.grad.numpy().T
    np.testing.assert_allclose(
        np.asarray(grads["lstm"]["forget_gate"]["w"]), g_lstm_t, atol=1e-4)


def test_padding_invariance():
    """Adding padding to a bag must not change any valid output — the
    central static-shape correctness property (SURVEY.md §4)."""
    cfg = small_config()
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    bag, *_ = _random_bag(cfg, depth=1, b=2, n=5, seed=40)

    out_small = recursive_apply(params, cfg, 1, bag)

    pad = 4
    def pad_n(x, axis):
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(x, widths)

    big = PatchBag(fts=pad_n(bag.fts, 1), locs=pad_n(bag.locs, 1),
                   mask=pad_n(bag.mask, 1),
                   parent_inds=pad_n(bag.parent_inds, 1),
                   ctx_slide=bag.ctx_slide, ctx_patch=pad_n(bag.ctx_patch, 1))
    out_big = recursive_apply(params, cfg, 1, big)

    np.testing.assert_allclose(np.asarray(out_big["logits"]),
                               np.asarray(out_small["logits"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_big["importance"][:, :5]),
                               np.asarray(out_small["importance"]), atol=1e-5)
    assert np.all(np.asarray(out_big["importance"][:, 5:]) == 0)
