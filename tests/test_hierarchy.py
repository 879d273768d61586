"""End-to-end hierarchy engine parity vs the reference recursion semantics
(mirrored in helpers_refloop with torch), plus edge cases."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from helpers_refloop import ref_end2end
from helpers_torch import TorchRecursive, to_numpy_sd
from paths_tpu.convert import recursive_from_torch
from paths_tpu.engine.hierarchy import end2end_forward, end2end_loss
from paths_tpu.engine.tables import (
    bag_widths,
    build_level_table,
    level0_bag_arrays,
    stack_tables,
)
from paths_tpu.models.batch import PatchBag
from test_model_parity import small_config, torch_kwargs

ATOL = 3e-5


def make_grids(rng, dims, d, bg_fraction=0.3):
    """Random per-level dense grids with a background fraction."""
    grids = []
    for h, w in dims:
        g = rng.normal(size=(h, w, d)).astype(np.float32) + 0.1
        bg = rng.uniform(size=(h, w)) < bg_fraction
        g[bg] = 0.0
        grids.append(g)
    return grids


def jax_inputs(slide_grids, cfg):
    """Build the level-0 bag + per-level tables from dense grids."""
    mc = cfg.model_config
    p = mc.patch_size
    ds, dp = mc.ctx_dim()
    b = len(slide_grids)

    l0 = [level0_bag_arrays(g[0], p) for g in slide_grids]
    n0 = max(x[2] for x in l0)
    fts0 = np.zeros((b, n0, mc.patch_embed_dim), np.float32)
    locs0 = np.zeros((b, n0, 2), np.int32)
    mask0 = np.zeros((b, n0), bool)
    for i, (f, l, n) in enumerate(l0):
        fts0[i, :n], locs0[i, :n], mask0[i, :n] = f, l, True

    bag0 = PatchBag(
        fts=jnp.asarray(fts0), locs=jnp.asarray(locs0),
        mask=jnp.asarray(mask0),
        parent_inds=jnp.broadcast_to(jnp.arange(n0, dtype=jnp.int32)[None], (b, n0)),
        ctx_slide=jnp.zeros((b, 0, ds)), ctx_patch=jnp.zeros((b, n0, 0, dp)))

    widths = bag_widths(cfg.top_k_patches, cfg.num_levels, n0)
    tables = []
    for lvl in range(1, cfg.num_levels):
        per = [build_level_table(g[lvl], min_rows=widths[lvl])
               for g in slide_grids]
        tables.append(stack_tables(per, min_rows=widths[lvl]))
    return bag0, tables


def run_both(slide_grids, cfg, seed=0):
    torch.manual_seed(seed)
    tmodel = TorchRecursive(cfg.num_levels, lstm=cfg.model_config.lstm,
                            **torch_kwargs(cfg)).eval()
    params = recursive_from_torch(to_numpy_sd(tmodel), cfg)
    ds, dp = cfg.model_config.ctx_dim()

    with torch.no_grad():   # inference-only parity; grads not needed here
        ref_logits, ref_batches = ref_end2end(
            tmodel, slide_grids, cfg.num_levels, cfg.top_k_patches,
            cfg.model_config.patch_size, ds, dp)

    bag0, tables = jax_inputs(slide_grids, cfg)
    outs = end2end_forward(params, cfg, bag0, tables)
    return ref_logits.numpy(), ref_batches, outs


def visited_locs(bag, patch_size):
    """Set of (slide, y, x) patch coords of valid bag entries."""
    locs = np.asarray(bag.locs) // patch_size
    mask = np.asarray(bag.mask)
    return {(i, int(y), int(x))
            for i in range(mask.shape[0])
            for (y, x), m in zip(locs[i], mask[i]) if m}


def ref_visited(batch, patch_size):
    locs = batch["locs"].numpy() // patch_size
    num = batch["num_ims"].numpy()
    return {(i, int(y), int(x))
            for i in range(len(num)) for y, x in locs[i][: num[i]]}


def test_end2end_parity():
    """3 levels, 3 slides of different sizes: identical selections at every
    level and matching final logits."""
    cfg = small_config()
    rng = np.random.default_rng(42)
    d = cfg.model_config.patch_embed_dim
    slide_grids = [
        # level-1 grid (5, 7) is SMALLER than 2x level-0 (3, 4): edge
        # children go out of bounds, exercising the bounds filter
        make_grids(rng, [(3, 4), (5, 7), (10, 14)], d),
        make_grids(rng, [(2, 2), (4, 4), (8, 8)], d),
        make_grids(rng, [(4, 3), (8, 6), (16, 12)], d, bg_fraction=0.5),
    ]
    ref_logits, ref_batches, outs = run_both(slide_grids, cfg)

    p = cfg.model_config.patch_size
    for lvl in range(cfg.num_levels):
        assert visited_locs(outs[lvl]["bag"], p) == ref_visited(ref_batches[lvl], p), \
            f"level {lvl} selection mismatch"
    np.testing.assert_allclose(np.asarray(outs[-1]["logits"]), ref_logits,
                               atol=ATOL)


def test_end2end_parity_1d_posenc():
    """1D positional encodings index by BAG POSITION, so this only passes
    if the engine's compaction reproduces the reference's exact bag order
    at every level."""
    cfg = small_config(pos_encoding_mode="1d")
    rng = np.random.default_rng(21)
    d = cfg.model_config.patch_embed_dim
    slide_grids = [
        make_grids(rng, [(3, 4), (6, 8), (12, 16)], d, bg_fraction=0.4),
        make_grids(rng, [(2, 3), (4, 6), (8, 12)], d),
    ]
    ref_logits, ref_batches, outs = run_both(slide_grids, cfg)
    p = cfg.model_config.patch_size
    for lvl in range(cfg.num_levels):
        # order-sensitive comparison: the exact sequence of locs must match
        ref_locs = ref_batches[lvl]["locs"].numpy()
        num = ref_batches[lvl]["num_ims"].numpy()
        our_locs = np.asarray(outs[lvl]["bag"].locs)
        our_mask = np.asarray(outs[lvl]["bag"].mask)
        for j in range(len(slide_grids)):
            np.testing.assert_array_equal(
                our_locs[j][our_mask[j]], ref_locs[j][: num[j]],
                err_msg=f"bag order mismatch at level {lvl} slide {j}")
    np.testing.assert_allclose(np.asarray(outs[-1]["logits"]), ref_logits,
                               atol=ATOL)


def test_end2end_parity_keep_all():
    """top_k = -1 keeps every patch (reference slide.py:302-303)."""
    cfg = small_config()
    cfg.top_k_patches = [-1, 2]
    rng = np.random.default_rng(7)
    d = cfg.model_config.patch_embed_dim
    slide_grids = [make_grids(rng, [(2, 2), (4, 4), (8, 8)], d)]
    ref_logits, ref_batches, outs = run_both(slide_grids, cfg)
    p = cfg.model_config.patch_size
    for lvl in range(cfg.num_levels):
        assert visited_locs(outs[lvl]["bag"], p) == ref_visited(ref_batches[lvl], p)
    np.testing.assert_allclose(np.asarray(outs[-1]["logits"]), ref_logits,
                               atol=ATOL)


def test_fallback_no_valid_children():
    """Children of the kept parent are all background -> use every non-bg
    patch of the next grid with zeroed ctx (slide.py:334-352)."""
    cfg = small_config()
    cfg.num_levels = 3
    cfg.top_k_patches = [1, 1]
    d = cfg.model_config.patch_embed_dim
    rng = np.random.default_rng(3)

    g0 = rng.normal(size=(1, 1, d)).astype(np.float32) + 0.1   # one patch
    g1 = np.zeros((3, 3, d), np.float32)
    g1[2, 2] = rng.normal(size=d).astype(np.float32) + 0.1     # outside (0:2,0:2)
    g2 = rng.normal(size=(6, 6, d)).astype(np.float32) + 0.1

    ref_logits, ref_batches, outs = run_both([[g0, g1, g2]], cfg)
    p = cfg.model_config.patch_size
    assert ref_visited(ref_batches[1], p) == {(0, 2, 2)}
    for lvl in range(cfg.num_levels):
        assert visited_locs(outs[lvl]["bag"], p) == ref_visited(ref_batches[lvl], p)
    np.testing.assert_allclose(np.asarray(outs[-1]["logits"]), ref_logits,
                               atol=ATOL)


def test_fallback_entirely_background_level():
    """Next level fully background -> raw grid cells, zero features
    (slide.py:345-348). Grid kept <= 4K cells so the static cap is exact."""
    cfg = small_config()
    cfg.num_levels = 3
    cfg.top_k_patches = [1, 1]
    d = cfg.model_config.patch_embed_dim
    rng = np.random.default_rng(4)

    g0 = rng.normal(size=(1, 1, d)).astype(np.float32) + 0.1
    g1 = np.zeros((2, 2, d), np.float32)                       # ALL background
    g2 = rng.normal(size=(4, 4, d)).astype(np.float32) + 0.1

    ref_logits, ref_batches, outs = run_both([[g0, g1, g2]], cfg)
    p = cfg.model_config.patch_size
    assert ref_visited(ref_batches[1], p) == {(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1)}
    for lvl in range(2):
        assert visited_locs(outs[lvl]["bag"], p) == ref_visited(ref_batches[lvl], p)
    # Level 2 selection diverges from torch by design: the four level-1
    # fallback patches are identical zero-feature cells, so importances
    # tie exactly; lax.top_k deterministically keeps the LOWEST index
    # while torch.topk's tie order is unspecified (documented deviation).
    assert visited_locs(outs[2]["bag"], p) == {(0, 0, 0), (0, 0, 1),
                                               (0, 1, 0), (0, 1, 1)}


def test_bag_smaller_than_k():
    """Bags smaller than K: count = min(n, K) (slide.py:296)."""
    cfg = small_config()
    cfg.num_levels = 2
    cfg.top_k_patches = [50]
    d = cfg.model_config.patch_embed_dim
    rng = np.random.default_rng(5)
    slide_grids = [make_grids(rng, [(2, 2), (4, 4)], d, bg_fraction=0.0)]
    ref_logits, ref_batches, outs = run_both(slide_grids, cfg)
    p = cfg.model_config.patch_size
    for lvl in range(cfg.num_levels):
        assert visited_locs(outs[lvl]["bag"], p) == ref_visited(ref_batches[lvl], p)
    np.testing.assert_allclose(np.asarray(outs[-1]["logits"]), ref_logits,
                               atol=ATOL)


def test_bag_smaller_than_k_1d_posenc_order():
    """When a bag has n <= K patches, the reference still topk-sorts the
    kept patches by descending importance (slide.py:294-301) — it never
    short-circuits to bag order. With 1D positional encodings that order
    is observable in the logits, so this test fails if the engine keeps
    bag order for K >= n (ADVICE.md round-1 medium)."""
    cfg = small_config(pos_encoding_mode="1d")
    cfg.num_levels = 2
    cfg.top_k_patches = [50]  # K far above every bag size
    d = cfg.model_config.patch_embed_dim
    rng = np.random.default_rng(17)
    slide_grids = [make_grids(rng, [(2, 3), (4, 6)], d, bg_fraction=0.0),
                   make_grids(rng, [(2, 2), (4, 4)], d, bg_fraction=0.0)]
    ref_logits, ref_batches, outs = run_both(slide_grids, cfg)
    for lvl in range(cfg.num_levels):
        ref_locs = ref_batches[lvl]["locs"].numpy()
        num = ref_batches[lvl]["num_ims"].numpy()
        our_locs = np.asarray(outs[lvl]["bag"].locs)
        our_mask = np.asarray(outs[lvl]["bag"].mask)
        for j in range(len(slide_grids)):
            np.testing.assert_array_equal(
                our_locs[j][our_mask[j]], ref_locs[j][: num[j]],
                err_msg=f"bag order mismatch at level {lvl} slide {j}")
    np.testing.assert_allclose(np.asarray(outs[-1]["logits"]), ref_logits,
                               atol=ATOL)


def test_end2end_loss_and_grad():
    """Loss is finite and grads flow into every level's processor AND the
    shared LSTM through the recursion."""
    cfg = small_config()
    rng = np.random.default_rng(9)
    d = cfg.model_config.patch_embed_dim
    slide_grids = [make_grids(rng, [(2, 3), (4, 6), (8, 12)], d)
                   for _ in range(2)]
    torch.manual_seed(1)
    tmodel = TorchRecursive(cfg.num_levels, lstm=True, **torch_kwargs(cfg))
    params = recursive_from_torch(to_numpy_sd(tmodel), cfg)
    bag0, tables = jax_inputs(slide_grids, cfg)
    labels = {"survival_bin": jnp.array([1, 2]), "censored": jnp.array([0, 1])}

    def loss_fn(p):
        return end2end_loss(p, cfg, bag0, tables, labels)[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for i in range(cfg.num_levels):
        # importance multiplies features ("mul" mode) so every level's
        # importance head receives gradient
        g = grads["procs"][i]["importance_mlp"]["layers"][0]["w"]
        assert float(jnp.linalg.norm(g)) > 0, f"no grad into level {i}"
    assert float(jnp.linalg.norm(grads["lstm"]["forget_gate"]["w"])) > 0


def test_remat_gradients_match():
    """config.remat=True (per-level jax.checkpoint) must not change the
    loss or gradients — only when activations are (re)computed."""
    import dataclasses

    import jax

    from test_model_parity import small_config

    cfg = small_config()
    rng = np.random.default_rng(11)
    dims = [(2, 3), (4, 6), (8, 12)]
    slides = [make_grids(rng, dims, cfg.model_config.patch_embed_dim)
              for _ in range(2)]
    bag0, tables = jax_inputs(slides, cfg)
    from paths_tpu.models.recursive import recursive_init

    labels = {"survival_bin": jnp.asarray([1, 0]),
              "censored": jnp.asarray([0, 1])}
    params = recursive_init(jax.random.PRNGKey(3), cfg)

    def lf(p, c):
        return end2end_loss(p, c, bag0, tables, labels)[0]

    cfg_r = dataclasses.replace(cfg, remat=True)
    (l0, g0) = jax.value_and_grad(lambda p: lf(p, cfg))(params)
    (l1, g1) = jax.value_and_grad(lambda p: lf(p, cfg_r))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)
