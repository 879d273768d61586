"""Engine parity against the ACTUAL reference implementation.

Every other parity test compares our fused engine to an in-repo torch
mirror (helpers_torch/helpers_refloop) written from the reference's math.
This test removes the mirror from the loop: it imports the real reference
code (`/root/reference`: `model/paths.py`, `model/interface.py`,
`model/aggregator.py`, `data_utils/slide.py::PreprocessedSlide`,
`data_utils/dataset.py::collate_fn`, `utils.py::inference_end2end` +
`nll_loss`) via the helpers_reference stub rig, builds the reference's own
`RecursiveModel`, runs its own training-time recursion on synthetic
feature grids, and checks against our jitted `end2end_loss` with weights
shared through `paths_tpu.convert.recursive_from_torch` (the same
converter that loads real `model.pt` checkpoints):

  - per-level visited patch selections are identical,
  - per-level importance scores match,
  - final hazards and the NLL/CE loss match,
  - and END-TO-END GRADIENTS of every parameter match leaf-for-leaf
    (reference autograd through the multi-level Python recursion vs our
    jax.grad through the fused engine), mapped through the converter.

Skipped when /root/reference is not mounted; the mirror-based tests carry
the guard on end-user machines.
"""
import json
import os

import jax
import numpy as np
import pytest
import torch

from helpers_reference import reference_available, reference_modules
from helpers_torch import to_numpy_sd
from paths_tpu.convert import recursive_from_torch
from paths_tpu.engine.hierarchy import end2end_forward, end2end_loss
from test_hierarchy import jax_inputs, make_grids
from test_model_parity import small_config

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")

ATOL = 3e-5
GRAD_ATOL = 5e-5


@pytest.fixture(scope="module")
def ref():
    with reference_modules("config", "utils", "data_utils.slide",
                           "data_utils.dataset",
                           "preprocess.loader") as mods:
        yield dict(zip(["config", "utils", "slide", "dataset", "loader"],
                       mods))


def ref_config_dir(tmp_path, cfg, task="survival", subtypes=None):
    """Write a reference-format config.json mirroring our Config `cfg`."""
    mc = cfg.model_config
    model_config = {f: getattr(mc, f) for f in [
        "hierarchical_ctx", "slide_ctx_mode", "patch_embed_dim", "dropout",
        "patch_size", "importance_mode", "trans_dim", "trans_heads",
        "trans_layers", "pos_encoding_mode", "importance_mlp_hidden_dim",
        "hierarchical_ctx_mlp_hidden_dim", "lstm"]}
    data = {"model_config": model_config, "base_power": 0.625,
            "magnification_factor": 2, "num_levels": cfg.num_levels,
            "num_epochs": 1, "top_k_patches": list(cfg.top_k_patches),
            "model_type": "PATHS", "wsi_dir": ".", "csv_path": ".",
            "nbins": cfg.nbins, "task": task, "batch_size": 4}
    if subtypes is not None:
        data["filter_to_subtypes"] = subtypes
    d = os.path.join(str(tmp_path), "refmodel")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(data, f)
    return d


def run_reference(ref, tmp_path, our_cfg, slide_grids, labels,
                  task="survival", subtypes=None, seed=0, state_dict=None):
    """The reference's own training-time path: PreprocessedSlide items ->
    collate_fn -> inference_end2end -> loss -> backward. Returns (model,
    per-level records, hazards/logits, loss, grads-as-our-pytree)."""
    rcfg = ref["config"].Config.load(
        ref_config_dir(tmp_path, our_cfg, task, subtypes), test_mode=True)
    torch.manual_seed(seed)
    model = rcfg.get_model()
    if state_dict is not None:  # drop in an exported checkpoint, strictly
        model.load_state_dict(state_dict, strict=True)

    grids = {}  # (slide_id, power) -> tensor
    for j, g in enumerate(slide_grids):
        for lvl, arr in enumerate(g):
            grids[(f"s{j}", rcfg.base_power * 2 ** lvl)] = torch.tensor(arr)
    ref["loader"].load = lambda sid, power: grids[(sid, power)]

    mc = our_cfg.model_config
    ctx_dim = tuple(model.procs[0].ctx_dim())
    assert ctx_dim == tuple(mc.ctx_dim()), (ctx_dim, mc.ctx_dim())

    items = []
    for j in range(len(slide_grids)):
        s = ref["slide"].load_patch_preprocessed_slide(
            f"s{j}.svs", rcfg.base_power, mc.patch_size, ctx_dim,
            rcfg.num_levels,
            subtype=labels[j].get("subtype"))
        items.append(s.todict() | {"slide": s} | labels[j])
    batch = ref["dataset"].collate_fn(items)

    records = []
    orig_forward = model.forward

    def recording_forward(depth, data):
        out = orig_forward(depth, data)
        records.append({
            "locs": data.locs.detach().clone().numpy(),
            "num_ims": data.num_ims.clone().numpy(),
            "importance": out["importance"].detach().clone().numpy()})
        return out

    model.forward = recording_forward
    pred, loss = ref["utils"].inference_end2end(
        rcfg.num_levels, rcfg.top_k_patches, model, rcfg.base_power, batch,
        task)
    loss.backward()
    # early levels' classification layers don't feed the loss -> grad None
    # in torch; our jax.grad yields exact zeros there
    grads = {k: (p.grad.detach().numpy() if p.grad is not None
                 else np.zeros(p.shape, np.float32))
             for k, p in model.named_parameters()}
    return (model, records, pred.detach().numpy(), float(loss.detach()),
            recursive_from_torch(grads, our_cfg))


def imp_by_loc(locs, valid, imp, patch_size):
    """{(slide, y, x) -> importance} over valid entries."""
    cells = np.asarray(locs) // patch_size
    return {(j, int(y), int(x)): float(v)
            for j in range(len(valid))
            for (y, x), v, m in zip(cells[j], imp[j], valid[j]) if m}


def _assert_engine_matches(ref, tmp_path, our_cfg, slide_grids, labels_t,
                           labels_j, task="survival", subtypes=None):
    model, records, ref_pred, ref_loss, ref_grads = run_reference(
        ref, tmp_path, our_cfg, slide_grids, labels_t, task, subtypes)

    params = recursive_from_torch(to_numpy_sd(model), our_cfg)
    bag0, tables = jax_inputs(slide_grids, our_cfg)

    (loss_j, aux), grads_j = jax.value_and_grad(
        end2end_loss, has_aux=True)(params, our_cfg, bag0, tables, labels_j)
    outs = end2end_forward(params, our_cfg, bag0, tables)

    p = our_cfg.model_config.patch_size
    for lvl, (rec, out) in enumerate(zip(records, outs)):
        ref_map = imp_by_loc(
            rec["locs"],
            [np.arange(rec["locs"].shape[1]) < n for n in rec["num_ims"]],
            rec["importance"], p)
        our_map = imp_by_loc(np.asarray(out["bag"].locs),
                             np.asarray(out["bag"].mask),
                             np.asarray(out["importance"]), p)
        assert set(ref_map) == set(our_map), f"level {lvl} selections"
        ref_v = np.array([ref_map[k] for k in sorted(ref_map)])
        our_v = np.array([our_map[k] for k in sorted(ref_map)])
        np.testing.assert_allclose(our_v, ref_v, atol=ATOL,
                                   err_msg=f"level {lvl} importance")

    np.testing.assert_allclose(np.asarray(aux["pred"]), ref_pred, atol=ATOL)
    np.testing.assert_allclose(float(loss_j), ref_loss, atol=ATOL)

    flat_ref, _ = jax.tree_util.tree_flatten(ref_grads)
    flat_our, treedef = jax.tree_util.tree_flatten(grads_j)
    paths = [jax.tree_util.keystr(kp) for kp, _ in
             jax.tree_util.tree_flatten_with_path(grads_j)[0]]
    assert len(flat_ref) == len(flat_our)
    for name, r, o in zip(paths, flat_ref, flat_our):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=GRAD_ATOL, rtol=2e-4,
            err_msg=f"gradient mismatch at {name}")
    del treedef


def test_survival_forward_backward_vs_reference(ref, tmp_path):
    """3 slides x 3 levels, lstm + 2d PE + residual ctx (flagship shape):
    selections, importances, hazards, loss, and all gradients match the
    reference's own code."""
    our_cfg = small_config()
    rng = np.random.default_rng(7)
    d = our_cfg.model_config.patch_embed_dim
    slide_grids = [
        make_grids(rng, [(3, 4), (5, 7), (10, 14)], d),
        make_grids(rng, [(2, 2), (4, 4), (8, 8)], d),
        make_grids(rng, [(4, 3), (8, 6), (16, 12)], d, bg_fraction=0.5),
    ]
    labels_t = [{"survival_bin": b, "survival": 10.0 * (b + 1),
                 "censored": c}
                for b, c in [(0, 0), (2, 1), (3, 0)]]
    labels_j = {"survival_bin": np.array([0, 2, 3], np.int32),
                "censored": np.array([0, 1, 0], np.int32)}
    _assert_engine_matches(ref, tmp_path, our_cfg, slide_grids, labels_t,
                           labels_j)


def test_survival_rnn_1d_concat_vs_reference(ref, tmp_path):
    """The other branch family: rnn (hctx_mlp), 1d pos encoding, concat
    slide ctx."""
    our_cfg = small_config(lstm=False, pos_encoding_mode="1d",
                           slide_ctx_mode="concat")
    rng = np.random.default_rng(11)
    d = our_cfg.model_config.patch_embed_dim
    slide_grids = [
        make_grids(rng, [(3, 3), (6, 6), (12, 12)], d),
        make_grids(rng, [(2, 3), (4, 6), (8, 12)], d, bg_fraction=0.4),
    ]
    labels_t = [{"survival_bin": 1, "survival": 20.0, "censored": 1},
                {"survival_bin": 3, "survival": 40.0, "censored": 0}]
    labels_j = {"survival_bin": np.array([1, 3], np.int32),
                "censored": np.array([1, 0], np.int32)}
    _assert_engine_matches(ref, tmp_path, our_cfg, slide_grids, labels_t,
                           labels_j)


def test_subtype_classification_vs_reference(ref, tmp_path):
    """Cross-entropy task: logits + CE loss + grads vs the reference."""
    subtypes = ["A", "B", "C"]
    our_cfg = small_config()
    our_cfg.task = "subtype_classification"
    our_cfg.filter_to_subtypes = subtypes
    rng = np.random.default_rng(13)
    d = our_cfg.model_config.patch_embed_dim
    slide_grids = [
        make_grids(rng, [(3, 4), (6, 8), (12, 16)], d),
        make_grids(rng, [(2, 2), (4, 4), (8, 8)], d),
    ]
    labels_t = [{"subtype": 0}, {"subtype": 2}]
    labels_j = {"subtype": np.array([0, 2], np.int32)}
    _assert_engine_matches(ref, tmp_path, our_cfg, slide_grids, labels_t,
                           labels_j, task="subtype_classification",
                           subtypes=subtypes)


def test_exported_checkpoint_drops_into_reference(ref, tmp_path):
    """A paths_tpu-trained (here: random-init) model exported via
    `convert.save_torch_checkpoint` is a drop-in for the reference:
    `load_state_dict(strict=True)` accepts it (`utils.py:189` contract)
    and the reference's own end-to-end recursion reproduces our hazards
    and loss on the same slides."""
    from paths_tpu.convert import recursive_to_torch
    from paths_tpu.models.recursive import recursive_init

    our_cfg = small_config()
    params = recursive_init(jax.random.PRNGKey(21), our_cfg)
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in recursive_to_torch(params, our_cfg).items()}

    rng = np.random.default_rng(17)
    d = our_cfg.model_config.patch_embed_dim
    slide_grids = [
        make_grids(rng, [(3, 4), (5, 7), (10, 14)], d),
        make_grids(rng, [(2, 2), (4, 4), (8, 8)], d, bg_fraction=0.3),
    ]
    labels_t = [{"survival_bin": 0, "survival": 10.0, "censored": 0},
                {"survival_bin": 2, "survival": 30.0, "censored": 1}]
    labels_j = {"survival_bin": np.array([0, 2], np.int32),
                "censored": np.array([0, 1], np.int32)}

    _, _, ref_pred, ref_loss, _ = run_reference(
        ref, tmp_path, our_cfg, slide_grids, labels_t, state_dict=sd)

    bag0, tables = jax_inputs(slide_grids, our_cfg)
    loss_j, aux = end2end_loss(params, our_cfg, bag0, tables, labels_j)
    np.testing.assert_allclose(np.asarray(aux["pred"]), ref_pred, atol=ATOL)
    np.testing.assert_allclose(float(loss_j), ref_loss, atol=ATOL)
