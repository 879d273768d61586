"""The hierarchy engine: PATHS's magnification recursion as one jitted,
end-to-end differentiable program.

The reference drives the recursion with a per-slide Python loop that syncs
importance to the CPU every level (`utils.py:228-279`,
`data_utils/slide.py:277-360`) — the serialization point a TPU rewrite
must eliminate. Here the whole thing is tensor ops, batched over slides:

  level i forward  ->  masked top-K  ->  x4 child expansion  ->
  bounds/background masking via the index grid  ->  feature-table gather
  ->  stable compaction  ->  level i+1 forward ...

Gradients flow through the kept patches' context exactly as autograd
threads them in the reference (top-K indices are non-differentiable
pass-throughs; `importance_mode="mul"` is what makes selection learnable,
`model/paths.py:96-98`).

Rare-edge-case semantics reproduced branchlessly (`data_utils/slide.py:
296,320-352`): bags smaller than K, out-of-bounds children, and the
all-background fallback (use every non-bg patch of the next grid; if none
exists, use raw grid cells). Two documented deviations, both confined to
slides with essentially zero tissue: (1) the fallback bag is capped at 4K
patches (static shape) while the reference may use the whole grid; (2)
exact importance ties select the LOWEST bag index (`lax.top_k`'s rule),
whereas `torch.topk`'s tie order is unspecified — ties only arise between
identical (all-background) patches, where the choice is semantically
arbitrary.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from paths_tpu.config import Config
from paths_tpu.engine.tables import LevelTable
from paths_tpu.models.batch import PatchBag
from paths_tpu.models.recursive import recursive_apply
from paths_tpu.ops.losses import cross_entropy_loss, nll_survival_loss
from paths_tpu.ops.masking import masked_topk

# Child quadrant offsets (`data_utils/slide.py:305-315` in the reference).
# Deliberately numpy, NOT jnp: a module-level device array becomes a
# committed HLO *device* constant in every jitted program that uses it,
# and lowering then has to fetch it device->host (measured 135 s for
# these 32 bytes through this host's remote-device tunnel, every process
# start). A numpy constant embeds directly into the HLO at trace time.
CHILD_OFFSETS = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.int32)


def _compact(mask: jnp.ndarray, *arrays):
    """Stable-partition valid entries to the front of the patch axis.

    Keeps the reference's compacted bag ordering (so 1D positional
    encodings, which index by bag position, match) while staying static-
    shape. Returns (new_mask, permuted arrays...).
    """
    perm = jnp.argsort(~mask, axis=1, stable=True)  # valid-first, order kept
    out = []
    for a in arrays:
        idx = perm.reshape(perm.shape + (1,) * (a.ndim - 2))
        out.append(jnp.take_along_axis(a, idx, axis=1))
    new_mask = jnp.take_along_axis(mask, perm, axis=1)
    return (new_mask, *out)


def select_children(bag: PatchBag, out: dict, k: int, patch_size: int) -> dict:
    """Selection stage: append context, masked top-K, x4 child expansion
    (reference `slide.py:291-315`). Device-side and differentiable w.r.t.
    the context tensors. Returns the pre-lookup intermediates."""
    b, n, _ = bag.fts.shape

    ctx_slide = jnp.concatenate(
        [bag.ctx_slide, out["ctx_slide"][:, None]], axis=1)
    ctx_patch = jnp.concatenate(
        [bag.ctx_patch, out["ctx_patch"][:, :, None]], axis=2)

    # masked top-K (slide.py:294-301); k = min(K, N) is static. Only
    # k == -1 ("keep all", reference never calls topk) preserves bag
    # order; any finite K goes through topk even when K >= N, because
    # the reference reorders kept patches by descending importance and
    # 1D positional encodings are order-sensitive (slide.py:294-301).
    if k == -1:
        k = n
        idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
        kvalid = bag.mask
    else:
        k = min(k, n)
        idx, kvalid = masked_topk(out["importance"], bag.mask, k)

    kept_locs = jnp.take_along_axis(bag.locs // patch_size, idx[..., None], axis=1)
    kept_ctx = jnp.take_along_axis(ctx_patch, idx[..., None, None], axis=1)

    # x4 child expansion in the reference's concatenation order
    # (slide.py:305-315): groups [(2y,2x)],[(2y,2x+1)],[(2y+1,2x)],[(2y+1,2x+1)]
    s = 4 * k
    child_locs = (kept_locs * 2)[:, None, :, :] + CHILD_OFFSETS[None, :, None, :]
    child_locs = child_locs.reshape(b, s, 2)
    child_parent = jnp.tile(jnp.arange(k, dtype=jnp.int32), 4)          # (4K,)
    child_kvalid = jnp.tile(kvalid, (1, 4))                             # (B, 4K)

    return {"ctx_slide": ctx_slide, "kept_ctx": kept_ctx,
            "child_locs": child_locs, "child_parent": child_parent,
            "child_kvalid": child_kvalid}


def lookup_device(sel: dict, table: LevelTable) -> dict:
    """Feature lookup from an HBM-resident LevelTable: bounds + background
    masking via the index grid, gather, and the all-background fallback
    (slide.py:320-352)."""
    child_locs = sel["child_locs"]
    child_kvalid = sel["child_kvalid"]
    b, s, _ = child_locs.shape

    y, x = child_locs[..., 0], child_locs[..., 1]
    gh, gw = table.grid_hw[:, 0:1], table.grid_hw[:, 1:2]
    in_bounds = (y >= 0) & (y < gh) & (x >= 0) & (x < gw)
    hp, wp = table.index.shape[1:]
    yc = jnp.clip(y, 0, hp - 1)
    xc = jnp.clip(x, 0, wp - 1)
    rows = jnp.take_along_axis(table.index.reshape(b, -1), yc * wp + xc, axis=1)
    valid = child_kvalid & in_bounds & (rows >= 0)
    rows_safe = jnp.where(valid, rows, 0)

    fts = jnp.take_along_axis(table.fts, rows_safe[..., None], axis=1)
    fts = fts * valid[..., None]
    parent = jnp.broadcast_to(sel["child_parent"][None], (b, s))

    # all-background fallback: the first min(count, 4K) non-bg rows, or
    # raw grid cells when the grid is entirely background; fallback
    # ctx_patch is zeroed by finish_step. (Deviation: capped at 4K rows.)
    assert table.fts.shape[1] >= s, (
        f"LevelTable must carry >= 4K rows (have {table.fts.shape[1]}, "
        f"need {s}); pass min_rows=4*K when stacking")
    any_valid = jnp.any(valid, axis=1)
    hw = (gh * gw)[:, 0]
    fb_n = jnp.minimum(jnp.where(table.count > 0, table.count, hw), s)
    fb_valid = jnp.arange(s)[None, :] < fb_n[:, None]
    fb_fts = table.fts[:, :s] * fb_valid[..., None]
    fb_locs = table.locs[:, :s]
    fb_parent = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))

    use_fb = ~any_valid
    selm = any_valid[:, None]
    return {
        "mask": jnp.where(selm, valid, fb_valid),
        "fts": jnp.where(selm[..., None], fts, fb_fts),
        "locs": jnp.where(selm[..., None], child_locs, fb_locs),
        "parent": jnp.where(selm, parent, fb_parent),
        "use_fallback": use_fb,
    }


def finish_step(sel: dict, lookup: dict, patch_size: int) -> PatchBag:
    """Combine selection context with looked-up features into the next
    level's bag: tile/zero ctx, stable compaction, pixel locs."""
    new_ctx = jnp.take(sel["kept_ctx"], sel["child_parent"], axis=1)
    new_ctx = jnp.where(lookup["use_fallback"][:, None, None, None],
                        0.0, new_ctx)

    new_mask, new_fts, new_locs, new_parent, new_ctx = _compact(
        lookup["mask"], lookup["fts"], lookup["locs"], lookup["parent"],
        new_ctx)

    return PatchBag(fts=new_fts, locs=new_locs * patch_size,
                    mask=new_mask, parent_inds=new_parent,
                    ctx_slide=sel["ctx_slide"], ctx_patch=new_ctx)


def hierarchy_step(bag: PatchBag, out: dict, table: LevelTable, k: int,
                   patch_size: int) -> PatchBag:
    """Advance the recursion one level (reference `PreprocessedSlide.iter`,
    `data_utils/slide.py:277-360`), batched over slides on device.

    :param bag: the level-i bag that was just processed
    :param out: processor output dict for that bag
    :param table: LevelTable for level i+1
    :param k: top-K patches to keep (-1 = keep all)
    :return: the level-(i+1) bag with 4*K patch slots
    """
    sel = select_children(bag, out, k, patch_size)
    lookup = lookup_device(sel, table)
    return finish_step(sel, lookup, patch_size)


def end2end_forward(params: dict, config: Config, bag0: PatchBag,
                    tables: List[LevelTable], *,
                    rng: Optional[jax.Array] = None,
                    deterministic: bool = True, seq_mesh=None) -> List[dict]:
    """Run all levels (reference `utils.inference_end2end`,
    `utils.py:228-279`), returning each level's processor output plus the
    bag it was computed on (`"bag"` key), for visualisation/inspection.

    `tables[i]` feeds the transition from level i to i+1 (len = L-1).
    """
    mc = config.model_config
    outs = []
    bag = bag0
    for i in range(config.num_levels):
        lrng = jax.random.fold_in(rng, i) if rng is not None else None

        def level_fwd(params, bag, lrng, _i=i):
            return recursive_apply(params, config, _i, bag, rng=lrng,
                                   deterministic=deterministic,
                                   seq_mesh=seq_mesh)

        if getattr(config, "remat", False):
            # recompute this level's activations in the backward pass:
            # peak activation HBM becomes O(widest level) instead of the
            # sum over levels — the knob for oversize level-0 bags
            level_fwd = jax.checkpoint(level_fwd)
        out = level_fwd(params, bag, lrng)
        outs.append({**out, "bag": bag})
        if i != config.num_levels - 1:
            bag = hierarchy_step(bag, out, tables[i],
                                 config.top_k_patches[i], mc.patch_size)
    return outs


def task_loss(config: Config, logits: jnp.ndarray, labels: dict):
    """Final-level loss + prediction (reference `utils.py:263-279`).
    labels: {"survival_bin", "censored"} or {"subtype"}, optionally with
    "weight" zeroing out mesh-padding duplicates."""
    weights = labels.get("weight")
    if config.task == "survival":
        pred = jax.nn.sigmoid(logits)
        loss = nll_survival_loss(pred, labels["survival_bin"],
                                 labels["censored"], weights=weights)
    elif config.task == "subtype_classification":
        pred = logits
        loss = cross_entropy_loss(logits, labels["subtype"], weights=weights)
    else:
        raise ValueError(config.task)
    return loss, pred


def end2end_loss(params: dict, config: Config, bag0: PatchBag,
                 tables: List[LevelTable], labels: dict, *,
                 rng: Optional[jax.Array] = None,
                 deterministic: bool = True, seq_mesh=None):
    """Forward through all levels + final-level loss.
    Returns (loss, aux) where aux carries hazards-or-logits + importances.
    """
    outs = end2end_forward(params, config, bag0, tables, rng=rng,
                           deterministic=deterministic, seq_mesh=seq_mesh)
    logits = outs[-1]["logits"]
    loss, pred = task_loss(config, logits, labels)
    aux = {"pred": pred, "logits": logits,
           "importances": [o["importance"] for o in outs]}
    return loss, aux
