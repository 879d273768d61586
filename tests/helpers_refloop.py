"""Test-only mirror of the reference's hierarchical inference loop
(utils.inference_end2end + PreprocessedSlide.iter + collate_fn semantics),
run with torch on dense per-level grids. Used as ground truth for the
paths_tpu hierarchy engine."""
import numpy as np
import torch


def level0_bag(grid, patch_size):
    """All grid cells, background included (data_utils/slide.py:258-269)."""
    h, w, d = grid.shape
    fts = torch.tensor(grid.reshape(-1, d))
    ys, xs = np.divmod(np.arange(h * w), w)
    locs = torch.tensor(np.stack([ys, xs], 1).astype(np.int64)) * patch_size
    return fts, locs


def ref_iter(next_grid, npatches, locs_pix, ctx_slide, ctx_patch, importance,
             new_ctx_slide, new_ctx_patch, keep, patch_size):
    """One slide's level transition (data_utils/slide.py:277-360)."""
    locs = locs_pix[:npatches] // patch_size
    ctx_patch = ctx_patch[:npatches]
    new_ctx_patch = new_ctx_patch[:npatches]
    imp = importance[:npatches]

    ctx_slide = torch.cat((ctx_slide, new_ctx_slide[None]), dim=0)
    ctx_patch = torch.cat((ctx_patch, new_ctx_patch[:, None]), dim=1)

    if keep != -1:
        count = min(imp.shape[0], keep)
        keep_inds = torch.topk(imp, count).indices
        ctx_patch = ctx_patch[keep_inds]
        locs = locs[keep_inds]

    new_locs = locs * 2
    n = new_locs.shape[0]
    parent_inds = torch.tensor(list(range(n)) * 4)
    off = lambda a, b: new_locs + torch.tensor([a, b])
    new_locs = torch.cat((off(0, 0), off(0, 1), off(1, 0), off(1, 1)), dim=0)
    ctx_patch = torch.cat((ctx_patch,) * 4, dim=0)

    fts = torch.tensor(next_grid)
    x, y, _ = fts.shape
    fb = torch.logical_and(new_locs[:, 0] < x, new_locs[:, 1] < y)
    new_locs = new_locs.clone()
    new_locs[~fb] *= 0
    fbg = fts[new_locs[:, 0], new_locs[:, 1]].sum(dim=1) != 0
    filt = torch.logical_and(fb, fbg)

    new_locs, parent_inds, ctx_patch = new_locs[filt], parent_inds[filt], ctx_patch[filt]
    new_fts = fts[new_locs[:, 0], new_locs[:, 1]]

    if new_locs.shape[0] == 0:
        ctx_patch = torch.zeros((x * y, ctx_patch.shape[1], ctx_patch.shape[2]))
        parent_inds = torch.arange(x * y)
        new_locs = torch.tensor([[i, j] for i in range(x) for j in range(y)])
        filt = fts[new_locs[:, 0], new_locs[:, 1]].sum(dim=1) != 0
        if filt.count_nonzero() == 0:
            filt[:] = True
        new_locs, parent_inds, ctx_patch = new_locs[filt], parent_inds[filt], ctx_patch[filt]
        new_fts = fts[new_locs[:, 0], new_locs[:, 1]]

    return {"fts": new_fts, "ctx_patch": ctx_patch, "ctx_slide": ctx_slide,
            "locs": new_locs * patch_size, "parent_inds": parent_inds}


def collate(items):
    """Zero-pad variable-length bags (data_utils/dataset.py:206-243)."""
    num = [i["fts"].shape[0] for i in items]
    mx = max(num)
    pad = lambda t: torch.cat(
        [t, torch.zeros((mx - t.shape[0],) + tuple(t.shape[1:]), dtype=t.dtype)])
    return {
        "fts": torch.stack([pad(i["fts"].float()) for i in items]),
        "locs": torch.stack([pad(i["locs"].long()) for i in items]),
        "ctx_patch": torch.stack([pad(i["ctx_patch"].float()) for i in items]),
        "parent_inds": torch.stack([pad(i["parent_inds"].long()) for i in items]),
        "ctx_slide": torch.stack([i["ctx_slide"].float() for i in items]),
        "num_ims": torch.tensor(num),
    }


def ref_end2end(tmodel, slide_grids, num_levels, keep_patches, patch_size,
                ds_dim, dp_dim):
    # no torch.no_grad here: trajectory-parity training (test_trajectory_
    # parity.py) backpropagates through this loop; inference-only callers
    # pay only a little extra memory at test sizes
    """Full recursion over a batch of slides; slide_grids[j][i] is slide
    j's dense grid at level i. Returns (final logits, per-level batches)."""
    items = []
    for grids in slide_grids:
        fts, locs = level0_bag(grids[0], patch_size)
        items.append({
            "fts": fts, "locs": locs,
            "parent_inds": torch.arange(fts.shape[0]),
            "ctx_patch": torch.zeros((fts.shape[0], 0, dp_dim)),
            "ctx_slide": torch.zeros((0, ds_dim)),
        })
    batch = collate(items)
    batches = []
    out = None
    for i in range(num_levels):
        batches.append(batch)
        out = tmodel(i, batch["fts"], batch["locs"], batch["num_ims"],
                     batch["ctx_slide"], batch["ctx_patch"])
        if i != num_levels - 1:
            new_items = []
            for j, grids in enumerate(slide_grids):
                new_items.append(ref_iter(
                    grids[i + 1], int(batch["num_ims"][j]), batch["locs"][j],
                    batch["ctx_slide"][j], batch["ctx_patch"][j],
                    out["importance"][j], out["ctx_slide"][j],
                    out["ctx_patch"][j], keep_patches[i], patch_size))
            batch = collate(new_items)
    return out["logits"], batches
