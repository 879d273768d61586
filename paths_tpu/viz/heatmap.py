"""Importance heatmap visualisation for raw slides.

Reproduces the reference's `heatmap_visualise.py` output contract: run the
hierarchical recursion over a RawSlide with on-the-fly encoding, then
render the slide next to a heatmap where every visited patch is outlined
and its importance painted into a per-depth canvas; deeper levels fold
into their parents with 0.5 weight per depth; viridis overlay at alpha 0.5
over visited area; auto-viewport excluding top/bottom 10% outlier patches;
inset colorbar; PDF out (`heatmap_visualise.py:52-205`). CAMELYON17
annotation XML polygons are drawn on the left panel when provided.
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Callable, List, Optional, Tuple

import jax
import numpy as np

from paths_tpu.config import Config
from paths_tpu.data.raw_slide import encode_bag, load_raw_slide
from paths_tpu.models.batch import PatchBag, pad_bag
from paths_tpu.models.recursive import recursive_apply


def parse_camelyon17_anno_file(path: str) -> List[Tuple[list, str]]:
    """CAMELYON17 annotation XML -> [(polygon coords, color)]
    (`heatmap_visualise.py:21-48`)."""
    assert os.path.isfile(path), f"Couldn't find annotation file at '{path}'."
    tree = ET.parse(path)
    root = tree.getroot()

    group = root.find(".//Group")
    if group is not None and group.get("Name") != "Tumor":
        raise ValueError(f"Unexpected group name: {group.get('Name')}")

    polygons = []
    for annotation in root.findall(".//Annotation"):
        if annotation.get("Type") != "Polygon":
            raise ValueError(
                f"Unexpected annotation type: {annotation.get('Type')}")
        color = annotation.get("Color")
        coords = [(float(c.get("X")), float(c.get("Y")))
                  for c in annotation.find("Coordinates")]
        polygons.append((coords, color))
    return polygons


def run_recursion(config: Config, params: dict, encode_fn: Callable,
                  slide_path: str, tissue_threshold: float = 0.025,
                  camelyon: bool = True, default_power: float = 40.0,
                  verbose: bool = True):
    """Hierarchical inference on a raw slide; returns (slides per depth,
    importances per depth, final logits).

    Each depth's processor apply runs as ONE jitted program over a bag
    padded to a power-of-two width (`pad_bag`; masks make padding inert):
    eager per-op dispatch would pay link latency hundreds of times per
    depth, and exact widths would recompile for every slide."""
    mc = config.model_config
    slide = load_raw_slide(slide_path, config.base_power, mc.patch_size,
                           mc.ctx_dim(), prepatch=False,
                           tissue_threshold=tissue_threshold,
                           camelyon=camelyon, default_power=default_power)
    slide.load_patches()

    applies = [_apply_at(config, d) for d in range(config.num_levels)]

    slide_depths = [slide]
    imps = []
    out = None
    for depth in range(config.num_levels):
        if verbose:
            print(f" Depth {depth + 1} / {config.num_levels}...")
        bag = encode_bag(slide, encode_fn)
        n = None
        if isinstance(bag, PatchBag):    # tests stub the encode seam
            n = bag.max_patches
            bag = pad_bag(bag, _pow2_width(n))
        out = applies[depth](params, bag)
        importance = np.asarray(out["importance"][0])[:n]
        imps.append(importance)
        if depth != config.num_levels - 1:
            slide = slide.recurse(
                config.magnification_factor,
                np.asarray(out["ctx_slide"][0]),
                np.asarray(out["ctx_patch"][0])[:n],
                importance, config.top_k_patches[depth])
            slide.load_patches()
            slide_depths.append(slide)
    return slide_depths, imps, np.asarray(out["logits"])


def _apply_at(config: Config, depth: int):
    """The jitted per-depth processor apply, cached ON the config object:
    a fresh `jax.jit` wrapper per call would retrace + re-lower every
    program for every slide (each new wrapper is a new cache key), which
    on remote-compile links re-pays the per-executable first-execution
    cost per slide. params stay an ARGUMENT (constants would bloat the
    HLO); config and depth are static python closures, so the cache is
    only valid while the config's model fields are unchanged — sessions
    (serving, CLI, bench) treat a loaded Config as frozen."""
    cache = getattr(config, "_recursion_jits", None)
    if cache is None:
        cache = {}
        config._recursion_jits = cache
    fn = cache.get(depth)
    if fn is None:
        fn = jax.jit(lambda p, b: recursive_apply(p, config, depth, b))
        cache[depth] = fn
    return fn


def _pow2_width(n: int, floor: int = 32) -> int:
    w = floor
    while w < n:
        w *= 2
    return w


# Rendering contract shared with the reference output (figure geometry,
# outline weight, overlay opacity, fold factor — `heatmap_visualise.py`'s
# published look): the *implementation* below is vectorized canvas
# painting, not the reference's per-patch paint loop.
FIGSIZE = (6, 3.4)
OUTLINE_LW = 0.5
OVERLAY_ALPHA = 0.5
FOLD_WEIGHT = 0.5          # child level importance contribution to parent
VISITED_EPS = 1e-4         # marks visited patches even at zero importance
VIEWPORT_TRIM = 0.1        # drop patches in the outer 10% bands vertically
VIEWPORT_PAD = 128


def _depth0_cells(slide, depth: int, patch_size: int):
    """Visited-patch geometry projected into the depth-0 (coarsest) pixel
    frame. Positions at depth d are multiples of `patch_size` in depth-d
    pixels, so each patch occupies exactly one cell of a (patch_size >> d)
    grid after the 2x-per-level projection. Returns (rows, cols, size)."""
    size = max(patch_size >> depth, 1)
    locs = np.asarray(slide.locs, np.int64)
    return locs[:, 0] // patch_size, locs[:, 1] // patch_size, size


def folded_importance(slide_depths, imps, patch_size: int,
                      shape) -> np.ndarray:
    """(H, W) map in the depth-0 frame: each level's importance is painted
    over its visited patches, then child levels fold into their parents
    with FOLD_WEIGHT per depth. Fully vectorized: per level, importance is
    scattered into a coarse cell grid and upsampled with np.repeat."""
    H, W = shape
    levels = []
    for depth, (slide, imp) in enumerate(zip(slide_depths, imps)):
        rows, cols, size = _depth0_cells(slide, depth, patch_size)
        gh, gw = -(-H // size), -(-W // size)
        cells = np.zeros((gh, gw))
        # negative locs (possible at slide edges after recursion) must be
        # dropped, not wrapped to the far edge via negative indexing — the
        # reference painter clamps with max(y, 0) (`heatmap_visualise.py`)
        keep = (rows >= 0) & (cols >= 0) & (rows < gh) & (cols < gw)
        cells[rows[keep], cols[keep]] = imp[: len(rows)][keep] + VISITED_EPS
        levels.append(np.repeat(np.repeat(cells, size, 0), size, 1)[:H, :W])

    acc = levels[-1]
    for parent in levels[-2::-1]:
        visited_child = acc != 0
        acc = np.where(visited_child, parent + acc * FOLD_WEIGHT, parent)
    return acc


def _outline_collection(slide_depths, patch_size: int):
    """One matplotlib collection outlining every visited patch at every
    depth (vs the reference's per-patch `add_patch` calls)."""
    from matplotlib.collections import PatchCollection
    from matplotlib.patches import Rectangle

    rects = []
    for depth, slide in enumerate(slide_depths):
        rows, cols, size = _depth0_cells(slide, depth, patch_size)
        keep = (rows >= 0) & (cols >= 0)
        rects.extend(Rectangle((x * size, y * size), size, size)
                     for y, x in zip(rows[keep], cols[keep]))
    return PatchCollection(rects, facecolor="none", edgecolor="black",
                           lw=OUTLINE_LW)


def _viewport_ylim(slide, patch_size: int, height: int):
    """(bottom, top) y-limits framing the level-0 patches, ignoring ones
    whose centers fall in the outer VIEWPORT_TRIM bands (outliers)."""
    ys = np.asarray(slide.locs, np.int64)[:, 0]
    frac = (ys + patch_size / 2) / height
    inner = ys[(frac > VIEWPORT_TRIM) & (frac < 1 - VIEWPORT_TRIM)]
    if inner.size == 0:
        inner = ys
    return (int(inner.max()) + VIEWPORT_PAD + patch_size,
            int(inner.min()) - VIEWPORT_PAD)


def heatmap_slide(config: Config, params: dict, encode_fn: Callable,
                  slide_path: str, annotation_path: Optional[str],
                  out_path: Optional[str], tissue_threshold: float = 0.025,
                  camelyon: bool = True, default_power: float = 40.0,
                  show: bool = False):
    """Render the two-panel heatmap PDF (output contract of
    `heatmap_visualise.py:52-205`: slide + annotation on the left; slide
    with outlined visited patches, folded-importance viridis overlay, and
    inset colorbar on the right; shared auto-viewport)."""
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.axes_grid1.inset_locator import inset_axes

    # .tiles pyramids are directories, other WSI formats are files
    assert os.path.exists(slide_path), f"Couldn't find WSI at '{slide_path}'."
    if out_path is not None:
        directory = os.path.dirname(out_path)
        if directory and not os.path.isdir(directory):
            os.makedirs(directory, exist_ok=True)

    P = config.model_config.patch_size
    slide_depths, imps, _ = run_recursion(
        config, params, encode_fn, slide_path, tissue_threshold, camelyon,
        default_power)

    bigimg = slide_depths[0].view_at_power(config.base_power)
    H, W = bigimg.shape[:2]

    fig, (sax, ax) = plt.subplots(1, 2, figsize=FIGSIZE)
    for a in (sax, ax):
        a.imshow(bigimg, aspect="equal")
        a.set_xticks([])
        a.set_yticks([])

    if annotation_path is not None:
        scale = config.base_power / default_power
        for coords, _ in parse_camelyon17_anno_file(annotation_path):
            ring = np.asarray(coords + coords[:1]) * scale
            sax.plot(ring[:, 0], ring[:, 1], color="blue", linewidth=2)

    ax.add_collection(_outline_collection(slide_depths, P))

    heat = folded_importance(slide_depths, imps, P, (H, W))
    alpha = np.where(heat > 0, OVERLAY_ALPHA, 0.0)
    visited = heat > 0
    if visited.any():
        heat = np.where(visited, heat, heat[visited].min())
    hm = ax.imshow(heat, cmap="viridis", alpha=alpha, aspect="equal")

    ylim = _viewport_ylim(slide_depths[0], P, H)
    sax.set_ylim(*ylim)
    ax.set_ylim(*ylim)

    cax = inset_axes(ax, width="5%", height="100%", loc="right",
                     borderpad=-1.5)
    fig.colorbar(hm, cax=cax, orientation="vertical")
    fig.tight_layout()
    fig.subplots_adjust(right=0.9)

    if out_path is not None:
        if not (out_path.endswith(".pdf") or out_path.endswith(".png")):
            out_path += ".pdf"
        plt.savefig(out_path, dpi=200)
    if show:
        plt.show()
    plt.close(fig)
    return out_path


def heatmap_from_store(config: Config, params: dict, slide_id: str,
                       store, out_path: Optional[str],
                       show: bool = False):
    """Importance heatmap for a PREPROCESSED slide — no raw WSI or
    encoder needed (the reference can only visualise raw slides with an
    encoder in the loop, `heatmap_visualise.py:220-231`; a training-side
    user typically has only the feature store). Runs the fused
    hierarchical forward on the stored grids and renders one panel: a
    synthetic glass/tissue backdrop from the level-0 grid occupancy,
    visited-patch outlines, the folded-importance viridis overlay, and
    the inset colorbar — the same painter and fold semantics as the
    raw-slide renderer."""
    import types

    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.axes_grid1.inset_locator import inset_axes

    from paths_tpu.data.dataset import collate_batch
    from paths_tpu.engine.hierarchy import end2end_forward
    from paths_tpu.serve import serving_dataset

    P = config.model_config.patch_size
    ds = serving_dataset(config, store, [slide_id])
    bag0, tables, _ = collate_batch(ds, [0],
                                    level0_bucket=config.level0_bucket)
    outs = end2end_forward(params, config, bag0, tables)

    # shim per-depth "slides" for the shared painter: valid rows only
    # (padded/invalid slots carry garbage locs and zero importance)
    slide_depths, imps = [], []
    for out in outs:
        bag = out["bag"]
        valid = np.asarray(bag.mask[0])
        slide_depths.append(types.SimpleNamespace(
            locs=np.asarray(bag.locs[0])[valid]))
        imps.append(np.asarray(out["importance"][0])[valid])

    # glass/tissue backdrop from level-0 grid occupancy
    grid0 = np.asarray(store.load(slide_id, config.base_power))
    tissue = np.abs(grid0).sum(-1) > 0
    backdrop = np.where(np.repeat(np.repeat(tissue, P, 0), P, 1),
                        222, 246).astype(np.uint8)
    H, W = backdrop.shape

    if out_path is not None:
        directory = os.path.dirname(out_path)
        if directory and not os.path.isdir(directory):
            os.makedirs(directory, exist_ok=True)

    fig, ax = plt.subplots(figsize=(FIGSIZE[0] / 2, FIGSIZE[1]))
    ax.imshow(backdrop, cmap="gray", vmin=0, vmax=255, aspect="equal")
    ax.set_xticks([])
    ax.set_yticks([])
    ax.add_collection(_outline_collection(slide_depths, P))

    heat = folded_importance(slide_depths, imps, P, (H, W))
    alpha = np.where(heat > 0, OVERLAY_ALPHA, 0.0)
    visited = heat > 0
    if visited.any():
        heat = np.where(visited, heat, heat[visited].min())
    hm = ax.imshow(heat, cmap="viridis", alpha=alpha, aspect="equal")

    ylim = _viewport_ylim(slide_depths[0], P, H)
    ax.set_ylim(*ylim)

    cax = inset_axes(ax, width="5%", height="100%", loc="right",
                     borderpad=-1.5)
    fig.colorbar(hm, cax=cax, orientation="vertical")
    fig.tight_layout()
    fig.subplots_adjust(right=0.88)

    if out_path is not None:
        if not (out_path.endswith(".pdf") or out_path.endswith(".png")):
            out_path += ".pdf"
        plt.savefig(out_path, dpi=200)
    if show:
        plt.show()
    plt.close(fig)
    return out_path
