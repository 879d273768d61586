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

import numpy as np

from paths_tpu.config import Config
from paths_tpu.data.raw_slide import encode_bag, load_raw_slide
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
                  camelyon: bool = True, default_power: float = 40.0):
    """Hierarchical inference on a raw slide; returns (slides per depth,
    importances per depth, final logits)."""
    mc = config.model_config
    slide = load_raw_slide(slide_path, config.base_power, mc.patch_size,
                           mc.ctx_dim(), prepatch=False,
                           tissue_threshold=tissue_threshold,
                           camelyon=camelyon, default_power=default_power)
    slide.load_patches()

    slide_depths = [slide]
    imps = []
    out = None
    for depth in range(config.num_levels):
        print(f" Depth {depth + 1} / {config.num_levels}...")
        bag = encode_bag(slide, encode_fn)
        out = recursive_apply(params, config, depth, bag)
        importance = np.asarray(out["importance"][0])
        imps.append(importance)
        if depth != config.num_levels - 1:
            slide = slide.recurse(
                config.magnification_factor,
                np.asarray(out["ctx_slide"][0]),
                np.asarray(out["ctx_patch"][0]),
                importance, config.top_k_patches[depth])
            slide.load_patches()
            slide_depths.append(slide)
    return slide_depths, imps, np.asarray(out["logits"])


def heatmap_slide(config: Config, params: dict, encode_fn: Callable,
                  slide_path: str, annotation_path: Optional[str],
                  out_path: Optional[str], tissue_threshold: float = 0.025,
                  camelyon: bool = True, default_power: float = 40.0,
                  show: bool = False):
    """Render the two-panel heatmap PDF (`heatmap_visualise.py:52-205`)."""
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle
    from mpl_toolkits.axes_grid1.inset_locator import inset_axes

    assert os.path.isfile(slide_path), f"Couldn't find WSI at '{slide_path}'."
    if out_path is not None:
        directory = os.path.dirname(out_path)
        if directory and not os.path.isdir(directory):
            os.makedirs(directory, exist_ok=True)

    L = config.num_levels
    P = config.model_config.patch_size

    def convert_pix(pix, depth, to_depth):
        e = to_depth - depth
        return pix // 2 ** (-e) if e <= 0 else pix * 2 ** e

    slide_depths, imps, _ = run_recursion(
        config, params, encode_fn, slide_path, tissue_threshold, camelyon,
        default_power)

    bigimg = slide_depths[0].view_at_power(config.base_power)
    H, W, C = bigimg.shape
    assert C == 3

    fig, axes = plt.subplots(1, 2, figsize=(6, 3.4))
    sax = axes[0]
    sax.imshow(bigimg, aspect="equal")
    sax.set_xticks([])
    sax.set_yticks([])

    if annotation_path is not None:
        polygons = parse_camelyon17_anno_file(annotation_path)
        multiplier = config.base_power / default_power
        for coords, _ in polygons:
            x, y = zip(*coords)
            x = [i * multiplier for i in x]
            y = [i * multiplier for i in y]
            sax.plot(list(x) + [x[0]], list(y) + [y[0]], color="blue",
                     linewidth=2)

    ax = axes[1]
    ax.imshow(bigimg, aspect="equal")
    ax.set_xticks([])
    ax.set_yticks([])

    overall_imp = np.zeros((L, H, W))
    for depth in range(L):
        locs = slide_depths[depth].locs
        size = convert_pix(P, depth, 0)
        for i in range(locs.shape[0]):
            y, x = int(locs[i][0]), int(locs[i][1])
            y, x = convert_pix(y, depth, 0), convert_pix(x, depth, 0)
            ax.add_patch(Rectangle((x, y), size, size, facecolor="None",
                                   edgecolor="black", lw=0.5))
            y1, y2 = max(y, 0), min(y + size, H)
            x1, x2 = max(x, 0), min(x + size, W)
            if y1 <= y2 and x1 <= x2:
                overall_imp[depth, y1:y2, x1:x2] = imps[depth][i] + 1e-4

    # fold deeper importances into parents with 0.5 weight per depth
    for depth in range(L - 2, -1, -1):
        m = overall_imp[depth + 1] != 0
        overall_imp[depth][m] = (overall_imp[depth][m]
                                 + overall_imp[depth + 1][m] * 0.5)
    overall_imp = overall_imp[0]

    alpha = np.where(overall_imp > 0, 0.5, 0.0)
    if (overall_imp > 0).any():
        overall_imp[overall_imp == 0] = overall_imp[overall_imp > 0].min()
    hm = ax.imshow(overall_imp, cmap="viridis", alpha=alpha, aspect="equal")

    # viewport from level-0 patch positions, excluding top/bottom 10%
    ys = [int(v) for v in slide_depths[0].locs[:, 0]]
    thresh = 0.1
    ys_f = [y for y in ys if thresh < (y + P / 2) / H < 1 - thresh] or ys
    pad = 128
    for a in axes:
        a.set_ylim(max(ys_f) + pad + P, min(ys_f) - pad)

    cax = inset_axes(axes[1], width="5%", height="100%", loc="right",
                     borderpad=-1.5)
    fig.colorbar(hm, cax=cax, orientation="vertical")
    fig.tight_layout()
    fig.subplots_adjust(right=0.9)

    if out_path is not None:
        if not out_path.endswith(".pdf"):
            out_path += ".pdf"
        plt.savefig(out_path, format="pdf", dpi=200)
    if show:
        plt.show()
    plt.close(fig)
    return out_path
