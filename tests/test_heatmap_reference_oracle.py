"""Heatmap parity against the ACTUAL reference figure pipeline.

The golden-raster fixture (test_heatmap_golden.py) pins our renderer
against itself; this test pins it against the real thing: it imports
`/root/reference/heatmap_visualise.py` (stubbing only its unavailable
dependencies — wandb, tiatoolbox, timm, torchvision — none of which are
exercised by the rendering path) and drives `heatmap_camelyon17` with a
scripted slide + model so both renderers consume the IDENTICAL recursion
trace (per-depth locs + importances). It then asserts:

  1. the folded-importance canvas and alpha drawn by the reference
     (extracted from its live matplotlib figure) equal our
     `folded_importance` output exactly,
  2. the visited-patch outline rectangles match ours,
  3. the auto-viewport y-limits match,
  4. the annotation polygon drawn on the left panel matches, and
  5. the full rasterized figures agree pixel-for-pixel (small
     antialiasing tolerance).

Skipped when /root/reference is not mounted (end-user machines); the
golden fixture carries the guard there. Reference logic under test:
`heatmap_visualise.py:52-205` (wireframe rects, per-depth canvas,
0.5-per-depth folding, viridis alpha-0.5 overlay, outlier-trimmed
viewport, inset colorbar, 1x2 panel figure).
"""
import io
import os
import types

import numpy as np
import pytest

from helpers_reference import reference_available, reference_modules

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")

# ---------------------------------------------------------------- trace

L = 3          # levels
P = 8          # patch size (divisible by 2**(L-1) so cells nest exactly)
H, W = 64, 80  # depth-0 image size -> 8 x 10 level-0 grid
TOP_K = 5


def make_trace(seed=0):
    """Scripted recursion: per-depth locs (multiples of P in depth-d
    pixels, the RawSlide invariant) + importances, plus the base image."""
    rng = np.random.default_rng(seed)
    gh, gw = H // P, W // P
    tissue = rng.uniform(size=(gh, gw)) < 0.6
    r0, c0 = np.nonzero(tissue)
    locs = [np.stack([r0, c0], 1).astype(np.int64) * P]
    imps = [rng.uniform(0.05, 1.0, len(r0)).astype(np.float32)]
    for depth in range(1, L):
        kept = np.argsort(imps[depth - 1])[::-1][:TOP_K]
        cells = locs[depth - 1][kept] // P          # parent cell coords
        child = []
        for (r, c) in cells:
            for dy in (0, 1):
                for dx in (0, 1):
                    child.append((2 * r + dy, 2 * c + dx))
        child = np.asarray(child, np.int64)
        locs.append(child * P)                       # depth-d pixels
        imps.append(rng.uniform(0.05, 1.0, len(child)).astype(np.float32))
    bigimg = rng.integers(140, 250, (H, W, 3)).astype(np.uint8)
    return locs, imps, bigimg


def write_annotation_xml(path):
    xml = """<ASAP_Annotations>
  <Annotations>
    <Annotation Name="A0" Type="Polygon" Color="#F4FA58">
      <Coordinates>
        <Coordinate Order="0" X="40.0" Y="60.0"/>
        <Coordinate Order="1" X="240.0" Y="60.0"/>
        <Coordinate Order="2" X="140.0" Y="200.0"/>
      </Coordinates>
    </Annotation>
  </Annotations>
  <AnnotationGroups>
    <Group Name="Tumor" PartOfGroup="None" Color="#F4FA58"/>
  </AnnotationGroups>
</ASAP_Annotations>"""
    with open(path, "w") as f:
        f.write(xml)
    return path


# ------------------------------------------------- reference import rig

@pytest.fixture(scope="module")
def ref_heatmap():
    """The reference heatmap_visualise module (stub rig shared with the
    engine oracle — helpers_reference)."""
    import matplotlib

    matplotlib.use("Agg")
    with reference_modules("heatmap_visualise") as (hv,):
        yield hv


# ----------------------------------------------------- scripted doubles

class FakeSlide:
    """Duck-types the slide surface both renderers touch: locs,
    load_patches, recurse, view_at_power, camelyon attr."""

    def __init__(self, chain, depth, bigimg):
        self._chain, self._depth, self._img = chain, depth, bigimg
        self.locs = chain[depth]

    def load_patches(self):
        return self

    def recurse(self, *a, **k):
        return FakeSlide(self._chain, self._depth + 1, self._img)

    def view_at_power(self, power):
        return self._img


def ref_fake_model(imps):
    import torch

    class M:
        procs = [types.SimpleNamespace(ctx_dim=lambda: (4, 4))]

        def __call__(self, depth, data):
            n = len(imps[depth])
            return {"importance": torch.tensor(imps[depth])[None],
                    "ctx_slide": torch.zeros(1, depth + 1, 4),
                    "ctx_patch": torch.zeros(1, n, depth + 1, 4),
                    "logits": torch.zeros(1, 4)}

    return M()


def ref_config():
    return types.SimpleNamespace(
        num_levels=L, base_power=10.0, magnification_factor=2,
        top_k_patches=[TOP_K] * (L - 1),
        model_config=types.SimpleNamespace(patch_size=P,
                                           ctx_dim=lambda: (4, 4)))


# ------------------------------------------------------------- the test

def run_reference(hv, trace, tmp_path, monkeypatch):
    """Drive heatmap_camelyon17 on the scripted trace; capture the live
    figure's artifacts + raster from inside a patched plt.show."""
    import matplotlib.pyplot as plt

    locs, imps, bigimg = trace
    slide_path = os.path.join(tmp_path, "fake.svs")
    open(slide_path, "wb").close()
    anno_path = write_annotation_xml(os.path.join(tmp_path, "anno.xml"))

    monkeypatch.setattr(
        hv, "load_raw_slide",
        lambda *a, **k: FakeSlide(locs, 0, bigimg))
    monkeypatch.setattr(hv, "from_raw_slide", lambda *a, **k: None)

    captured = {}

    def capture_show(*a, **k):
        fig = plt.gcf()
        sax, ax = fig.axes[0], fig.axes[1]
        captured["heat"] = np.array(ax.images[1].get_array())
        captured["alpha"] = np.array(ax.images[1].get_alpha())
        captured["rects"] = sorted(
            (tuple(p.get_xy()), p.get_width(), p.get_height())
            for p in ax.patches)
        captured["ylim"] = ax.get_ylim()
        captured["anno"] = [np.stack(l.get_data(), 1) for l in sax.lines]
        buf = io.BytesIO()
        fig.savefig(buf, format="png", dpi=200)
        captured["png"] = buf.getvalue()
        plt.close(fig)

    monkeypatch.setattr(hv.plt, "show", capture_show)
    out_pdf = os.path.join(tmp_path, "ref_out.pdf")
    hv.heatmap_camelyon17(ref_config(), ref_fake_model(imps), None, None,
                          slide_path, anno_path, out_pdf)
    assert os.path.isfile(out_pdf)
    return captured


def run_ours(trace, tmp_path, monkeypatch):
    """Our heatmap_slide on the same trace, plus the semantic values."""
    import paths_tpu.viz.heatmap as vh

    locs, imps, bigimg = trace
    slide_path = os.path.join(tmp_path, "fake2.svs")
    open(slide_path, "wb").close()
    anno_path = write_annotation_xml(os.path.join(tmp_path, "anno2.xml"))

    monkeypatch.setattr(
        vh, "load_raw_slide",
        lambda *a, **k: FakeSlide(locs, 0, bigimg))
    monkeypatch.setattr(vh, "encode_bag", lambda *a, **k: None)

    def fake_apply(params, config, depth, bag):
        n = len(imps[depth])
        return {"importance": imps[depth][None],
                "ctx_slide": np.zeros((1, depth + 1, 4)),
                "ctx_patch": np.zeros((1, n, depth + 1, 4)),
                "logits": np.zeros((1, 4))}

    monkeypatch.setattr(vh, "recursive_apply", fake_apply)

    out_png = os.path.join(tmp_path, "ours.png")
    vh.heatmap_slide(ref_config(), params={}, encode_fn=None,
                     slide_path=slide_path, annotation_path=anno_path,
                     out_path=out_png)

    slides = [FakeSlide(locs, d, bigimg) for d in range(L)]
    heat = vh.folded_importance(slides, imps, P, (H, W))
    alpha = np.where(heat > 0, vh.OVERLAY_ALPHA, 0.0)
    visited = heat > 0
    heat_filled = np.where(visited, heat, heat[visited].min())
    rects = []
    for depth, s in enumerate(slides):
        rows, cols, size = vh._depth0_cells(s, depth, P)
        rects.extend(((float(c * size), float(r * size)),
                      float(size), float(size))
                     for r, c in zip(rows, cols))
    return {"heat": heat_filled, "alpha": alpha, "rects": sorted(rects),
            "ylim": vh._viewport_ylim(slides[0], P, H),
            "png_path": out_png}


def test_reference_figure_pipeline_parity(ref_heatmap, tmp_path,
                                          monkeypatch):
    trace = make_trace()
    ref = run_reference(ref_heatmap, trace, str(tmp_path), monkeypatch)
    ours = run_ours(trace, str(tmp_path), monkeypatch)

    # 1. folded-importance canvas + alpha (exact: same float ops)
    np.testing.assert_array_equal(ref["heat"], ours["heat"])
    np.testing.assert_array_equal(ref["alpha"], ours["alpha"])

    # 2. outline rectangles (position + size, both in depth-0 pixels)
    assert ref["rects"] == ours["rects"]

    # 3. viewport
    assert tuple(map(float, ref["ylim"])) == tuple(map(float, ours["ylim"]))

    # 4. annotation polygon on the left panel (closed ring, scaled by
    #    base_power / 40)
    expect = np.array([[40.0, 60.0], [240.0, 60.0], [140.0, 200.0],
                       [40.0, 60.0]]) * (10.0 / 40.0)
    assert len(ref["anno"]) == 1
    np.testing.assert_allclose(ref["anno"][0], expect)

    # 5. full-figure raster (the strongest statement: a user gets the
    #    same PDF). Tolerate trace-level antialiasing differences only.
    from PIL import Image

    a = np.asarray(Image.open(io.BytesIO(ref["png"])).convert("RGB"),
                   np.int16)
    b = np.asarray(Image.open(ours["png_path"]).convert("RGB"), np.int16)
    assert a.shape == b.shape, (a.shape, b.shape)
    diff = np.abs(a - b)
    frac_diff = float((diff.max(-1) > 8).mean())
    print(f"raster: {float((diff.max(-1) > 0).mean()):.4%} pixels differ "
          f"at all, {frac_diff:.4%} beyond antialias tolerance, "
          f"max {diff.max()}, mean {diff.mean():.4f}")
    assert frac_diff < 0.005, (
        f"rasters differ on {frac_diff:.2%} of pixels "
        f"(max {diff.max()}, mean {diff.mean():.3f})")
