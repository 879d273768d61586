"""Golden-raster fixture for the heatmap renderer.

The painter is already pinned against an in-repo naive implementation of
the reference's painting semantics (test_raw_slide.py). This adds the
missing end-to-end guard: a DETERMINISTIC recursion + render (fixed
slide, fixed params, dummy encoder) whose folded-importance canvas,
viewport and rasterized figure must match a committed fixture
(fixtures/heatmap_golden.npz) — so any silent change to outline
geometry, overlay alpha/colormap, fold weights or viewport math shows up
as a diff against the recorded raster, the closest available stand-in
for the reference figure pipeline (`heatmap_visualise.py:148-205`,
which needs tiatoolbox/openslide and real weights to run).

Regenerate after an INTENTIONAL renderer change:
    python -m pytest tests/test_heatmap_golden.py --regen-heatmap-golden
"""
import os

import jax
import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "heatmap_golden.npz")


def _render(tmp_path):
    from paths_tpu.models.recursive import recursive_init
    from paths_tpu.viz.heatmap import (
        _viewport_ylim,
        folded_importance,
        heatmap_slide,
        run_recursion,
    )
    from test_raw_slide import dummy_encoder, slide_file, small_cfg

    path, _, _ = slide_file(tmp_path)
    cfg = small_cfg()
    cfg.base_power = 10.0
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    enc = dummy_encoder()

    P = cfg.model_config.patch_size
    slides, imps, logits = run_recursion(cfg, params, enc, path,
                                         tissue_threshold=0.1,
                                         camelyon=False, default_power=40.0)
    big = slides[0].view_at_power(cfg.base_power)
    H, W = big.shape[:2]
    canvas = folded_importance(slides, imps, P, (H, W))
    ylim = _viewport_ylim(slides[0], P, H)

    png = os.path.join(str(tmp_path), "hm.png")
    heatmap_slide(cfg, params, enc, path, None, png, tissue_threshold=0.1,
                  camelyon=False, default_power=40.0)
    from PIL import Image

    raster = np.asarray(Image.open(png).convert("RGB"), np.float32)
    # downsample to a stable 64 x 96 fingerprint (mean-pool)
    h, w = raster.shape[:2]
    ry = np.linspace(0, h, 65).astype(int)
    rx = np.linspace(0, w, 97).astype(int)
    fp = np.array([[raster[ry[i]:max(ry[i + 1], ry[i] + 1),
                           rx[j]:max(rx[j] + 1, rx[j + 1])].mean(axis=(0, 1))
                    for j in range(96)] for i in range(64)])
    return {"canvas": canvas.astype(np.float32),
            "ylim": np.asarray(ylim, np.int64),
            "logits": np.asarray(logits, np.float32),
            "raster_fp": fp.astype(np.float32)}


def test_heatmap_matches_golden(tmp_path, request):
    got = _render(tmp_path)
    if request.config.getoption("--regen-heatmap-golden"):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez_compressed(FIXTURE, **got)
        pytest.skip("regenerated heatmap golden fixture")
    assert os.path.isfile(FIXTURE), (
        "fixture missing; run with --regen-heatmap-golden")
    ref = np.load(FIXTURE)
    np.testing.assert_array_equal(got["ylim"], ref["ylim"])
    np.testing.assert_allclose(got["logits"], ref["logits"], atol=1e-5)
    np.testing.assert_allclose(got["canvas"], ref["canvas"], atol=1e-5)
    # rasterized figure fingerprint: tolerant of antialiasing jitter,
    # loud on geometry/colormap/alpha changes
    diff = np.abs(got["raster_fp"] - ref["raster_fp"])
    assert diff.mean() < 3.0 and diff.max() < 60.0, (
        diff.mean(), diff.max())
