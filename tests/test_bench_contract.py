"""bench.py contract smoke: the driver parses its JSON line, so the
helper functions and field set must not silently break (runs the
preprocess section on tiny CPU inputs with a small encoder)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_vit_flops_known_values():
    from paths_tpu.encoders import vit

    # ViT-L/16@224 forward ~= 123 GF (2 x the commonly quoted 61.6 GMACs)
    assert abs(bench.vit_flops_per_image(vit.UNI) / 1e9 - 123) < 5
    # SwiGLU packed fc1 counts both gate and value halves
    v2 = bench.vit_flops_per_image(vit.VIRCHOW2)
    assert v2 > 2 * bench.vit_flops_per_image(vit.UNI)


def test_synthetic_slide_tissue_fraction():
    img = bench.make_synthetic_slide(grid_hw=(4, 5), patch=64,
                                     tissue_fraction=0.5, seed=0)
    assert img.shape == (256, 320, 3) and img.dtype == np.uint8
    from paths_tpu.preprocess.masking import tissue_mask

    frac = tissue_mask(img).mean()
    assert 0.3 < frac < 0.7, frac


def test_bench_preprocess_fields():
    r = bench.bench_preprocess(grid_hw=(2, 3), batch_size=8, threads=2,
                               encoder="kaiko-vits16", n_slides=1)
    expected = {"preprocess_slides_per_hour", "preprocess_patches_per_sec",
                "preprocess_patches_per_slide", "preprocess_decode_s",
                "preprocess_h2d_s", "preprocess_encode_exposed_s",
                "preprocess_total_s", "preprocess_decode_workers",
                "preprocess_pipeline_mfu", "preprocess_native_decode"}
    assert set(r) == expected, r
    assert r["preprocess_patches_per_slide"] > 0
    assert r["preprocess_slides_per_hour"] > 0
