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
                "preprocess_h2d_s", "preprocess_h2d_mb",
                "preprocess_link_mbps", "preprocess_encode_exposed_s",
                "preprocess_total_s", "preprocess_overlap_efficiency",
                "preprocess_decode_workers", "preprocess_mp_decode_workers",
                "preprocess_mp_total_s",
                "preprocess_pipeline_mfu", "preprocess_native_decode"}
    assert set(r) == expected, r
    assert r["preprocess_patches_per_slide"] > 0
    assert r["preprocess_slides_per_hour"] > 0
    assert r["preprocess_h2d_mb"] > 0 and r["preprocess_link_mbps"] > 0
    assert 0.0 < r["preprocess_overlap_efficiency"] <= 1.0
    # the mp decode fan-out actually ran and produced a number
    assert r["preprocess_mp_decode_workers"] == 2
    assert r["preprocess_mp_total_s"] > 0


def test_bench_kernel_parity_smoke(monkeypatch):
    """The on-chip kernel-parity block (VERDICT r3 #1) runs the same code
    paths on CPU via the Pallas interpreter at tiny shapes; the driver
    runs it unattended at full shapes on the real chip."""
    import paths_tpu.kernels.flash_attention as fa
    from paths_tpu.kernels import vit_fused, vit_int8

    monkeypatch.setattr(vit_fused, "INTERPRET", True)
    monkeypatch.setattr(fa, "INTERPRET", True)
    monkeypatch.setattr(vit_int8, "INTERPRET", True)
    r = bench.bench_kernel_parity(small=True)
    kp = r["kernel_parity"]
    for k in ("fused_pair_vs_xla_max_err", "fused1_vs_xla_max_err",
              "swiglu_vs_xla_max_err", "flash_fwd_vs_xla_max_err",
              "flash_bwd_vs_xla_max_err", "fused_bf16_vs_xla_rel_err",
              "swiglu_bf16_vs_xla_rel_err", "int8_vs_mirror_max_err",
              "int8_swiglu_vs_mirror_max_err", "int8_vs_f32_rel_err",
              "int8_swiglu_vs_f32_rel_err"):
        assert k in kp, kp
    # interpreter == same f32 math: errors must be tiny
    assert r["fused_vs_xla_max_err"] < 1e-3, kp
    # bf16 production path: both sides round through bf16, op order only
    assert kp["fused_bf16_vs_xla_rel_err"] < 2e-2, kp
    assert kp["swiglu_bf16_vs_xla_rel_err"] < 2e-2, kp
    # int8 kernels: exact vs the quantized-math mirror, bounded vs f32
    assert kp["int8_vs_mirror_max_err"] < 1e-4, kp
    assert kp["int8_swiglu_vs_mirror_max_err"] < 1e-4, kp
    assert kp["int8_vs_f32_rel_err"] < 3e-2, kp
    assert kp["int8_swiglu_vs_f32_rel_err"] < 3e-2, kp


def test_bench_inference_smoke(tmp_path):
    """BASELINE.json workload #1 (single-slide pretrained forward) on a
    tiny config + store; the driver runs it at flagship shape on chip."""
    import os

    from paths_tpu.config import Config, PATHSProcessorConfig
    from paths_tpu.data.dataset import load_splits
    from paths_tpu.data.synthetic import (make_synthetic_metadata,
                                          make_synthetic_store)

    mc = PATHSProcessorConfig(patch_embed_dim=16, trans_dim=8, trans_heads=2,
                              trans_layers=1, importance_mlp_hidden_dim=8,
                              hierarchical_ctx_mlp_hidden_dim=8,
                              pos_encoding_mode="2d", dropout=0.0)
    cfg = Config(model_config=mc, num_levels=2, top_k_patches=2, nbins=2,
                 task="survival", batch_size=4, level0_bucket=16,
                 csv_path=os.path.join(str(tmp_path), "meta.csv.zip"),
                 preprocess_dir=os.path.join(str(tmp_path), "store"),
                 wsi_dir=os.path.join(str(tmp_path), "brca"))
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=4,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    ds = load_splits([1.0, 0.0, 0.0], seed=0, config=cfg)[0]
    r = bench.bench_inference(cfg, ds, iters=2)
    assert set(r) == {"inference_slide_ms"} and r["inference_slide_ms"] > 0


def test_run_sections_failsafe_json():
    """VERDICT r4 #1(c): a parseable JSON line must survive a raising
    sub-bench AND a budget expiry — the last stdout line always carries
    everything measured so far."""
    import io
    import json

    record = {"metric": "m", "value": None, "unit": "u",
              "vs_baseline": None, "truncated": [], "failed": []}
    out = io.StringIO()

    def ok():
        return {"value": 1.5}

    def boom():
        raise RuntimeError("sub-bench exploded")

    slow = ("slow", 1e9, lambda: {"never": True})   # can't fit any budget
    bench._run_sections(record, [("ok", 0, ok), ("boom", 0, boom), slow],
                        budget_s=60.0, stream=out)
    lines = [ln for ln in out.getvalue().splitlines() if ln.strip()]
    # one line before any section + one after each of the 3 sections
    assert len(lines) == 4
    for ln in lines:
        json.loads(ln)                      # every line parses
    last = json.loads(lines[-1])
    assert last["value"] == 1.5
    assert last["failed"] == ["boom"]
    assert last["truncated"] == ["slow"]
    assert "never" not in last


def test_run_sections_zero_budget_still_emits():
    """Even with the budget already spent, the record is printed with all
    sections truncated (driver parses the last line, never null)."""
    import io
    import json
    import time

    record = {"metric": "m", "value": None, "unit": "u",
              "vs_baseline": None, "truncated": [], "failed": []}
    out = io.StringIO()
    bench._run_sections(record, [("a", 1, lambda: {"x": 1})], budget_s=0.0,
                        stream=out, t_start=time.monotonic() - 10)
    last = json.loads(out.getvalue().splitlines()[-1])
    assert last["truncated"] == ["a"] and "x" not in last


def test_bench_serving_smoke(tmp_path):
    """Serving-latency section (VERDICT r4 #5) on a tiny config + store:
    field names and positivity; the driver runs it at flagship shape."""
    import os

    from paths_tpu.config import Config, PATHSProcessorConfig
    from paths_tpu.data.synthetic import (make_synthetic_metadata,
                                          make_synthetic_store)

    mc = PATHSProcessorConfig(patch_embed_dim=16, trans_dim=8, trans_heads=2,
                              trans_layers=1, importance_mlp_hidden_dim=8,
                              hierarchical_ctx_mlp_hidden_dim=8,
                              pos_encoding_mode="2d", dropout=0.0)
    cfg = Config(model_config=mc, num_levels=2, top_k_patches=2, nbins=2,
                 task="survival", batch_size=4, level0_bucket=16,
                 csv_path=os.path.join(str(tmp_path), "meta.csv.zip"),
                 preprocess_dir=os.path.join(str(tmp_path), "store"),
                 wsi_dir=os.path.join(str(tmp_path), "brca"))
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=4,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    r = bench.bench_serving(cfg)
    assert set(r) == {"serving_p50_ms", "serving_p99_ms",
                      "serving_miss_p50_ms"}
    assert all(v > 0 for v in r.values())
    # a cache hit skips collation + H2D; it must not be slower than the
    # miss path by more than timer noise
    assert r["serving_p50_ms"] <= r["serving_miss_p50_ms"] * 3


def test_bench_heatmap_smoke():
    """The heatmap workload block end to end (tiled-JPEG write, raw-slide
    recursion, PDF) on a tiny config + small encoder."""
    from paths_tpu.config import Config, PATHSProcessorConfig

    mc = PATHSProcessorConfig(patch_embed_dim=384, trans_dim=8, trans_heads=2,
                              trans_layers=1, importance_mlp_hidden_dim=8,
                              hierarchical_ctx_mlp_hidden_dim=8,
                              pos_encoding_mode="2d", patch_size=256)
    cfg = Config(model_config=mc, num_levels=2, top_k_patches=2, nbins=2,
                 base_power=5.0)
    r = bench.bench_heatmap(cfg, grid_hw=(2, 2), encoder="kaiko-vits16",
                            runs=1)
    assert set(r) == {"heatmap_slide_s"} and r["heatmap_slide_s"] > 0
