"""End-to-end demo on synthetic slides: every public entry point in the
order a real user runs them.

    python examples/run_synthetic_demo.py [--workdir DIR] [--encoder NAME]

1. fabricate raw WSIs (uint8 `.npy` pyramids) + a TCGA-style metadata CSV
2. `paths_tpu.cli.verify_conversion` — certify the encoder weights file
   (here: a freshly saved timm-keyed random checkpoint standing in for a
   real UNI download)
3. `paths_tpu.cli.preprocess`  — tissue masking + patch encoding -> grids
4. `paths_tpu.cli.train`      — hierarchical training with val evals
5. `paths_tpu.cli.evaluate`   — test-split metrics
6. `paths_tpu.cli.predict`    — per-slide risk CSV
7. `paths_tpu.cli.heatmap`    — importance-heatmap PDF for one slide
8. `paths_tpu.cli.export`     — frozen StableHLO serving artifact

Runs on one TPU chip or CPU (~2 min on CPU with the tiny defaults).
The encoder is randomly initialized (no network access); with real
weights (`--weights uni.pt --encoder UNI`) the same flow reproduces the
PATHS paper setup.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_raw_slides(slide_dir: str, n: int, seed: int = 0, size: int = 1024):
    """White-background slides with 1-3 dark tissue blobs each."""
    rng = np.random.default_rng(seed)
    ids = []
    os.makedirs(slide_dir, exist_ok=True)
    for i in range(n):
        img = np.full((size, size, 3), 243, np.uint8)
        for _ in range(int(rng.integers(1, 4))):
            cy, cx = rng.uniform(0.2, 0.8, 2) * size
            r = rng.uniform(0.1, 0.25) * size
            yy, xx = np.mgrid[0:size, 0:size]
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 < r**2
            tissue = rng.integers(60, 170, (size, size, 3)).astype(np.uint8)
            img[blob] = tissue[blob]
        sid = f"DEMO-{i:04d}"
        np.save(os.path.join(slide_dir, f"{sid}.npy"), img)
        ids.append(sid)
    return ids


def make_metadata(csv_path: str, ids, seed: int = 0):
    rng = np.random.default_rng(seed)
    with open(csv_path, "w") as f:
        f.write("case_id,slide_id,survival_months,censorship,oncotree_code\n")
        for i, sid in enumerate(ids):
            f.write(f"CASE-{i:04d},{sid}.svs,"
                    f"{rng.uniform(2, 100):.1f},{rng.integers(0, 2)},IDC\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/paths_tpu_demo")
    ap.add_argument("--encoder", default="kaiko-vits16")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--slides", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--store-dtype", default="float32",
                    choices=("float32", "float16"),
                    help="feature-store dtype (float16 halves the store)")
    args = ap.parse_args()

    from paths_tpu.encoders.registry import from_name
    from paths_tpu.runtime import setup_compilation_cache

    setup_compilation_cache()
    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd)
    slide_dir = os.path.join(wd, "slides")
    store_dir = os.path.join(wd, "preprocessed")
    model_dir = os.path.join(wd, "model")

    print("== 1/9 fabricate raw slides")
    ids = make_raw_slides(slide_dir, args.slides)

    print("== 2/9 verify encoder weights (drop-in certification)")
    weights = args.weights
    if weights is None:
        # stand-in for a real downloaded checkpoint: a timm-keyed random
        # state_dict of the chosen architecture, saved with torch
        import torch

        from paths_tpu.encoders.registry import _VIT_SPECS
        from paths_tpu.encoders.torch_mirror import timm_vit_mirror

        torch.manual_seed(0)
        spec, _ = _VIT_SPECS[args.encoder.lower()]
        weights = os.path.join(wd, "encoder_sd.pt")
        torch.save(timm_vit_mirror(spec).state_dict(), weights)
    from paths_tpu.cli.verify_conversion import main as verify

    verify(["--model", args.encoder, "--weights", weights, "--images", "1"])

    print("== 3/9 preprocess (tissue mask + patch encode)")
    from paths_tpu.cli.preprocess import main as preprocess

    # base objective power 10 so the demo pyramid spans 0.625x..10x
    preprocess(["-m", args.encoder, "-d", slide_dir, "-o", store_dir,
                "-b", "16", "-p", "64", "-ms", "0.625", "1.25", "2.5", "5",
                "10", "--ext", ".npy", "--default-power", "10",
                "--weights", weights, "--store-dtype", args.store_dtype])

    _, dim, _ = from_name(args.encoder)
    print(f"== 4/9 train ({args.epochs} epochs, encoder dim {dim})")
    make_metadata(os.path.join(wd, "meta.csv"), ids)

    from paths_tpu.config import Config, PATHSProcessorConfig

    cfg = Config(
        model_config=PATHSProcessorConfig(
            patch_embed_dim=dim, trans_dim=32, trans_heads=2, trans_layers=1,
            importance_mlp_hidden_dim=16, hierarchical_ctx_mlp_hidden_dim=16,
            pos_encoding_mode="2d", patch_size=64, dropout=0.0),
        num_levels=5, top_k_patches=4, nbins=2, task="survival",
        num_epochs=args.epochs, lr=1e-3, batch_size=4, level0_bucket=8,
        csv_path=os.path.join(wd, "meta.csv"), preprocess_dir=store_dir,
        wsi_dir=os.path.join(wd, "brca"))
    os.makedirs(model_dir)
    cfg.save(model_dir)

    from paths_tpu.cli.train import main as train

    train(["-m", model_dir, "--no-wandb"])

    print("== 5/9 evaluate")
    from paths_tpu.cli.evaluate import main as evaluate

    metrics = evaluate(["-m", model_dir, "--split", "test"])

    print("== 6/9 predict")
    from paths_tpu.cli.predict import main as predict

    preds_csv = os.path.join(wd, "predictions.csv")
    predict(["-m", model_dir, "--split", "test", "-o", preds_csv])

    print("== 7/9 heatmap")
    from paths_tpu.cli.heatmap import main as heatmap

    pdf = os.path.join(wd, "heatmap.pdf")
    heatmap(["-m", model_dir, "-s",
             os.path.join(slide_dir, f"{ids[0]}.npy"), "-o", pdf,
             "--encoder", args.encoder, "--no-camelyon",
             "--tissue-threshold", "0.05", "--default-power", "10",
             "--weights", weights])

    print("== 8/9 export serving artifact (frozen StableHLO)")
    from paths_tpu.cli.export import main as export

    artifact = os.path.join(wd, "model.shlo")
    export(["-m", model_dir, "-o", artifact, "--freeze",
            "--batch-size", "2"])
    from paths_tpu.export import load_serving

    exp = load_serving(open(artifact, "rb").read())
    print(f"artifact reloads: platforms={exp.platforms}, "
          f"{len(exp.in_avals)} inputs")

    print("== 9/9 serve the artifact over HTTP")
    import http.client
    import threading

    from paths_tpu.cli.serve import make_server
    from paths_tpu.serve import ServingSession

    session = ServingSession(model_dir, artifact=artifact)
    server = make_server(session, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        host, port = server.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=300)
        conn.request("POST", "/predict",
                     body=json.dumps({"slide_ids": session.slide_ids[:2]}))
        served = json.loads(conn.getresponse().read())["predictions"]
        conn.close()
        for row in served:
            print(f"  {row['slide_id']}: risk {row['risk']:.4f}")
    finally:
        server.shutdown()
        server.server_close()

    print("\n=== demo complete ===")
    print("metrics:", json.dumps(metrics))
    print("predictions:", preds_csv)
    print("heatmap:", pdf)
    print("serving artifact:", artifact)
    stats = json.load(open(os.path.join(model_dir, "train_stats.json")))
    print("train loss:", stats["train_loss"])
    return metrics


if __name__ == "__main__":
    main()
