"""Epoch-scale cohort soak: streaming-engine training at reference-like
cohort size, with host-RAM telemetry (VERDICT r4 #3).

    python examples/cohort_soak.py [--record] [--slides 300] [--epochs 10]

The dress rehearsals prove learning at toy cohort scale (48/80 slides).
This run proves the OPERATIONAL story at the scale the reference actually
trains at — TCGA-BRCA is 1022 slides (`data/gdc_manifests/TCGA-BRCA.txt`;
the reference preloads every slide's features into host RAM,
`data_utils/dataset.py:172-180`, and trains 40 epochs, `train.py:31-116`):

* a synthetic cohort of 300+ slides with a BRCA-like size spread (~3x
  range of patch counts, float16 store ~10 GB on disk, memory-mapped —
  never RAM-resident),
* >= 10 epochs of the flagship model through `engine="streaming"` (tables
  stay host-side; only the level-0 bag + per-level gathered lookups cross
  the link, ~30 MB/step instead of ~2 GB),
* per-epoch wall AND host-RSS telemetry recorded by the train loop itself
  (`train_stats["epoch_wall_s"/"host_rss_mb"]`) plus a background RSS
  sampler for the true peak.

Why RAM telemetry is the point: this dev host's device client leaks host
RAM roughly equal to total bytes ever device_put (CLAUDE.md). A naive
fused run with per-epoch collation leaked ~130 GB in ~40 steps (r3,
OOM-killed); the streaming engine's whole purpose at cohort scale is to
bound that. The committed record under `examples/records/cohort_soak/`
shows the measured slope (MB/epoch), the peak, and a held-out c-index
above the signal bar — asserted by tests/test_cohort_soak_record.py.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def record_dir(task: str) -> str:
    name = ("cohort_soak" if task == "survival" else "cohort_soak_subtype")
    return os.path.join(REPO, "examples", "records", name)


class RssSampler:
    """Background thread sampling host RSS for the true inter-epoch peak."""

    def __init__(self, period_s: float = 0.5):
        from paths_tpu.profiling import host_rss_mb

        self._read = host_rss_mb
        self._period = period_s
        self._stop = threading.Event()
        self.samples: list = []
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.is_set():
            rss = self._read()
            if rss is not None:
                self.samples.append((round(time.time(), 1), rss))
            self._stop.wait(self._period)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=5)

    def peak_mb(self):
        return max((r for _, r in self.samples), default=None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/paths_tpu_cohort_soak")
    ap.add_argument("--task", choices=["survival", "subtype"],
                    default="survival",
                    help="subtype: IDC-vs-ILC labels from the same latent "
                         "signal (reports AUC; mirrors the dress "
                         "rehearsal's classification twin at cohort scale)")
    ap.add_argument("--slides", type=int, default=300)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--keep-store", action="store_true",
                    help="reuse an existing workdir store (skip synthesis)")
    ap.add_argument("--record", action="store_true",
                    help="copy the run record into examples/records/")
    args = ap.parse_args()

    from paths_tpu.config import Config
    from paths_tpu.data.synthetic import make_signal_metadata, make_signal_store
    from paths_tpu.profiling import host_rss_mb

    wd = args.workdir
    if not args.keep_store:
        shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd, exist_ok=True)

    cfg = Config.load(os.path.join(REPO, "models", "brca_paths_0"),
                      test_mode=True)
    cfg.csv_path = os.path.join(wd, "meta.csv.zip")
    cfg.preprocess_dir = os.path.join(wd, "store")
    cfg.wsi_dir = os.path.join(wd, "brca")
    cfg.hipt_splits = False          # synthetic slides: random 0.7/0.15/0.15
    cfg.seed = args.seed
    cfg.num_epochs = args.epochs
    cfg.batch_size = [32]            # the flagship batch (config.json)
    cfg.lr = 5e-4                    # in-budget signal recovery (see
    cfg.eval_epochs = 2              # flagship_dress_rehearsal.py notes)
    cfg.engine = "streaming"
    cfg.cache_eval_batches = True
    subtype = args.task == "subtype"
    if subtype:
        cfg.task = "subtype_classification"
        cfg.filter_to_subtypes = ["IDC", "ILC"]

    t0 = time.time()
    if not args.keep_store or not os.path.isdir(cfg.preprocess_dir):
        print(f"== 1/4 synthesize {args.slides} BRCA-shaped signal slides "
              f"(f16 store, ~3x size spread, seed {args.seed})")
        ids, z = make_signal_store(
            cfg.preprocess_dir, cfg, num_slides=args.slides, seed=args.seed,
            base_hw=(4, 5), size_jitter=6, store_dtype=np.float16)
        make_signal_metadata(cfg.csv_path, ids, z, seed=args.seed,
                             subtypes=["IDC", "ILC"] if subtype else None,
                             label_noise=0.25)
    store_gb = sum(
        os.path.getsize(os.path.join(cfg.preprocess_dir, f))
        for f in os.listdir(cfg.preprocess_dir)) / 1e9
    print(f"   store: {store_gb:.1f} GB on disk in {time.time() - t0:.0f}s")

    mdir = os.path.join(wd, "model")
    shutil.rmtree(mdir, ignore_errors=True)
    os.makedirs(mdir)
    cfg.save(mdir)

    print(f"== 2/4 train {args.epochs} epochs x ~{(args.slides * 7) // 320} "
          "steps (streaming engine, batch 32) with RSS telemetry")
    rss_start = host_rss_mb()
    t0 = time.time()
    from paths_tpu.cli.train import main as train

    with RssSampler() as sampler:
        train(["-m", mdir, "--no-wandb"])
    train_wall = time.time() - t0

    print("== 3/4 evaluate the held-out test split")
    from paths_tpu.cli.evaluate import main as evaluate

    test_metrics = evaluate(["-m", mdir, "--split", "test"])

    stats = json.load(open(os.path.join(mdir, "train_stats.json")))
    walls = {int(k): v for k, v in stats.get("epoch_wall_s", {}).items()}
    rss = {int(k): v for k, v in stats.get("host_rss_mb", {}).items()}
    es = sorted(rss)
    # leak slope from epoch 2 on (epoch 1 includes compiles + first-touch
    # materialization); least squares over the recorded per-epoch RSS
    slope = None
    if len(es) >= 3:
        xs = np.asarray(es[1:], float)
        ys = np.asarray([rss[e] for e in es[1:]], float)
        slope = float(np.polyfit(xs, ys, 1)[0])

    last = str(max(int(k) for k in stats["train_loss"]))
    metric = "AUC" if subtype else "c-index"
    summary = {
        "task": cfg.task,
        "engine": "streaming",
        "slides": args.slides,
        "epochs": args.epochs,
        "seed": args.seed,
        "batch_size": 32,
        "store_gb": round(store_gb, 2),
        "store_dtype": "float16",
        "train_wall_s": round(train_wall, 1),
        "epoch_wall_s": walls,
        "host_rss_mb": rss,
        "rss_mb_start": rss_start,
        "rss_mb_peak": sampler.peak_mb(),
        "rss_mb_end": host_rss_mb(),
        "rss_slope_mb_per_epoch": round(slope, 1) if slope is not None
        else None,
        "final_train_loss": stats["train_loss"][last],
        f"final_train_{metric}": stats[f"train_{metric}"][last],
        f"val_{metric}_history": stats.get(f"val_{metric}"),
        "test_metrics": test_metrics,
        "backend": __import__("jax").default_backend(),
        "command": (f"python examples/cohort_soak.py --record "
                    f"--slides {args.slides} --epochs {args.epochs}"
                    + (" --task subtype" if subtype else "")),
        "note": ("Streaming keeps the f16 store memory-mapped; RSS slope "
                 "is the device client's put-leak at ~30 MB/step — the "
                 "naive fused path leaked ~3.2 GB/step (r3, OOM-killed). "
                 "The reference instead preloads the whole cohort into "
                 "RAM (dataset.py:172-180), ~2 GB per 100 f32 slides."),
    }
    print("== 4/4 summary")
    print(json.dumps(summary, indent=2))

    if args.record:
        rdir = record_dir(args.task)
        os.makedirs(rdir, exist_ok=True)
        shutil.copy(os.path.join(mdir, "config.json"),
                    os.path.join(rdir, "config.json"))
        shutil.copy(os.path.join(mdir, "metrics.jsonl"),
                    os.path.join(rdir, "metrics.jsonl"))
        with open(os.path.join(rdir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
            f.write("\n")
        print(f"record written to {rdir}")
    return summary


if __name__ == "__main__":
    main()
