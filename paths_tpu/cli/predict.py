"""Batch inference: per-slide predictions from a trained model.

Writes a CSV of slide-level outputs over a dataset split (the reference
computes metrics in-loop but offers no way to export predictions):

    python -m paths_tpu.cli.predict -m models/DIR [--split test] [-o out.csv]

Survival task columns: slide_id, risk (= -sum survival, `eval.py:59-64`),
hazard_0..n. Subtype task: slide_id, pred (argmax), p_<class> softmax
probabilities.
"""
from __future__ import annotations

import argparse
import csv
import sys

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model-dir", required=True)
    parser.add_argument("--split", choices=["train", "val", "test", "all"],
                        default="test")
    parser.add_argument("-o", "--out", default=None,
                        help="Output CSV path (default: stdout)")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--artifact", default=None,
                        help="run the split through a cli.export StableHLO "
                             "artifact instead of the live model")
    args = parser.parse_args(argv)

    from paths_tpu.config import Config
    from paths_tpu.runtime import (
        maybe_init_distributed,
        set_matmul_precision,
        setup_compilation_cache,
    )

    maybe_init_distributed()   # no-op without coordinator env vars
    config = Config.load(args.model_dir)
    setup_compilation_cache()
    set_matmul_precision(config.compute_dtype)
    np.random.seed(config.seed)

    import jax

    from paths_tpu.data.dataset import load_splits
    from paths_tpu.models.recursive import recursive_init
    from paths_tpu.train.loop import _epoch_batches, make_optimizer, make_step_fns
    from paths_tpu.train.state import load_state

    if args.split == "all":
        ds = load_splits([0.7, 0.15, 0.15], config.seed, config,
                         combined=True)
    else:
        splits = load_splits([0.7, 0.15, 0.15], config.seed, config)
        ds = {"train": splits[0], "val": splits[1],
              "test": splits[2]}[args.split]
    assert ds is not None and len(ds), f"split '{args.split}' is empty"

    from paths_tpu.serve import prediction_rows

    def csv_row(r):
        if config.task == "survival":
            return [r["slide_id"], f"{r['risk']:.6f}",
                    *[f"{h:.6f}" for h in r["hazards"]]]
        return [r["slide_id"], r["pred"],
                *[f"{r['probs'][c]:.6f}"
                  for c in config.filter_to_subtypes]]

    if args.artifact:
        # frozen-program path: the artifact executes; no model code runs
        from paths_tpu.serve import ServingSession

        # a split sweep never repeats a batch: no device batch cache
        session = ServingSession(args.model_dir, artifact=args.artifact,
                                 batch_size=args.batch_size,
                                 cache_batches=0)
        rows = [csv_row(r) for r in session.predict(ds.slide_ids)]
    else:
        params = recursive_init(jax.random.PRNGKey(config.seed), config)
        params, _, stats = load_state(args.model_dir, params, config=config)
        print(f"Loaded checkpoint from epoch {stats.get('epoch')}",
              file=sys.stderr)

        _, evaluate = make_step_fns(config, make_optimizer(config))
        bs = args.batch_size or config.batch_size[0]

        rows = []
        pos = 0
        for bag0, tables, labels, w in _epoch_batches(
                ds, bs, shuffle=False, seed=0, mesh_size=1, config=config):
            _, aux = evaluate(params, bag0, tables, labels)
            n_real = int(w.sum())
            sids = ds.slide_ids[pos: pos + n_real]
            pos += n_real
            rows.extend(csv_row(r) for r in
                        prediction_rows(config, sids,
                                        np.asarray(aux["pred"])))

    if config.task == "survival":
        header = ["slide_id", "risk"] + [f"hazard_{i}"
                                         for i in range(config.nbins)]
    else:
        header = ["slide_id", "pred"] + [f"p_{c}"
                                         for c in config.filter_to_subtypes]

    out = open(args.out, "w", newline="") if args.out else sys.stdout
    try:
        writer = csv.writer(out)
        writer.writerow(header)
        writer.writerows(rows)
    finally:
        if args.out:
            out.close()
            print(f"Wrote {len(rows)} predictions to {args.out}",
                  file=sys.stderr)
    return rows


if __name__ == "__main__":
    main()
