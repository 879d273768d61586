"""Standalone evaluation of a trained model on a dataset split.

The reference only evaluates inside train.py; this entry point loads a
checkpoint (native `model.npz` or a reference torch `model.pt`) and
reports loss + c-index/AUC on the chosen split:

    python -m paths_tpu.cli.evaluate -m models/DIR [--split test]
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model-dir", required=True)
    parser.add_argument("--split", choices=["train", "val", "test"],
                        default="test")
    parser.add_argument("--batch-size", type=int, default=None)
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
    from paths_tpu.parallel.mesh import (
        data_axis_size,
        mesh_from_config,
        replicate,
        shard_train_batch,
    )
    from paths_tpu.train.evaluators import make_evaluator
    from paths_tpu.train.loop import _epoch_batches, make_optimizer, make_step_fns
    from paths_tpu.train.state import load_state

    splits = load_splits([0.7, 0.15, 0.15], config.seed, config)
    ds = {"train": splits[0], "val": splits[1], "test": splits[2]}[args.split]
    assert ds is not None and len(ds), f"split '{args.split}' is empty"

    params = recursive_init(jax.random.PRNGKey(config.seed), config)
    params, _, stats = load_state(args.model_dir, params, config=config)
    print(f"Loaded checkpoint from epoch {stats.get('epoch')}")

    mesh = mesh_from_config(config)
    params = replicate(mesh, params)

    evaluator = make_evaluator(config, args.split)
    bs = args.batch_size or config.batch_size[0]

    # honor the trained model's engine: streaming keeps the deeper feature
    # tables host-side (the fused path would collate every level's full
    # tables to the device — the exact HBM blow-up streaming exists to
    # avoid); "auto" re-prices from this split's actual shape bounds
    engine = config.engine
    if engine == "auto":
        from paths_tpu.engine.auto import resolve_engine

        engine = resolve_engine(config, ds.global_pads(), bs)

    def register(labels, pred, loss, w):
        n_real = int(w.sum())
        host_labels = {k: np.asarray(v)[:n_real] for k, v in labels.items()}
        evaluator.register(host_labels, np.asarray(pred)[:n_real],
                           float(loss))

    if engine == "streaming":
        from paths_tpu.engine.streaming import StreamingEngine
        from paths_tpu.train.loop import _epoch_batches_streaming

        eng = StreamingEngine(config, mesh=mesh)
        for bag0, host_tables, labels, w, slides in _epoch_batches_streaming(
                ds, bs, shuffle=False, seed=0,
                mesh_size=data_axis_size(mesh), config=config, mesh=mesh):
            loss, pred = eng.evaluate(params, bag0, host_tables, labels)
            register(labels, pred, loss, w)
            if not ds.cache_slides:
                for s_ in slides:
                    s_.unload()
    else:
        _, evaluate = make_step_fns(config, make_optimizer(config), mesh=mesh)
        for bag0, tables, labels, w in _epoch_batches(
                ds, bs, shuffle=False, seed=0, mesh_size=data_axis_size(mesh),
                config=config):
            bag0, tables, labels = shard_train_batch(mesh, bag0, tables,
                                                     labels)
            loss, aux = evaluate(params, bag0, tables, labels)
            register(labels, aux["pred"], loss, w)

    out = evaluator.calculate()
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
