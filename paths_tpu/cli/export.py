"""Export a trained model as a portable StableHLO serving artifact.

    python -m paths_tpu.cli.export -m models/DIR -o model.shlo \
        [--batch-size N] [--freeze] [--platforms tpu cpu]

The artifact is `jax.export` StableHLO: any JAX process can run it via
`paths_tpu.export.load_serving(blob).call(...)` (or `jax.export.
deserialize` directly) with no model code. Input shapes are fixed at
export time from the dataset's global pads — the same single-program
contract the trainer uses (`config.static_shapes`). The reference has
no deployment path at all (inference lives inside `train.py:106-116`).
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model-dir", required=True)
    parser.add_argument("-o", "--out", required=True,
                        help="output artifact path")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="serving batch size (default: train batch)")
    parser.add_argument("--freeze", action="store_true",
                        help="bake weights into the artifact (self-"
                             "contained, call(bag, tables))")
    parser.add_argument("--poly-batch", action="store_true",
                        help="export the batch axis as a symbolic "
                             "dimension (one artifact, any batch size)")
    parser.add_argument("--platforms", nargs="+", default=None,
                        help="lowering platforms, e.g. --platforms tpu cpu")
    args = parser.parse_args(argv)

    from paths_tpu.config import Config
    from paths_tpu.runtime import set_matmul_precision, setup_compilation_cache

    config = Config.load(args.model_dir)
    setup_compilation_cache()
    set_matmul_precision(config.compute_dtype)

    import jax
    import numpy as np

    from paths_tpu.data.dataset import load_splits, union_pads
    from paths_tpu.export import export_serving
    from paths_tpu.models.recursive import recursive_init
    from paths_tpu.train.loop import _epoch_batches
    from paths_tpu.train.state import load_state

    np.random.seed(config.seed)
    train, val, test = load_splits([0.7, 0.15, 0.15], config.seed, config)
    pads = union_pads(*(d.global_pads() for d in [train, val, test]
                        if d is not None))

    params = recursive_init(jax.random.PRNGKey(config.seed), config)
    params, _, stats = load_state(args.model_dir, params, config=config)
    print(f"Exporting checkpoint from epoch {stats.get('epoch')}",
          file=sys.stderr)

    bs = args.batch_size or config.batch_size[0]
    bag0, tables, _labels, _w = next(iter(_epoch_batches(
        train, bs, shuffle=False, seed=0, mesh_size=1, config=config,
        pads=pads)))

    blob = export_serving(config, params, bag0, tables,
                          freeze_params=args.freeze,
                          poly_batch=args.poly_batch,
                          platforms=args.platforms)
    with open(args.out, "wb") as f:
        f.write(blob)
    kind = "frozen (weights baked in)" if args.freeze else "weights-as-args"
    batch = "symbolic" if args.poly_batch else str(bs)
    print(f"Wrote {args.out}: {len(blob)/1e6:.2f} MB, {kind}, "
          f"batch={batch}, level0={bag0.fts.shape[1]} patches",
          file=sys.stderr)


if __name__ == "__main__":
    main()
