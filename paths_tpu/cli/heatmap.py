"""Heatmap visualisation entry point.

CLI contract mirrors the reference (`heatmap_visualise.py:211-216`):

    python -m paths_tpu.cli.heatmap -m models/DIR -s slide.svs \
        [-a annotations.xml] -o out/heatmap.pdf [--weights uni.pt]
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model-dir", required=True, type=str)
    parser.add_argument("-s", "--slide-path", default=None, type=str)
    parser.add_argument("--slide-id", default=None, type=str,
                        help="render from PREPROCESSED grids in the "
                             "config's feature store (no raw WSI or "
                             "encoder needed) instead of --slide-path")
    parser.add_argument("-a", "--annotation-path", default=None, type=str,
                        help="CAMELYON17 annotation XML (optional)")
    parser.add_argument("-o", "--out", default=None, type=str,
                        help="Output PDF path")
    parser.add_argument("--encoder", type=str, default="UNI")
    parser.add_argument("--weights", type=str, default=None,
                        help="torch state_dict for the patch encoder")
    parser.add_argument("--block-impl", type=str, default="auto",
                        choices=("auto", "fused", "fused1", "flash", "xla",
                                 "int8"),
                        help="encoder block kernels (see cli.preprocess)")
    parser.add_argument("--tissue-threshold", type=float, default=0.025)
    parser.add_argument("--default-power", type=float, default=40.0)
    parser.add_argument("--no-camelyon", action="store_true",
                        help="Disable the CAMELYON black-background remap")
    args = parser.parse_args(argv)

    from paths_tpu.config import Config
    from paths_tpu.runtime import setup_compilation_cache

    setup_compilation_cache()

    config = Config.load(args.model_dir, test_mode=True)
    np.random.seed(config.seed)

    import jax

    from paths_tpu.models.recursive import recursive_init
    from paths_tpu.train.state import load_state

    if (args.slide_path is None) == (args.slide_id is None):
        parser.error("exactly one of --slide-path / --slide-id required")

    params = recursive_init(jax.random.PRNGKey(config.seed), config)
    params, _, stats = load_state(args.model_dir, params, config=config)
    print("Loaded from epoch", stats.get("epoch"))

    if args.slide_id is not None:
        from paths_tpu.data.feature_store import FeatureStore
        from paths_tpu.viz.heatmap import heatmap_from_store

        out = heatmap_from_store(config, params, args.slide_id,
                                 FeatureStore(config.preprocess_dir),
                                 args.out)
    else:
        from paths_tpu.encoders.registry import from_name
        from paths_tpu.viz.heatmap import heatmap_slide

        encode, dim, _ = from_name(args.encoder, weights_path=args.weights,
                                   block_impl=args.block_impl)
        out = heatmap_slide(config, params, encode, args.slide_path,
                            args.annotation_path, args.out,
                            tissue_threshold=args.tissue_threshold,
                            camelyon=not args.no_camelyon,
                            default_power=args.default_power)
    if out:
        print("Wrote", out)


if __name__ == "__main__":
    main()
