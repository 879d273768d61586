"""Training entry point.

Usage (reference `train.py:119-157` CLI contract):
    python -m paths_tpu.cli.train -m models/my_experiment

The model directory must contain a `config.json`; checkpoints, metrics
and train stats are written back into it, and an interrupted run resumes
from the last saved epoch.
"""
from __future__ import annotations

import argparse

import numpy as np

from paths_tpu.config import Config
from paths_tpu.train.logging import MetricsLogger
from paths_tpu.train.loop import train_loop


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model-dir", required=True,
                        help="Path to model directory containing config.json")
    parser.add_argument("--wandb-project-name", type=str, default="PATHS")
    parser.add_argument("--no-wandb", action="store_true")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture a jax.profiler device trace of the "
                             "run into DIR (Perfetto/TensorBoard)")
    args = parser.parse_args(argv)

    from paths_tpu.runtime import (
        maybe_init_distributed,
        set_matmul_precision,
        setup_compilation_cache,
    )

    # multi-host (pod) runs: every host runs this same command; a no-op
    # unless coordinator env vars are set (JAX_COORDINATOR_ADDRESS [+
    # JAX_NUM_PROCESSES/JAX_PROCESS_ID off-TPU]). Must run before the
    # first backend touch so jax.devices() is global.
    maybe_init_distributed()

    config = Config.load(args.model_dir)
    np.random.seed(config.seed)

    setup_compilation_cache()
    # exact f32 matmuls for reference-faithful training numerics; the
    # model is tiny so the MXU-precision cost is irrelevant here
    set_matmul_precision(config.compute_dtype)

    from paths_tpu.data.dataset import load_splits

    train, val, test = load_splits([0.7, 0.15, 0.15], config.seed, config)
    if config.early_stopping:
        assert val is not None and len(val), \
            "Must have validation set to use early stopping"

    logger = MetricsLogger(args.model_dir, config.to_dict(),
                           project=args.wandb_project_name,
                           use_wandb="no" if args.no_wandb else "auto")
    if args.profile:
        from paths_tpu.profiling import trace

        with trace(args.profile):
            train_loop(config, args.model_dir, train, val, test,
                       logger=logger)
    else:
        train_loop(config, args.model_dir, train, val, test, logger=logger)


if __name__ == "__main__":
    main()
