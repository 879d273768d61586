"""Offline preprocessing entry point.

CLI contract mirrors the reference (`preprocess/preprocess.py:156-176`):

    python -m paths_tpu.cli.preprocess -m UNI -d /path/to/svs_dir \
        -o /path/to/out -b 64 --weights uni_state_dict.pt

Differences from the reference's flags: `--weights` points at a torch
state_dict for the encoder (no hub downloads here); `--ext` selects the
slide extension (`.svs` via OpenSlide, `.npy` array pyramids or
`.tiles` JPEG pyramids for fixtures); `-w/--workers` is a decode PROCESS
count as in the reference — but processes only decode: one parent process
drives the chip, so the default single producer thread suffices unless
host decode is the bottleneck.
"""
from __future__ import annotations

import argparse
import os

from paths_tpu.data.feature_store import FeatureStore
from paths_tpu.preprocess.pipeline import process_slides


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model", type=str, default="UNI",
                        help="Patch processing model")
    parser.add_argument("--weights", type=str, default=None,
                        help="Path to a torch state_dict for the encoder")
    parser.add_argument("-d", "--dir", type=str, required=True,
                        help="Path to input data folder")
    parser.add_argument("-o", "--out", type=str, required=True,
                        help="Path to output data folder")
    parser.add_argument("-b", "--batch", type=int, default=64)
    parser.add_argument("-p", "--patch", type=int, default=256)
    parser.add_argument("-t", "--threads", type=int,
                        default=8, dest="threads",
                        help="Patch-read threads per decode producer")
    parser.add_argument("-w", "--workers", type=int, default=0,
                        dest="decode_workers",
                        help="Decode processes (reference -w: its 32-"
                             "process fan-out, `preprocess.py:154`); each "
                             "owns a slide shard and WSI handles, feeding "
                             "one device queue. 0 = single producer "
                             "thread (fine unless decode-bound)")
    parser.add_argument("-ms", "--magnifications", type=float, nargs="+",
                        default=[0.625, 1.25, 2.5, 5.0, 10.0])
    parser.add_argument("-ds", "--downscale", type=int, default=4,
                        help="Downscale factor for the background mask")
    parser.add_argument("-lm", "--load_mode", type=int, default=0,
                        choices=(0, 1),
                        help="0: read each patch rect from the slide; "
                             "1: read the whole level image once and "
                             "slice patches from RAM (reference "
                             "`preprocess.py:48-56` — faster on some "
                             "storage, up to ~22GB RAM per level)")
    parser.add_argument("--tissue-threshold", type=float, default=0.1)
    parser.add_argument("--default-power", type=float, default=40.0,
                        help="Objective power assumed when the slide does "
                             "not declare one (reference assumes 40)")
    parser.add_argument("--ext", type=str, default=".svs")
    parser.add_argument("--store-dtype", type=str, default="float32",
                        choices=("float32", "float16"),
                        help="On-disk feature-grid dtype. float32 matches "
                             "the reference byte-for-byte; float16 halves "
                             "store size, host RAM, and collation wire "
                             "bytes (the encoder computes in bf16, so f32 "
                             "grids carry no extra information)")
    parser.add_argument("--store-format", type=str, default="npy",
                        choices=("npy", "pt"),
                        help="npy (native, memory-mappable) or pt "
                             "(reference-format torch tensors the "
                             "reference's `preprocess/loader.py:14-18` "
                             "loads directly — lets its training script "
                             "consume a paths_tpu-preprocessed store)")
    parser.add_argument("--fast-math", action="store_true",
                        help="tanh-GELU encoder variant (~20%% faster, "
                             "~1e-3 relative feature error vs timm)")
    parser.add_argument("--block-impl", type=str, default="auto",
                        choices=("auto", "fused", "fused1", "flash", "xla",
                                 "int8"),
                        help="encoder block kernels: auto = fused Pallas "
                             "on TPU / XLA elsewhere; int8 = quantized "
                             "projections (UNI measured 1.24x the bf16 "
                             "fused path, ~1e-2 relative feature error)")
    parser.add_argument("--data-shards", type=int, default=0,
                        help="Shard encode batches over this many devices "
                             "(0 = single device)")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)

    from paths_tpu.runtime import setup_compilation_cache

    setup_compilation_cache()

    from paths_tpu.encoders.registry import from_name

    encode, dim, _ = from_name(args.model, weights_path=args.weights,
                               fast_math=args.fast_math,
                               block_impl=args.block_impl)

    mesh = None
    if args.data_shards:
        from paths_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.data_shards)

    store = FeatureStore(args.out, create=True,
                         save_format=args.store_format)
    slide_files = sorted(f for f in os.listdir(args.dir)
                         if f.endswith(args.ext))
    print(f"Preprocessing {len(slide_files)} slides "
          f"({args.model}, dim {dim}, powers {args.magnifications})")

    items = [(os.path.join(args.dir, fname),
              ".".join(fname.split(".")[:-1])) for fname in slide_files]
    # pipelined across slides: the producer thread decodes/stages slide
    # k+1's patches while the device encodes slide k
    process_slides(
        items, encode, dim, args.magnifications, store,
        patch_size=args.patch, tissue_threshold=args.tissue_threshold,
        downscale=args.downscale, batch_size=args.batch,
        threads=args.threads, mesh=mesh, default_power=args.default_power,
        decode_workers=args.decode_workers, load_mode=args.load_mode,
        store_dtype=args.store_dtype, verbose=args.verbose)


if __name__ == "__main__":
    main()
