"""Build the native host library: python -m paths_tpu.native.build"""
from __future__ import annotations

import os
import subprocess
import sys

SRC_DIR = os.path.dirname(os.path.abspath(__file__))


def build(verbose: bool = True) -> str:
    src = os.path.join(SRC_DIR, "tablebuild.cpp")
    out = os.path.join(SRC_DIR, "libpaths_host.so")
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-std=c++17", src, "-o", out]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


def build_jpeg(verbose: bool = True) -> str | None:
    """Build the batched JPEG decoder. Separate .so so hosts without
    libjpeg dev files still get the table kernels; returns None when the
    toolchain can't link -ljpeg."""
    src = os.path.join(SRC_DIR, "jpegdec.cpp")
    out = os.path.join(SRC_DIR, "libpaths_jpeg.so")
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-std=c++17", src, "-o", out, "-ljpeg"]
    if verbose:
        print(" ".join(cmd))
    try:
        subprocess.run(cmd, check=True)
    except subprocess.CalledProcessError:
        # stderr: bench.py's stdout must stay a single JSON line
        print("libpaths_jpeg.so skipped (libjpeg dev files not found); "
              "tile decode falls back to PIL", file=sys.stderr)
        return None
    return out


if __name__ == "__main__":
    path = build()
    print(f"Built {path}")
    jpath = build_jpeg()
    sys.path.insert(0, os.path.dirname(os.path.dirname(SRC_DIR)))
    from paths_tpu import native
    from paths_tpu.native import jpeg as njpeg

    lib = native.load()
    print(f"Loaded OK; OpenMP threads: {lib.omp_thread_count()}")
    if jpath:
        jlib = njpeg.load()
        print(f"Built {jpath}; decode threads: "
              f"{jlib.jpeg_omp_thread_count()}")
