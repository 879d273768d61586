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


if __name__ == "__main__":
    path = build()
    print(f"Built {path}")
    sys.path.insert(0, os.path.dirname(os.path.dirname(SRC_DIR)))
    from paths_tpu import native

    lib = native.load()
    print(f"Loaded OK; OpenMP threads: {lib.omp_thread_count()}")
