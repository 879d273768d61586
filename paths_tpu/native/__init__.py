"""ctypes bindings for the native host kernels (tablebuild.cpp).

`load()` returns the shared library handle or None when it isn't built;
callers (engine/tables.py) fall back to numpy. Build with:

    python -m paths_tpu.native.build
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libpaths_host.so")
_lib = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64, i32p, f32p, u8p = (ctypes.c_int64,
                            np.ctypeslib.ndpointer(np.int32, flags="C"),
                            np.ctypeslib.ndpointer(np.float32, flags="C"),
                            np.ctypeslib.ndpointer(np.uint8, flags="C"))
    lib.build_level_table.restype = ctypes.c_int64
    lib.build_level_table.argtypes = [f32p, i64, i64, i64, f32p, i32p, i32p, i64]
    lib.scan_background.restype = ctypes.c_int64
    lib.scan_background.argtypes = [f32p, i64, i64, u8p]
    lib.omp_thread_count.restype = ctypes.c_int
    lib.omp_thread_count.argtypes = []
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def build_level_table_native(grid: np.ndarray, min_rows: int = 0) -> Optional[dict]:
    """Native equivalent of `engine.tables.build_level_table`; None when
    the library isn't built."""
    lib = load()
    if lib is None or grid.dtype != np.float32:
        # non-f32 grids (float16 stores) take the numpy path: the C
        # kernels are f32-only, and an ascontiguousarray upcast here
        # would silently widen the table dtype downstream (stack_tables
        # ships the HOST dtype — upcasting defeats the f16 wire savings)
        return None
    grid = np.ascontiguousarray(grid, np.float32)
    h, w, d = grid.shape
    cells = h * w

    # exact m: count + bg fill up to min_rows (mirror the numpy sizing)
    bg = np.empty(cells, np.uint8)
    count = int(lib.scan_background(grid.reshape(-1, d), cells, d, bg))
    n_bg = cells - count
    m = max(count + min(n_bg, max(min_rows - count, 0)), min_rows, count)

    fts = np.zeros((m, d), np.float32)
    locs = np.zeros((m, 2), np.int32)
    index = np.empty((h, w), np.int32)
    lib.build_level_table(grid.reshape(-1, d), h, w, d,
                          fts, locs, index.reshape(-1), m)
    return {"fts": fts, "locs": locs, "count": np.int32(count),
            "index": index, "grid_hw": np.array([h, w], np.int32)}


# NOTE: there is intentionally no level0_bag binding — the numpy path in
# engine.tables.level0_bag_arrays returns a zero-copy view of the
# (memmapped) grid, which a native memcpy can only make worse (ADVICE r4:
# the copy turned read-only page cache into resident host RAM).
