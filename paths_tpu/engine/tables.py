"""Compact per-level feature tables.

The reference stores each level as a dense H x W x D grid with all-zero
rows marking background (`preprocess/preprocess.py:172-175`) and gathers
children from it on the host per slide (`data_utils/slide.py:305-331`).

On TPU the grid is mostly dead weight: tissue typically covers a fraction
of the slide. A `LevelTable` stores only the non-background feature rows
plus an int32 index grid mapping (y, x) -> row (-1 = background), so the
device-side child gather is two cheap lookups and HBM holds ~tissue-sized
data rather than slide-sized.

Row order is grid row-major over non-background cells, then row-major over
background cells — exactly the enumeration order the reference uses for
its all-background fallback bags (`data_utils/slide.py:334-352`), so the
fallback path can address rows directly.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LevelTable:
    """Batched compact features for one magnification level.

    fts     (B, M, D)   non-bg features first, zero rows after `count`
    locs    (B, M, 2)   grid coords (y, x) of each row
    count   (B,)        number of non-background rows per slide
    index   (B, H, W)   grid -> row, -1 where background or out of grid
    grid_hw (B, 2)      true (unpadded) grid dims per slide
    """

    fts: jnp.ndarray
    locs: jnp.ndarray
    count: jnp.ndarray
    index: jnp.ndarray
    grid_hw: jnp.ndarray


def build_level_table(grid: np.ndarray, min_rows: int = 0):
    """Host-side: dense (H, W, D) grid -> single-slide table dict (numpy).

    Background = all-zero feature vector, tested as sum == 0 to match the
    reference's filter (`data_utils/slide.py:325`). Dispatches to the
    OpenMP C++ kernel (`paths_tpu/native`) when built.
    """
    from paths_tpu import native

    if native.available():
        out = native.build_level_table_native(grid, min_rows)
        if out is not None:
            return out

    h, w, d = grid.shape
    flat = grid.reshape(-1, d)
    if flat.dtype == np.float16:
        # f16 stores: "background" = the all-zero rows the preprocessor
        # writes. A signed f16 row-sum could underflow a live row to
        # exact 0 (accumulation happens at the storage dtype), so test
        # entries directly — identical to sum==0 on real stores, where
        # background rows are exactly zero.
        bg = ~np.any(flat != 0, axis=1)
    else:
        bg = flat.sum(axis=1) == 0  # reference semantics (slide.py:320-329)
    nz = np.flatnonzero(~bg)           # row-major order
    z = np.flatnonzero(bg)
    count = len(nz)

    m = max(count + min(len(z), max(min_rows - count, 0)), min_rows)
    m = max(m, count)
    order = np.concatenate([nz, z])[:m]

    fts = np.zeros((m, d), grid.dtype)
    locs = np.zeros((m, 2), np.int32)
    take = order
    fts[: len(take)] = flat[take]
    locs[: len(take), 0] = take // w
    locs[: len(take), 1] = take % w

    index = np.full((h, w), -1, np.int32)
    index.reshape(-1)[nz] = np.arange(count, dtype=np.int32)

    return {"fts": fts, "locs": locs, "count": np.int32(count),
            "index": index, "grid_hw": np.array([h, w], np.int32)}


_warned_mixed_dtypes: set = set()


def host_stack_dtype(dtypes: Sequence[np.dtype]) -> np.dtype:
    """Dtype a batch of host feature arrays stacks at: the widest input
    (deterministic regardless of batch order; a resumed preprocess run
    with a changed --store-dtype can legally mix f16 and f32 grids).

    The mixed-dtype warning fires once per process per dtype pair and is
    attributed to the collation/lookup CALL SITE (stacklevel=2) — the
    streaming engine calls this every level of every batch, so repeating
    it would drown the signal (ADVICE r4)."""
    uniq = {np.dtype(d) for d in dtypes}
    if len(uniq) > 1:
        key = tuple(sorted(map(str, uniq)))
        if key not in _warned_mixed_dtypes:
            _warned_mixed_dtypes.add(key)
            import warnings

            warnings.warn(
                f"feature batch mixes storage dtypes "
                f"{sorted(map(str, uniq))}; stacking at the widest. "
                "Re-preprocess with one --store-dtype to reclaim the f16 "
                "wire/RAM savings.", stacklevel=2)
    return max(uniq, key=lambda d: d.itemsize)


def wire_dtype(host_dtype, target_dtype) -> np.dtype:
    """Dtype feature arrays should cross the host->device link at: the
    NARROWER of the storage dtype and the requested table dtype. An f16
    store with f32 tables ships f16 and upcasts on device; an f32 store
    with bf16 tables downcasts host-side rather than shipping double
    bytes. (numpy handles bf16 via ml_dtypes, which jax registers.)"""
    host_dtype = np.dtype(host_dtype)
    if target_dtype is None:
        return host_dtype
    target = np.dtype(target_dtype)
    return target if target.itemsize < host_dtype.itemsize else host_dtype


def ship_at_wire_dtype(lk: dict, table_dtype, put) -> dict:
    """Place a host lookup dict on device with its feature array crossing
    the link at `wire_dtype(storage, table_dtype)` and arriving at
    `table_dtype`. The host-side downcast and the device-side upcast are
    ONE paired dtype decision (ADVICE r4: encoding it in two places a few
    lines apart invites silent divergence). `put` maps the whole dict to
    device arrays (plain `jnp.asarray` or a sharded `jax.device_put`)."""
    want = jnp.dtype(table_dtype)
    wd = wire_dtype(lk["fts"].dtype, want)
    if lk["fts"].dtype != wd:
        lk = {**lk, "fts": lk["fts"].astype(wd)}
    dev = put(lk)
    if dev["fts"].dtype != want:
        dev = {**dev, "fts": dev["fts"].astype(want)}
    return dev


def stack_tables(tables: Sequence[dict], min_rows: int = 0,
                 pad_rows_to: int | None = None,
                 pad_grid_to: tuple | None = None,
                 dtype=None, put=None) -> LevelTable:
    """Pad single-slide tables to common shapes and stack into a LevelTable.

    :param dtype: optional feature dtype (e.g. jnp.bfloat16 halves HBM and
    host->device traffic for the dominant arrays; background/validity is
    decided host-side in f32 so masking semantics are unaffected). The
    host copy crosses the wire at `wire_dtype` and is cast to `dtype` on
    device, so the link always carries the narrower representation.
    :param put: host->device placement for the stacked arrays (default
    `jnp.asarray`). Multi-chip callers pass a sharded `jax.device_put`
    so each chip's slice crosses its own link instead of landing whole
    on one device and being resharded over ICI."""
    b = len(tables)
    m = max(max(t["fts"].shape[0] for t in tables), min_rows)
    if pad_rows_to is not None:
        m = max(m, pad_rows_to)
    h = max(t["index"].shape[0] for t in tables)
    w = max(t["index"].shape[1] for t in tables)
    if pad_grid_to is not None:
        h, w = max(h, pad_grid_to[0]), max(w, pad_grid_to[1])
    d = tables[0]["fts"].shape[1]

    host_dt = host_stack_dtype([t["fts"].dtype for t in tables])
    fts = np.zeros((b, m, d), wire_dtype(host_dt, dtype))
    locs = np.zeros((b, m, 2), np.int32)
    count = np.zeros((b,), np.int32)
    index = np.full((b, h, w), -1, np.int32)
    grid_hw = np.zeros((b, 2), np.int32)
    for i, t in enumerate(tables):
        mi = t["fts"].shape[0]
        hi, wi = t["index"].shape
        fts[i, :mi] = t["fts"]
        locs[i, :mi] = t["locs"]
        count[i] = t["count"]
        index[i, :hi, :wi] = t["index"]
        grid_hw[i] = t["grid_hw"]

    put = jnp.asarray if put is None else put
    fts_j = put(fts)
    if dtype is not None:
        fts_j = fts_j.astype(dtype)
    return LevelTable(fts=fts_j, locs=put(locs),
                      count=put(count), index=put(index),
                      grid_hw=put(grid_hw))


def bag_widths(top_k_patches, num_levels: int, n0: int):
    """Static patch-slot counts per level: level 0 has `n0` slots; level
    i+1 has 4*K_i (or 4*width_i when K_i = -1, the keep-all mode)."""
    widths = [n0]
    for i in range(num_levels - 1):
        k = top_k_patches[i]
        prev = widths[-1]
        widths.append(4 * (prev if k == -1 else min(k, prev)))
    return widths


def level0_bag_arrays(grid: np.ndarray, patch_size: int):
    """Host-side: level-0 bag arrays for ONE slide from its dense grid.

    The reference's level-0 bag is ALL grid cells — background included,
    with zero features (`data_utils/slide.py:258-269`; the in-code comment
    claims filtering but none happens). Returns (fts, locs_pixels, n).

    Deliberately numpy-only: `fts` is a zero-copy reshape VIEW of the
    grid, so memmapped stores stay evictable page cache instead of
    resident RAM (a native kernel here could only memcpy — strictly
    worse; the C path exists for `build_level_table`, where real
    scan/compact work amortizes it).
    """
    h, w, d = grid.shape
    fts = grid.reshape(-1, d)
    ys, xs = np.divmod(np.arange(h * w, dtype=np.int32), w)
    locs = np.stack([ys, xs], axis=1) * patch_size
    return fts, locs, h * w
