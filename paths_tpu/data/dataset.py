"""Dataset assembly: metadata CSV -> splits -> device-ready batches.

Mirrors the reference's `data_utils/dataset.py` semantics:
  * metadata rows lacking a preprocessed file are dropped (`dataset.py:29-39`)
  * one slide per patient via case_id dedup — deterministic (`dataset.py:46`)
  * survival months quantile-binned over the FULL frame before splitting
    (`dataset.py:53`), then applied per split with `pd.cut`
  * HIPT cross-validation split CSVs (survival: case_id pairs, 5-fold;
    subtype: slide_id triples + ".svs", 10-fold) or random proportional
    splits with the same pandas sampling calls (`dataset.py:71-122`)

TPU-shaped differences: batches collate into a statically-shaped
`PatchBag` + per-level `LevelTable`s (bucketed padding bounds recompiles)
instead of dynamic-length padded tensors, and slide preload uses a thread
pool (numpy mmap reads release the GIL) instead of a process pool.
"""
from __future__ import annotations

import csv
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd

from paths_tpu.config import Config
from paths_tpu.data.feature_store import FeatureStore
from paths_tpu.data.slide import SlidePyramid
from paths_tpu.engine.tables import (
    bag_widths,
    host_stack_dtype,
    stack_tables,
    wire_dtype,
)
from paths_tpu.models.batch import PatchBag

MAX_WORKERS = 8


def _round_up(n: int, m: int) -> int:
    return m * ((n + m - 1) // m)


def load_metadata(config: Config, store: FeatureStore) -> Tuple[pd.DataFrame, np.ndarray]:
    """Read + prune the metadata CSV; returns (frame, survival bin edges)."""
    compression = "zip" if config.csv_path.endswith(".zip") else "infer"
    frame = pd.read_csv(config.csv_path, compression=compression)

    keep = []
    for i in range(len(frame)):
        slide_id = frame.iloc[i].slide_id
        x = ".".join(str(slide_id).split(".")[:-1])
        keep.append(store.exists(x, config.base_power))
    n_drop = len(frame) - sum(keep)
    if n_drop:
        print(f"Ignoring {n_drop} rows without files.")
    frame = frame[np.asarray(keep, bool)]

    frame = frame.drop_duplicates(subset="case_id")
    frame = frame.reset_index(drop=True)
    frame = frame[["case_id", "slide_id", "survival_months", "censorship",
                   "oncotree_code"]]

    _, bins = pd.qcut(frame.survival_months, config.nbins, labels=False,
                      retbins=True)
    return frame, np.asarray(bins)


def _read_hipt_split(path: str, task: str):
    with open(path, "r") as f:
        r = csv.reader(f)
        next(r)
        data = [row[1:] for row in r]
    if task == "subtype_classification":
        train = [a + ".svs" for a, b, c in data]
        val = [b + ".svs" for a, b, c in data if len(b) > 0]
        test = [c + ".svs" for a, b, c in data if len(c) > 0]
        return train, val, test, "slide_id"
    train = [a for a, b in data]
    test = [b for a, b in data if len(b) > 0]
    return train, None, test, "case_id"


def load_splits(props: Sequence[float], seed: int, config: Config,
                store: Optional[FeatureStore] = None, test_only: bool = False,
                combined: bool = False, preload: bool = True):
    """Train/val/test SlideDatasets (reference `load_splits`,
    `dataset.py:21-136`). `props` is the random-split proportion triple,
    unused when `config.hipt_splits`."""
    train_prop, val_prop, test_prop = props
    assert abs(train_prop + val_prop + test_prop - 1) < 1e-4

    store = store or FeatureStore(config.preprocess_dir)
    frame, bins = load_metadata(config, store)

    if combined:
        return SlideDataset(frame, bins, config, store, preload=preload)

    if config.filter_to_subtypes is not None:
        frame = frame[frame["oncotree_code"].isin(config.filter_to_subtypes)]

    if config.hipt_splits:
        ds_name = os.path.split(config.wsi_dir)[-1].lower()
        sub = ("survival" if config.task == "survival"
               else "subtype_classification")
        splits_dir = getattr(config, "splits_dir", None) or "data/splits"
        path = os.path.join(splits_dir, sub, f"tcga_{ds_name}",
                            f"splits_{seed}.csv")
        assert os.path.isfile(path), f"HIPT split file not found: {path}"
        train_p, val_p, test_p, match_on = _read_hipt_split(path, config.task)

        if config.task == "survival" and config.hipt_val_proportion > 0:
            val_size = int(len(train_p) * config.hipt_val_proportion)
            val_p, train_p = train_p[:val_size], train_p[val_size:]

        train = frame[frame[match_on].isin(train_p)]
        val = frame[frame[match_on].isin(val_p)] if val_p else None
        test = frame[frame[match_on].isin(test_p)]
    else:
        train_c = int(train_prop * len(frame))
        val_c = int(val_prop * len(frame))
        train = frame.sample(train_c, random_state=seed)
        val = frame.drop(train.index).sample(val_c, random_state=seed)
        test = frame.drop(train.index).drop(val.index)

    if test_only:
        return SlideDataset(test.reset_index(drop=True), bins, config, store,
                            preload=preload)

    out = []
    for f in [train, val, test]:
        if f is None:
            out.append(None)
        else:
            out.append(SlideDataset(f.reset_index(drop=True), bins, config,
                                    store, preload=preload))
    return out


class SlideDataset:
    """Slides + labels for one split (reference `SlideDataset`,
    `dataset.py:139-203`)."""

    def __init__(self, frame: pd.DataFrame, bins, config: Config,
                 store: FeatureStore, preload: bool = True,
                 cache_slides: Optional[bool] = None):
        """:param preload: materialize every slide's tables up front (the
        reference's RAM-resident strategy, `dataset.py:172-180`)
        :param cache_slides: keep materialized tables after a batch is
        collated. Defaults to `preload`; set False for datasets larger
        than host RAM — tables rebuild from the memory-mapped store per
        batch (the native C++ builder makes this cheap)."""
        self.config = config
        self.frame = frame
        self.bins = bins
        self.cache_slides = preload if cache_slides is None else cache_slides
        mc = config.model_config

        self.q_survival_months = np.asarray(pd.cut(
            frame.survival_months, bins, labels=False, include_lowest=True))
        self.survival_months = np.asarray(frame.survival_months, np.float32)
        self.censorship = np.asarray(frame.censorship, np.int64)
        self.slide_ids = [".".join(str(s).split(".")[:-1])
                          for s in frame.slide_id]

        if config.task == "subtype_classification":
            self.subtype = np.asarray(
                [config.filter_to_subtypes.index(c)
                 for c in frame.oncotree_code], np.int64)
        else:
            self.subtype = None

        # table row bounds for levels >= 1 are n0-independent when K != -1
        widths = bag_widths(config.top_k_patches, config.num_levels, 10**9)
        self.level_min_rows = [0] + widths[1:]

        self.slides = [SlidePyramid(
            sid, store, config.base_power, config.num_levels, mc.patch_size,
            level_min_rows=self.level_min_rows,
            magnification_factor=config.magnification_factor, preload=False,
            subtype=None if self.subtype is None else int(self.subtype[i]))
            for i, sid in enumerate(self.slide_ids)]

        if preload:
            with ThreadPoolExecutor(min(MAX_WORKERS, os.cpu_count() or 1)) as ex:
                list(ex.map(lambda s: s.materialize(), self.slides))

    def __len__(self) -> int:
        return len(self.slides)

    def global_pads(self, level0_only: bool = False) -> dict:
        """Dataset-wide shape maxima: level-0 bag width, per-level table
        rows and grid dims. Collating every batch to these bounds the
        whole run to ONE compiled shape per program (first compiles of the
        full train step are minutes through a remote-compile tunnel, and
        per-batch maxima under shuffle would produce dozens of distinct
        shapes — the reference pads per batch, `dataset.py:206-243`, but
        eager torch doesn't recompile). One pass over the slides; lazy
        datasets materialize + unload each.

        :param level0_only: scan only the level-0 bag widths (what the
            streaming engine pads — its deeper tables stay host-side), so
            the pass touches one grid per slide instead of all levels."""
        if getattr(self, "_global_pads", None) is not None:
            return self._global_pads
        if level0_only and getattr(self, "_global_pads_l0", None) is not None:
            return self._global_pads_l0
        n0 = 0
        rows = [0] * self.config.num_levels
        grid_hw = [(0, 0)] * self.config.num_levels
        for s in self.slides:
            was_loaded = s._tables is not None
            n0 = max(n0, s.level0[2])
            if not level0_only:
                for lvl, t in enumerate(s.tables, start=1):
                    rows[lvl] = max(rows[lvl], t["fts"].shape[0])
                    grid_hw[lvl] = (max(grid_hw[lvl][0], t["index"].shape[0]),
                                    max(grid_hw[lvl][1], t["index"].shape[1]))
            if not (self.cache_slides or was_loaded):
                s.unload()
        pads = {"n0": n0, "rows": rows, "grid_hw": grid_hw}
        if level0_only:
            self._global_pads_l0 = pads
        else:
            self._global_pads = pads
        return pads



    def labels(self, indices: Sequence[int]) -> dict:
        idx = np.asarray(indices)
        out = {
            "survival_bin": self.q_survival_months[idx].astype(np.int32),
            "survival": self.survival_months[idx],
            "censored": self.censorship[idx].astype(np.int32),
        }
        if self.subtype is not None:
            out["subtype"] = self.subtype[idx].astype(np.int32)
        return out


def union_pads(*pads: Optional[dict]) -> Optional[dict]:
    """Elementwise max of `global_pads` dicts (so train/val/test share one
    compiled shape per program)."""
    pads = [p for p in pads if p is not None]
    if not pads:
        return None
    out = {"n0": max(p["n0"] for p in pads),
           "rows": [max(p["rows"][i] for p in pads)
                    for i in range(len(pads[0]["rows"]))],
           "grid_hw": [tuple(max(p["grid_hw"][i][j] for p in pads)
                             for j in range(2))
                       for i in range(len(pads[0]["grid_hw"]))]}
    return out


def collate_batch(dataset: SlideDataset, indices: Sequence[int],
                  level0_bucket: int = 256, row_bucket: int = 256,
                  grid_bucket: int = 16, dtype=None,
                  pads: Optional[dict] = None, put=None):
    """Collate slides into (PatchBag, [LevelTable], labels).

    Static-shape bucketing: the level-0 width is the batch max rounded up
    to `level0_bucket`; table rows/grid dims round to `row_bucket` /
    `grid_bucket`. Rounding bounds the number of distinct compiled shapes
    (the TPU analogue of the reference's per-batch dynamic padding).

    Passing `pads` (a `SlideDataset.global_pads()` dict) replaces batch
    maxima with dataset-wide maxima, so every batch of a run shares ONE
    compiled shape per program.
    """
    cfg = dataset.config
    mc = cfg.model_config
    if dtype is None:
        dtype = jnp.dtype(cfg.table_dtype)
    slides = [dataset.slides[i] for i in indices]

    bag0 = collate_bag0(dataset, indices, level0_bucket=level0_bucket,
                        dtype=dtype, pads=pads, put=put)
    b, n0 = bag0.mask.shape

    widths = bag_widths(cfg.top_k_patches, cfg.num_levels, n0)
    tables = []
    for lvl in range(1, cfg.num_levels):
        per = [s.tables[lvl - 1] for s in slides]
        max_rows = max(t["fts"].shape[0] for t in per)
        max_h = max(t["index"].shape[0] for t in per)
        max_w = max(t["index"].shape[1] for t in per)
        if pads is not None:
            max_rows = max(max_rows, pads["rows"][lvl])
            max_h = max(max_h, pads["grid_hw"][lvl][0])
            max_w = max(max_w, pads["grid_hw"][lvl][1])
        rows = _round_up(max(widths[lvl], max_rows), row_bucket)
        h = _round_up(max_h, grid_bucket)
        w = _round_up(max_w, grid_bucket)
        tables.append(stack_tables(per, min_rows=widths[lvl],
                                   pad_rows_to=rows, pad_grid_to=(h, w),
                                   dtype=dtype, put=put))

    labels = {k: jnp.asarray(v) for k, v in dataset.labels(indices).items()}
    if not dataset.cache_slides:
        for s in slides:
            s.unload()
    return bag0, tables, labels


def collate_bag0(dataset: SlideDataset, indices: Sequence[int],
                 level0_bucket: int = 256, dtype=None,
                 pads: Optional[dict] = None, put=None) -> PatchBag:
    """Collate only the level-0 bag (used by the streaming engine, which
    keeps the deeper levels' tables on the host).

    `put` places the big host arrays on device (default `jnp.asarray`);
    multi-chip callers pass a sharded `jax.device_put` so each chip's
    slice crosses its own host->device link."""
    cfg = dataset.config
    mc = cfg.model_config
    if dtype is None:
        dtype = jnp.dtype(cfg.table_dtype)
    slides = [dataset.slides[i] for i in indices]
    b = len(slides)
    ds_dim, dp_dim = mc.ctx_dim()

    l0 = [s.level0 for s in slides]
    max_n0 = max(x[2] for x in l0)
    if pads is not None:
        max_n0 = max(max_n0, pads["n0"])
    n0 = _round_up(max_n0, level0_bucket)
    # ship the level-0 features at the narrower of storage/table dtype and
    # finish the cast on device — an f16 store's bag crosses the wire at
    # half width, same contract as stack_tables (engine/tables.py)
    host_dt = host_stack_dtype([f.dtype for f, _, _ in l0])
    fts0 = np.zeros((b, n0, mc.patch_embed_dim), wire_dtype(host_dt, dtype))
    locs0 = np.zeros((b, n0, 2), np.int32)
    mask0 = np.zeros((b, n0), bool)
    for i, (f, l, n) in enumerate(l0):
        fts0[i, :n] = f
        locs0[i, :n] = l
        mask0[i, :n] = True

    put = (lambda a: jnp.asarray(a)) if put is None else put
    return PatchBag(
        fts=put(fts0).astype(dtype), locs=put(locs0),
        mask=put(mask0),
        parent_inds=jnp.broadcast_to(
            jnp.arange(n0, dtype=jnp.int32)[None], (b, n0)),
        ctx_slide=jnp.zeros((b, 0, ds_dim), dtype),
        ctx_patch=jnp.zeros((b, n0, 0, dp_dim), dtype))


def iterate_batches(dataset: SlideDataset, batch_size: int, *,
                    shuffle: bool = False, seed: int = 0,
                    level0_bucket: int = 256, pads: Optional[dict] = None):
    """Yield collated batches; shuffling is seeded per epoch."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for s in range(0, len(order), batch_size):
        idx = order[s: s + batch_size]
        yield collate_batch(dataset, idx, level0_bucket=level0_bucket,
                            pads=pads)
