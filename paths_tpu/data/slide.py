"""SlidePyramid: one slide's multi-level preprocessed features, ready for
the hierarchy engine.

Train-time counterpart of the reference's `PreprocessedSlide`
(`data_utils/slide.py:227-391`), reshaped for TPU: instead of keeping
dense grids and gathering children per slide on the host, each level > 0
is pre-compacted into a `LevelTable` dict (non-background rows + index
grid — see `paths_tpu.engine.tables`), and level 0 is the full cell bag
(background included, matching `slide.py:258-269`).
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from paths_tpu.data.feature_store import FeatureStore
from paths_tpu.engine.tables import build_level_table, level0_bag_arrays


def slide_id_of(path: str) -> str:
    """Filename minus extension (reference `slide.py:241`)."""
    return ".".join(os.path.split(path)[-1].split(".")[:-1])


class SlidePyramid:
    def __init__(self, slide_id: str, store: FeatureStore, base_power: float,
                 num_levels: int, patch_size: int,
                 level_min_rows: Optional[List[int]] = None,
                 magnification_factor: int = 2, preload: bool = True,
                 subtype: Optional[int] = None):
        """:param level_min_rows: minimum table rows per level (from
        `engine.tables.bag_widths`); rows up to this bound include
        background cells so the all-background fallback can address them.
        :param preload: build tables eagerly (reference preloads all
        features to RAM, `data_utils/dataset.py:172-180`); False = lazy,
        tables built from memory-mapped grids on first access."""
        self.slide_id = slide_id
        self.store = store
        self.base_power = base_power
        self.num_levels = num_levels
        self.patch_size = patch_size
        self.magnification_factor = magnification_factor
        self.level_min_rows = level_min_rows or [0] * num_levels
        self.subtype = subtype
        self._level0 = None
        self._tables: Optional[List[dict]] = None
        if preload:
            self.materialize()

    def powers(self) -> List[float]:
        return [self.base_power * self.magnification_factor**i
                for i in range(self.num_levels)]

    def materialize(self) -> None:
        if self._tables is not None:
            return
        powers = self.powers()
        self._materialize_level0()
        tables = []
        for lvl in range(1, self.num_levels):
            # keep the STORAGE dtype: f16 stores build f16 tables (half
            # host RAM and half the bytes on the wire — stack_tables and
            # the streaming engine upcast to table_dtype ON DEVICE);
            # reference .pt grids arrive f32 as before. asarray, not
            # array: the store hands back a read-only memmap and a copy
            # here would turn every grid into resident RAM instead of
            # evictable page cache (the table builders only gather rows)
            grid = np.asarray(self.store.load(self.slide_id, powers[lvl]))
            # a table can never need more fallback rows than it has grid
            # cells (keep-all configs would otherwise request 4^depth * n0)
            min_rows = min(self.level_min_rows[lvl],
                           grid.shape[0] * grid.shape[1])
            tables.append(build_level_table(grid, min_rows=min_rows))
        self._tables = tables

    def _materialize_level0(self) -> None:
        if self._level0 is None:
            grid0 = np.asarray(self.store.load(self.slide_id, self.powers()[0]))
            self._level0 = level0_bag_arrays(grid0, self.patch_size)

    @property
    def level0(self):
        """(fts (N0, D), locs_pixels (N0, 2), n0). Materializes only the
        level-0 grid — the streaming engine reads deeper levels lazily."""
        self._materialize_level0()
        return self._level0

    @property
    def tables(self) -> List[dict]:
        """Level tables for levels 1..num_levels-1."""
        self.materialize()
        return self._tables

    def unload(self) -> None:
        self._level0 = None
        self._tables = None
