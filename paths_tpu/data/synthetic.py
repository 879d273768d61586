"""Synthetic slide pyramids for tests, benchmarks, and dry runs.

Generates feature-store contents shaped like real preprocessed TCGA
slides: per-level H x W x D grids whose tissue region is a random blob,
background rows zeroed, children spatially correlated with parents (each
level doubles the grid, reference `preprocess/preprocess.py` geometry).
"""
from __future__ import annotations

import os
import zipfile
from typing import List, Optional, Sequence

import numpy as np

from paths_tpu.config import Config
from paths_tpu.data.feature_store import FeatureStore


def synthetic_grid(rng: np.random.Generator, h: int, w: int, d: int,
                   tissue_fraction: float = 0.5) -> np.ndarray:
    """Random feature grid with a contiguous-ish tissue blob."""
    g = rng.normal(size=(h, w, d)).astype(np.float32) * 0.5 + 0.2
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = rng.uniform(0.3, 0.7) * h, rng.uniform(0.3, 0.7) * w
    r2 = ((yy - cy) / h) ** 2 + ((xx - cx) / w) ** 2
    cutoff = np.quantile(r2, tissue_fraction)
    g[r2 > cutoff] = 0.0
    return g


def make_synthetic_store(root: str, config: Config, num_slides: int,
                         base_hw=(6, 8), seed: int = 0,
                         tissue_fraction: float = 0.5) -> List[str]:
    """Populate a FeatureStore with `num_slides` synthetic pyramids.
    Returns the slide ids."""
    store = FeatureStore(root, create=True)
    rng = np.random.default_rng(seed)
    d = config.model_config.patch_embed_dim
    ids = []
    for i in range(num_slides):
        sid = f"SYN-{i:04d}-01Z-00"
        ids.append(sid)
        h, w = base_hw
        h += int(rng.integers(0, 3))
        w += int(rng.integers(0, 3))
        for lvl, power in enumerate(config.power_levels()):
            grid = synthetic_grid(rng, h * 2**lvl, w * 2**lvl, d,
                                  tissue_fraction)
            store.save(sid, power, grid)
    return ids


def make_synthetic_metadata(csv_path: str, slide_ids: Sequence[str],
                            seed: int = 0,
                            subtypes: Optional[Sequence[str]] = None) -> None:
    """Write a reference-format metadata CSV (zip-compressed when the path
    ends in .zip): case_id, slide_id, survival_months, censorship,
    oncotree_code."""
    rng = np.random.default_rng(seed)
    rows = ["case_id,slide_id,survival_months,censorship,oncotree_code"]
    for i, sid in enumerate(slide_ids):
        months = float(rng.uniform(1.0, 120.0))
        censor = int(rng.integers(0, 2))
        code = (subtypes[i % len(subtypes)] if subtypes else "IDC")
        rows.append(f"CASE-{i:04d},{sid}.svs,{months:.2f},{censor},{code}")
    data = "\n".join(rows) + "\n"

    if csv_path.endswith(".zip"):
        inner = os.path.basename(csv_path)[:-4]
        with zipfile.ZipFile(csv_path, "w") as z:
            z.writestr(inner, data)
    else:
        with open(csv_path, "w") as f:
            f.write(data)
