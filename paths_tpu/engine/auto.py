"""`config.engine="auto"`: pick fused vs streaming from an HBM estimate.

The fused engine holds every level's collated feature tables in HBM —
fastest when they fit, an OOM when they don't. The streaming engine keeps
deeper tables host-side at ~2x the step time. The reference never faces
the choice (eager torch pages per-slide tensors; `dataset.py:206-243`),
but here the operator previously had to know whether their dataset's
padded tables exceed HBM. "auto" computes the answer from the same
`global_pads` scan the static-shape machinery already does:

  bytes(one collated batch at global pads)  x  RESIDENCY_FACTOR
      <=  HBM_FRACTION x device HBM  -  PARAM_RESERVE    ->  fused
  otherwise                                              ->  streaming

RESIDENCY_FACTOR covers what lives alongside one batch's tables during a
train step: the prefetched next batch (collation overlaps compute, so two
batches are resident at the handover), plus activation/gradient headroom
of the same order as the tables (the backward keeps each level's
attention activations; remat=False worst case). PARAM_RESERVE covers
params + AdamW state + compiled-program scratch — flagship-size models
are a few MB of params, so this is dominated by XLA scratch.

The estimate intentionally prices only what scales with the dataset
(tables/bags); everything else is the flat reserve. It errs toward
streaming near the boundary — crossing it the other way is an OOM mid-run.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from paths_tpu.config import Config

RESIDENCY_FACTOR = 3.0   # live batch + prefetched batch + bwd headroom
HBM_FRACTION = 0.85      # leave allocator slack; XLA fragments
PARAM_RESERVE = 512 << 20
DEFAULT_HBM = 16 << 30   # v5e when memory_stats is unavailable


def _round_up(n: int, m: int) -> int:
    return m * ((n + m - 1) // m)


def estimate_fused_batch_bytes(config: Config, pads: dict,
                               batch_size: int) -> int:
    """Bytes of ONE fused-engine collated batch at dataset-global pads.

    Mirrors `data.dataset.collate_batch`'s shapes exactly: level-0
    PatchBag (fts/locs/mask/ctx) + per-level LevelTables
    (fts/locs/index/count/grid_hw), with the same bucketing."""
    mc = config.model_config
    d = mc.patch_embed_dim
    item = np.dtype(config.table_dtype).itemsize
    b = batch_size

    n0 = _round_up(pads["n0"], config.level0_bucket)
    ds_dim, dp_dim = mc.ctx_dim()
    depth = config.num_levels  # ctx stacks grow to num_levels-1; bound
    total = b * n0 * (d * item        # bag0.fts
                      + 2 * 4 + 1     # locs + mask
                      + depth * dp_dim * item)   # ctx_patch (worst level)
    total += b * depth * ds_dim * item           # ctx_slide

    from paths_tpu.engine.tables import bag_widths
    widths = bag_widths(config.top_k_patches, config.num_levels, n0)
    for lvl in range(1, config.num_levels):
        rows = _round_up(max(widths[lvl], pads["rows"][lvl]), 256)
        h = _round_up(pads["grid_hw"][lvl][0], 16)
        w = _round_up(pads["grid_hw"][lvl][1], 16)
        total += b * rows * (d * item + 2 * 4)   # table fts + locs
        total += b * (h * w * 4 + 4 + 8)         # index + count + grid_hw
    return int(total)


def hbm_bytes(default: int = DEFAULT_HBM) -> int:
    """Per-device HBM capacity; `default` when the backend won't say
    (CPU, or PJRT plugins without memory_stats)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return default


def resolve_engine(config: Config, pads: Optional[dict], batch_size: int,
                   hbm: Optional[int] = None,
                   verbose: bool = True) -> str:
    """The engine `train_loop`/serving should use. Pass-through unless
    `config.engine == "auto"`; then fused iff the estimated batch
    residency fits the HBM budget. Logs the decision and the numbers it
    was made from."""
    if config.engine != "auto":
        return config.engine
    if pads is None:
        # no global-pads scan to price from (static_shapes off and the
        # caller didn't scan) — the conservative choice never OOMs
        if verbose:
            print("engine=auto: no shape bounds available -> streaming")
        return "streaming"
    hbm = hbm_bytes() if hbm is None else hbm
    batch = estimate_fused_batch_bytes(config, pads, batch_size)
    need = RESIDENCY_FACTOR * batch
    budget = HBM_FRACTION * hbm - PARAM_RESERVE
    choice = "fused" if need <= budget else "streaming"
    if verbose:
        print(f"engine=auto: batch tables ~{batch / 2**20:.0f} MB, "
              f"residency ~{need / 2**20:.0f} MB vs budget "
              f"{budget / 2**20:.0f} MB (HBM {hbm / 2**30:.1f} GiB) "
              f"-> {choice}")
    return choice
