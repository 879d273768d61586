"""Streaming (two-pass) execution: hierarchical training for datasets whose
feature tables exceed device HBM.

The fused engine (`hierarchy.py`) holds every level's `LevelTable` in HBM
for the whole batch. At higher base powers or deeper hierarchies the
tables outgrow a chip, while the *selected* bags stay tiny (4K patches per
level). This engine keeps tables on the host (memory-mapped via the
feature store) and moves only what the recursion actually touches:

  pass 1 (selection): per level, the jitted forward + `select_children`
      run on device; the child coordinates (a few KB) come to the host;
      the host gathers child features from the slide tables
      (`lookup_host`, numpy mirror of `lookup_device`); the gathered bag
      (4K x D) goes back to the device. This is the reference's own data
      flow (`utils.py:240-258`) minus the per-slide Python loop.
  pass 2 (gradient): one jitted replay over the recorded lookups —
      identical math to pass 1 (same params, same rng), so the top-K
      selections recompute identically and gradients flow through the
      kept patches' context exactly as in the fused engine.

Equivalence with the fused engine is tested to float tolerance
(tests/test_streaming.py), gradients included.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from paths_tpu.config import Config
from paths_tpu.engine.hierarchy import finish_step, select_children, task_loss
from paths_tpu.engine.tables import host_stack_dtype, ship_at_wire_dtype
from paths_tpu.models.batch import PatchBag
from paths_tpu.models.recursive import recursive_apply

# Per-slide gathers are independent numpy fancy-indexing jobs over mmapped
# tables (GIL-releasing); one shared pool overlaps them with each other and
# with in-flight device compute.
_GATHER_POOL: Optional[ThreadPoolExecutor] = None


def _gather_pool() -> ThreadPoolExecutor:
    global _GATHER_POOL
    if _GATHER_POOL is None:
        _GATHER_POOL = ThreadPoolExecutor(max_workers=8)
    return _GATHER_POOL


def lookup_host(child_locs: np.ndarray, child_kvalid: np.ndarray,
                host_tables: Sequence[dict]) -> dict:
    """Numpy mirror of `hierarchy.lookup_device` over per-slide table
    dicts (as produced by `build_level_table`)."""
    b, s, _ = child_locs.shape
    d = host_tables[0]["fts"].shape[1]
    fts = np.zeros((b, s, d),
                   host_stack_dtype([t["fts"].dtype for t in host_tables]))
    mask = np.zeros((b, s), bool)
    locs = np.zeros((b, s, 2), np.int32)
    parent = np.zeros((b, s), np.int32)
    use_fb = np.zeros((b,), bool)
    base_parent = np.tile(np.arange(s // 4, dtype=np.int32), 4)

    def gather_slide(j: int, t: dict) -> None:
        y, x = child_locs[j, :, 0], child_locs[j, :, 1]
        gh, gw = int(t["grid_hw"][0]), int(t["grid_hw"][1])
        inb = (y >= 0) & (y < gh) & (x >= 0) & (x < gw)
        yc = np.clip(y, 0, t["index"].shape[0] - 1)
        xc = np.clip(x, 0, t["index"].shape[1] - 1)
        rows = t["index"][yc, xc]
        valid = child_kvalid[j] & inb & (rows >= 0)

        if valid.any():
            rows_safe = np.where(valid, rows, 0)
            fts[j] = t["fts"][rows_safe] * valid[:, None]
            mask[j] = valid
            locs[j] = child_locs[j]
            parent[j] = base_parent
        else:
            use_fb[j] = True
            count = int(t["count"])
            fb_n = min(count if count > 0 else gh * gw, s)
            m = t["fts"].shape[0]
            take = min(s, m)
            fts[j, :take] = t["fts"][:take]
            locs[j, :take] = t["locs"][:take]
            mask[j] = np.arange(s) < fb_n
            fts[j] = fts[j] * mask[j][:, None]
            parent[j] = np.arange(s, dtype=np.int32)

    # slides write disjoint rows; futures propagate worker exceptions
    list(_gather_pool().map(gather_slide, range(b), host_tables))
    return {"mask": mask, "fts": fts, "locs": locs, "parent": parent,
            "use_fallback": use_fb}


class StreamingEngine:
    """Two-pass streaming executor bound to a config.

    With a multi-device `mesh`, gathered bags and recorded lookups are
    placed sharded along the `data` axis; params stay replicated, so XLA
    inserts the gradient all-reduce in the replay pass exactly as in the
    fused engine's train step.

    A 2-D (data x model) mesh adds sequence parallelism: the level-0
    bag arrives with its patch axis sharded along `model`
    (`shard_bag_patches`), and the model's attention is threaded a
    `SeqSharding` so oversize bags route to the sequence-parallel flash
    kernels (gathered-KV or ring, per `config.seq_attention`) — the
    streaming counterpart of the fused engine's `make_step_fns` wiring.
    Deeper-level bags (4·top_k patches) stay data-sharded; their small
    attention never engages the kernel under `attention_impl="auto"`."""

    def __init__(self, config: Config, mesh: Optional[Mesh] = None):
        self.config = config
        self._shard = (NamedSharding(mesh, P("data"))
                       if mesh is not None and mesh.devices.size > 1 else None)
        if mesh is not None and int(mesh.shape.get("model", 1)) > 1:
            from paths_tpu.parallel.seq_attention import SeqSharding

            seq_mesh = SeqSharding(mesh, impl=config.seq_attention)
        else:
            seq_mesh = None
        self._seq_mesh = seq_mesh

        cfg = config

        @partial(jax.jit, static_argnames=("depth", "deterministic"))
        def fwd(params, bag, rng, depth, deterministic):
            return recursive_apply(params, cfg, depth, bag, rng=rng,
                                   deterministic=deterministic,
                                   seq_mesh=seq_mesh)

        @partial(jax.jit, static_argnames=("k",))
        def select(bag, out, k):
            return select_children(bag, out, k, cfg.model_config.patch_size)

        @jax.jit
        def finish(sel, lookup):
            return finish_step(sel, lookup, cfg.model_config.patch_size)

        self._fwd = fwd
        self._select = select
        self._finish = finish
        self._grad = None

    # ---------------------------------------------------------------- pass 1

    def forward(self, params, bag0: PatchBag, host_tables: List[List[dict]],
                *, rng=None, deterministic=True, record=False):
        """Run the recursion; `host_tables[l][j]` is slide j's table for
        level l+1. Returns (outs, recorded_lookups)."""
        cfg = self.config
        bag = bag0
        outs, recorded = [], []
        for i in range(cfg.num_levels):
            lrng = jax.random.fold_in(rng, i) if rng is not None else None
            out = self._fwd(params, bag, lrng, depth=i,
                            deterministic=deterministic)
            outs.append({**out, "bag": bag})
            if i != cfg.num_levels - 1:
                sel = self._select(bag, out, cfg.top_k_patches[i])
                # ONE device->host sync for both coordinate arrays: on
                # high-latency links each separate np.asarray pays a full
                # round trip, and this sync sits on the critical path of
                # every level
                locs_h, kvalid_h = jax.device_get(
                    (sel["child_locs"], sel["child_kvalid"]))
                lk = lookup_host(np.asarray(locs_h), np.asarray(kvalid_h),
                                 [ts[i] for ts in host_tables])
                # one paired dtype decision: cross the link at the
                # narrower of storage/table dtype, arrive at the compute
                # table dtype (f16 stores ship half-width bytes over the
                # RTT/bandwidth-bound link; f32 stores with bf16 tables
                # downcast HOST-side rather than shipping double bytes)
                lk_dev = ship_at_wire_dtype(
                    lk, cfg.table_dtype,
                    (lambda t: jax.device_put(t, self._shard))
                    if self._shard is not None
                    else (lambda t: {k: jnp.asarray(v)
                                     for k, v in t.items()}))
                if record:
                    recorded.append(lk_dev)
                bag = self._finish(sel, lk_dev)
        return outs, recorded

    # ---------------------------------------------------------------- pass 2

    def _replay_loss(self, params, bag0, lookups, labels, rng, deterministic):
        cfg = self.config
        bag = bag0
        out = None
        for i in range(cfg.num_levels):
            lrng = jax.random.fold_in(rng, i) if rng is not None else None
            out = recursive_apply(params, cfg, i, bag, rng=lrng,
                                  deterministic=deterministic,
                                  seq_mesh=self._seq_mesh)
            if i != cfg.num_levels - 1:
                sel = select_children(bag, out, cfg.top_k_patches[i],
                                      cfg.model_config.patch_size)
                bag = finish_step(sel, lookups[i],
                                  cfg.model_config.patch_size)
        return task_loss(cfg, out["logits"], labels)

    def evaluate(self, params, bag0, host_tables, labels):
        """Single-pass (no-grad) loss + prediction."""
        outs, _ = self.forward(params, bag0, host_tables, deterministic=True)
        loss, pred = task_loss(self.config, outs[-1]["logits"], labels)
        return loss, pred

    def loss_and_grad(self, params, bag0, host_tables, labels, *,
                      rng=None, deterministic=False):
        """Two passes: record lookups, then one jitted grad replay.
        Selections in the replay recompute identically because params and
        rng are unchanged between passes."""
        _, recorded = self.forward(params, bag0, host_tables, rng=rng,
                                   deterministic=deterministic, record=True)

        if self._grad is None:
            @partial(jax.jit, static_argnames=("deterministic",))
            def grad_fn(params, bag0, lookups, labels, rng, deterministic):
                (loss, pred), grads = jax.value_and_grad(
                    self._replay_loss, has_aux=True)(
                        params, bag0, lookups, labels, rng, deterministic)
                return loss, pred, grads

            self._grad = grad_fn

        return self._grad(params, bag0, recorded, labels, rng, deterministic)
