"""Device mesh + sharding helpers.

The distributed backbone (SURVEY.md §2 "TPU-native equivalents"): slides
are sharded data-parallel along a `data` mesh axis; parameters are
replicated; XLA inserts the gradient all-reduce over ICI when the jitted
train step consumes sharded batches with replicated params — no explicit
collectives or communication backend (the reference has none to port; its
NCCL-equivalent is the XLA compiler).

A `model` axis is reserved for sharding the patch axis of the embedding
pass in the preprocessor (`paths_tpu.preprocess`), where the FLOPs are.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_data or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), ("data",))


def make_mesh_2d(n_data: int, n_model: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh: `data` shards slides (DP), `model` shards the
    patch axis of oversize bags (sequence parallelism for the aggregator's
    attention — the TPU equivalent of splitting one slide's level-0 bag
    across chips). Lay `model` innermost so its collectives (K/V
    all-gathers every attention layer) ride the fastest ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def mesh_from_config(config, devices: Optional[Sequence] = None) -> Mesh:
    """Build the training mesh from `config.mesh_shape`:

    * None / []    -> 1-D data mesh over all devices
    * [dp]         -> 1-D data mesh over dp devices
    * [dp, sp>1]   -> 2-D (data x model) mesh: slides data-parallel across
      rows, each slide's level-0 patch axis sequence-parallel across
      columns (`shard_bag_patches`)
    """
    ms = getattr(config, "mesh_shape", None)
    if not ms:
        return make_mesh(None, devices)
    if len(ms) == 1 or ms[1] <= 1:
        return make_mesh(ms[0], devices)
    return make_mesh_2d(ms[0], ms[1], devices)


def data_axis_size(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return int(mesh.shape.get("data", 1))


def seq_axis_size(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return int(mesh.shape.get("model", 1))


def shard_train_batch(mesh: Mesh, bag0, tables, labels):
    """Shard one training batch for a 1-D or 2-D mesh: the level-0 bag's
    patch axis goes on `model` when that axis exists (sequence
    parallelism); tables and labels always shard on `data` alone (their
    patch axes are small — <= 4K rows after level 0)."""
    if seq_axis_size(mesh) > 1:
        bag0 = shard_bag_patches(mesh, bag0)
        tables, labels = shard_batch(mesh, (tables, labels))
    else:
        bag0, tables, labels = shard_batch(mesh, (bag0, tables, labels))
    return bag0, tables, labels


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (parameters / optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree):
    """Shard every array leaf along its leading (batch) axis."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P("data")))

    return jax.tree_util.tree_map(put, tree)


def shard_bag_patches(mesh: Mesh, bag):
    """Shard a PatchBag along batch (`data`) AND patch (`model`) axes.

    With params replicated, jitting the recursion over such a bag makes
    XLA's SPMD partitioner run all per-patch work (projections, LN, FFN,
    LSTM context) fully sharded and insert K/V all-gathers / softmax
    reductions only where the attention actually mixes patches — the
    GSPMD path for level-0 bags too large for one chip's HBM. `ctx_slide`
    has no patch axis and shards on `data` alone.
    """
    from paths_tpu.models.batch import PatchBag

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    dp = P("data", "model")
    return PatchBag(
        fts=put(bag.fts, dp), locs=put(bag.locs, dp),
        mask=put(bag.mask, dp), parent_inds=put(bag.parent_inds, dp),
        ctx_slide=put(bag.ctx_slide, P("data")),
        ctx_patch=put(bag.ctx_patch, dp))


def pad_batch_indices(indices: Sequence[int], multiple: int):
    """Pad an index list to a multiple of the mesh size by repeating the
    last element; returns (padded_indices, weights) where weights zero out
    the padded duplicates in the loss and evaluators."""
    idx = list(indices)
    n = len(idx)
    pad = (-n) % multiple
    idx = idx + [idx[-1]] * pad
    w = np.ones(len(idx), np.float32)
    if pad:
        w[n:] = 0.0
    return idx, w
