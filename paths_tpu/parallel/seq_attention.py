"""Sequence-parallel masked flash attention: the multi-chip path for
attention over patch bags too large for one chip.

Patch-axis (GSPMD) sharding already runs the aggregator's attention
multi-chip by letting XLA insert K/V all-gathers around its own
attention lowering (`parallel/mesh.py::shard_bag_patches`); that path
materializes per-shard score blocks. This module composes the sharding
with the O(block)-memory Pallas flash kernel instead, at two rungs:

  * `seq_sharded_flash_attention` (gathered-KV): each chip all-gathers
    K/V along the `model` axis (bf16 rows — the cheap operand;
    ICI-bandwidth-bound) and runs the local flash kernel over its own
    query shard. Per-chip attention memory is O(N) for gathered K/V plus
    O(block) VMEM.
  * `ring_flash_attention`: K/V shards ROTATE around the ring
    (`lax.ppermute`) instead of gathering — per-chip memory is O(N/sp).
    Each step runs the local flash kernel against the currently-held
    block and folds the partial into a running (out, logsumexp) pair via
    the standard online-softmax combination; the ppermute overlaps the
    kernel's compute on real ICI. The custom backward rotates dk/dv
    accumulators along with the blocks, so each block returns home with
    every query shard's contribution — still O(N/sp) memory.

Reference scaling context: the reference keeps bags small precisely to
afford quadratic attention (`README.md:9`); SURVEY §2/§5 name blockwise
/ ring attention over the bag as the TPU-native scaling equivalent.

Gradients flow through `shard_map` + the kernels' custom VJPs; the
backward of the gathered path's all-gather is XLA's reduce-scatter.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from paths_tpu.kernels.flash_attention import (
    _flash_backward,
    _flash_forward,
    masked_flash_attention,
)


@dataclasses.dataclass(frozen=True)
class SeqSharding:
    """How the model's attention should run sequence-parallel: the mesh,
    the mesh axis sharding the patch dimension, and the schedule
    ("gathered" all-gathers K/V per chip — O(N) memory, one collective;
    "ring" rotates K/V blocks — O(N/sp) memory, sp ppermutes that
    overlap compute). Threaded into the model as `seq_mesh` (a bare Mesh
    means gathered)."""

    mesh: Mesh
    axis: str = "model"
    impl: str = "gathered"   # gathered | ring

    @staticmethod
    def wrap(mesh_or_spec) -> "SeqSharding | None":
        if mesh_or_spec is None or isinstance(mesh_or_spec, SeqSharding):
            return mesh_or_spec
        return SeqSharding(mesh=mesh_or_spec)

    @property
    def size(self) -> int:
        return int(self.mesh.shape.get(self.axis, 1))

    def attend(self, q, k, v, lengths, *, block_q: int, block_k: int):
        fn = (ring_flash_attention if self.impl == "ring"
              else seq_sharded_flash_attention)
        return fn(self.mesh, q, k, v, lengths, axis=self.axis,
                  block_q=block_q, block_k=block_k)


def seq_sharded_flash_attention(mesh: Mesh, q, k, v, lengths, *,
                                axis: str = "model", block_q: int = 256,
                                block_k: int = 512):
    """softmax(q k^T / sqrt(d) + key-prefix mask) v with the sequence
    axis sharded across `axis` of `mesh`.

    :param q/k/v: (B, H, N, hd) with N sharded along `axis` (device_put
        with ``P(None, None, axis, None)``); the global sequence must be
        compacted valid-first (PatchBag invariant) so the gathered keys
        form one prefix-masked sequence.
    :param lengths: (B,) int32 GLOBAL valid-key counts, replicated.
    :return: attention context, (B, H, N, hd), sharded like `q`.
    """
    spec = P(None, None, axis, None)

    def local(q_l, k_l, v_l, lengths_l):
        k_full = jax.lax.all_gather(k_l, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_l, axis, axis=2, tiled=True)
        return masked_flash_attention(q_l, k_full, v_full, lengths_l,
                                      block_q=block_q, block_k=block_k)

    return shard_map(local, mesh=mesh,
                     in_specs=(spec, spec, spec, P()),
                     out_specs=spec, check_vma=False)(q, k, v, lengths)


# ----------------------------------------------------------------- ring

def _combine(o1, lse1, o2, lse2):
    """Fold two attention partials over disjoint key sets into one:
    out = softmax-weighted average by exp(lse), lse = logaddexp. Empty
    partials carry lse ~ -1e30 and weight out to zero. Accumulates in
    f32 regardless of the input dtype (the scan carry stays f32; callers
    cast back)."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    den = jnp.maximum(w1 + w2, 1e-30)
    out = (o1.astype(jnp.float32) * (w1 / den)[..., None]
           + o2.astype(jnp.float32) * (w2 / den)[..., None])
    return out, m + jnp.log(den)


def _ring_perm(axis: str, sp: int):
    return [(j, (j + 1) % sp) for j in range(sp)]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ring_local(q, k, v, axis, sp, block_q, block_k, lengths):
    out, _ = _ring_local_fwd(q, k, v, axis, sp, block_q, block_k, lengths)
    return out


def _ring_local_fwd(q, k, v, axis, sp, block_q, block_k, lengths):
    """Per-shard ring forward (runs INSIDE shard_map). `q/k/v` are the
    local shards (B, H, N/sp, hd); `lengths` the replicated global valid
    counts. Scans sp steps: flash-attend the held K/V block (masked to
    its slice of the global prefix), fold into (out, lse), rotate."""
    idx = lax.axis_index(axis)
    n_l = k.shape[2]
    b, h, nq, _ = q.shape
    perm = _ring_perm(axis, sp)

    def body(carry, i):
        out, lse, k_cur, v_cur = carry
        src = (idx - i) % sp                  # whose block we hold now
        blk_len = jnp.clip(lengths - src * n_l, 0, n_l)
        o_i, lse_i = _flash_forward(q, k_cur, v_cur, blk_len,
                                    block_q=block_q, block_k=block_k)
        out, lse = _combine(out, lse, o_i, lse_i)
        k_cur = lax.ppermute(k_cur, axis, perm)
        v_cur = lax.ppermute(v_cur, axis, perm)
        return (out, lse, k_cur, v_cur), None

    # the running (out, lse) carry is f32 at ANY input dtype — bf16
    # inputs would otherwise mismatch the scan carry after _combine's
    # f32 promotion
    init = (jnp.zeros(q.shape, jnp.float32),
            jnp.full((b, h, nq), -jnp.inf, jnp.float32), k, v)
    (out, lse, _, _), _ = lax.scan(body, init, jnp.arange(sp))
    out = out.astype(q.dtype)
    return out, (q, k, v, lengths, out, lse)


def _ring_local_bwd(axis, sp, block_q, block_k, res, g):
    """Ring backward: q/g/out/lse stay local; K/V blocks and their dk/dv
    accumulators rotate together, so after sp steps each block is home
    with all query shards' contributions. Per-block grads reuse the flash
    backward kernels with the GLOBAL lse/out (delta), which is exactly
    the standard flash decomposition."""
    q, k, v, lengths, out, lse = res
    idx = lax.axis_index(axis)
    n_l = k.shape[2]
    perm = _ring_perm(axis, sp)

    def body(carry, i):
        dq, dk_cur, dv_cur, k_cur, v_cur = carry
        src = (idx - i) % sp
        blk_len = jnp.clip(lengths - src * n_l, 0, n_l)
        dq_i, dk_i, dv_i = _flash_backward(
            q, k_cur, v_cur, blk_len, out, lse, g,
            block_q=block_q, block_k=block_k)
        dq = dq + dq_i
        dk_cur = lax.ppermute(dk_cur + dk_i, axis, perm)
        dv_cur = lax.ppermute(dv_cur + dv_i, axis, perm)
        k_cur = lax.ppermute(k_cur, axis, perm)
        v_cur = lax.ppermute(v_cur, axis, perm)
        return (dq, dk_cur, dv_cur, k_cur, v_cur), None

    init = (jnp.zeros_like(q), jnp.zeros_like(k), jnp.zeros_like(v), k, v)
    (dq, dk, dv, _, _), _ = lax.scan(body, init, jnp.arange(sp))
    return dq, dk, dv, None    # lengths carries no gradient


_ring_local.defvjp(lambda q, k, v, axis, sp, bq, bk, lengths:
                   _ring_local_fwd(q, k, v, axis, sp, bq, bk, lengths),
                   _ring_local_bwd)


def ring_flash_attention(mesh: Mesh, q, k, v, lengths, *,
                         axis: str = "model", block_q: int = 256,
                         block_k: int = 512):
    """Ring-scheduled sequence-parallel flash attention: same contract as
    `seq_sharded_flash_attention` (N sharded along `axis`, compacted
    valid-first, `lengths` = global valid counts, replicated) with
    O(N/sp) per-chip memory instead of the gathered path's O(N).
    """
    sp = mesh.shape[axis]
    assert q.shape[2] % sp == 0, (q.shape, sp)
    spec = P(None, None, axis, None)

    def local(q_l, k_l, v_l, lengths_l):
        return _ring_local(q_l, k_l, v_l, axis, sp, block_q, block_k,
                           lengths_l)

    return shard_map(local, mesh=mesh,
                     in_specs=(spec, spec, spec, P()),
                     out_specs=spec, check_vma=False)(q, k, v, lengths)
