"""Sequence-parallel masked flash attention: the multi-chip path for
attention over patch bags too large for one chip.

Patch-axis (GSPMD) sharding already runs the aggregator's attention
multi-chip by letting XLA insert K/V all-gathers around its own
attention lowering (`parallel/mesh.py::shard_bag_patches`); that path
materializes per-shard score blocks. This module composes the sharding
with the O(block)-memory Pallas flash kernel instead: under `shard_map`,
each chip all-gathers K/V along the `model` axis (bf16 rows — the cheap
operand; ICI-bandwidth-bound) and runs the local flash kernel over its
own query shard, so no (Nq, Nk) score tile ever exists anywhere and
per-chip attention memory is O(N) for gathered K/V plus O(block) VMEM.

Reference scaling context: the reference keeps bags small precisely to
afford quadratic attention (`README.md:9`); SURVEY §2 names blockwise /
ring attention over the bag as the TPU-native scaling equivalent. The
gathered-KV formulation is the first rung of that ladder (a ring
schedule saves the O(N) gather memory but not compute; see
docs/BACKLOG.md).

Gradients flow through `shard_map` + the kernel's custom VJP; the
backward of the K/V all-gather is XLA's reduce-scatter.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from paths_tpu.kernels.flash_attention import masked_flash_attention


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
