"""Multi-head attention with key-padding masks.

Math matches `torch.nn.MultiheadAttention` (packed qkv projection + output
projection, scaled dot-product softmax, attention-weight dropout) so the
aggregator can be parity-tested against `nn.Transformer`
(reference `model/aggregator.py:25-33`).

Weights are stored unpacked per head-group: q/k/v each (dim, dim) plus the
out projection. Torch's `in_proj_weight` (3*dim, dim) maps to our q/k/v by
row-splitting then transposing.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from paths_tpu.nn.core import Static, dropout, linear_init
from paths_tpu.ops.masking import NEG_INF

# "auto" engages the pallas flash kernel at and above this bag length;
# below ~4096 keys XLA's fused attention matches the kernel (~6ms at
# N=4096). There is no upper bound: K/V stream through VMEM one block per
# grid step (O(block) residency at any N and dtype), and at N=8192 the
# kernel measures 32x faster than XLA on v5e — while at N=16384 XLA's
# materialized f32 score matrix cannot even fit in HBM.
AUTO_PALLAS_MIN_LEN = 4096


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:  # noqa: BLE001 — backend probing must never raise
        return False


def mha_init(key, dim: int, num_heads: int, dtype=jnp.float32) -> dict:
    """Xavier-uniform q/k/v/out weights, zero biases — matching
    `nn.Transformer._reset_parameters` + MHA bias defaults."""
    assert dim % num_heads == 0
    kq, kk, kv, ko = jax.random.split(key, 4)
    mk = lambda k: linear_init(k, dim, dim, init="xavier", dtype=dtype)
    return {"q": mk(kq), "k": mk(kk), "v": mk(kv), "out": mk(ko),
            "num_heads": Static(num_heads)}


def _split_heads(x: jnp.ndarray, h: int) -> jnp.ndarray:
    b, n, d = x.shape
    return x.reshape(b, n, h, d // h).transpose(0, 2, 1, 3)  # B,H,N,hd


def mha_apply(params: dict, query: jnp.ndarray, key_: jnp.ndarray,
              value: jnp.ndarray, *, key_valid: Optional[jnp.ndarray] = None,
              dropout_rate: float = 0.0, rng: Optional[jax.Array] = None,
              deterministic: bool = True, compute_dtype=None,
              impl: str = "xla", seq_mesh=None,
              seq_axis: str = "model") -> jnp.ndarray:
    """Scaled dot-product MHA.

    :param query: (B, Nq, D)
    :param key_/value: (B, Nk, D)
    :param key_valid: optional (B, Nk) bool — True marks attendable keys
        (inverse of torch's key_padding_mask)
    :param impl: "xla", "pallas", or "auto" (pallas for self-attention
        over >= AUTO_PALLAS_MIN_LEN keys, where the XLA path's N x N
        score materialization becomes bandwidth-bound — measured 32x
        slower on v5e at N=8k and HBM-infeasible at 16k). The pallas
        kernel (`paths_tpu/kernels/flash_attention.py`) requires a PREFIX
        mask (valid keys first — guaranteed for compacted PatchBags) and
        falls back to XLA when attention-weight dropout is active.
    :param seq_mesh: a Mesh whose `seq_axis` dimension shards the patch
        (sequence) axis. When its size > 1 and the pallas kernel is
        engaged, self-attention runs through the sequence-parallel
        shard_map kernel (`parallel/seq_attention.py`): each chip keeps
        its query shard, gathers K/V, and runs the local flash kernel —
        instead of the single-device pallas_call, which GSPMD would have
        to replicate. With impl="xla" the mesh is unused (GSPMD partitions
        XLA attention natively).
    :return: (B, Nq, D)

    If Nk == 0 the attention context is zero, so the result is the
    broadcast out-projection bias — torch's empirical behavior for
    zero-length memory (out_proj applied to a zero context). The
    reference aggregator feeds an empty encoder sequence
    (`model/paths.py:110-112`), so trained checkpoints carry a nonzero
    cross-attn out_proj.bias that must survive conversion.
    """
    h = params["num_heads"].value
    b, nq, d = query.shape
    nk = key_.shape[1]
    if nk == 0:
        ob = params["out"]["b"].astype(query.dtype)
        return jnp.broadcast_to(ob, (b, nq, d))

    cd = compute_dtype or query.dtype
    proj = lambda p, x: (x.astype(cd) @ p["w"].astype(cd) + p["b"].astype(cd))

    q = _split_heads(proj(params["q"], query), h)   # B,H,Nq,hd
    k = _split_heads(proj(params["k"], key_), h)    # B,H,Nk,hd
    v = _split_heads(proj(params["v"], value), h)

    is_bf16 = jnp.dtype(cd) == jnp.bfloat16
    if seq_mesh is not None:
        from paths_tpu.parallel.seq_attention import SeqSharding

        seq_mesh = SeqSharding.wrap(seq_mesh)
        if seq_mesh.axis != seq_axis:
            seq_mesh = SeqSharding(seq_mesh.mesh, seq_axis, seq_mesh.impl)
    sp = seq_mesh.size if seq_mesh is not None else 1
    want_pallas = impl == "pallas" or (
        impl == "auto" and nk >= AUTO_PALLAS_MIN_LEN and _on_tpu())
    use_pallas = (want_pallas
                  and (deterministic or dropout_rate == 0.0)
                  and nq == nk)
    if use_pallas:
        from paths_tpu.kernels.flash_attention import masked_flash_attention

        lengths = (jnp.sum(key_valid, axis=-1).astype(jnp.int32)
                   if key_valid is not None
                   else jnp.full((b,), nk, jnp.int32))
        # measured: bf16 (256,512) ~3x faster than (128,128) at N=8192;
        # f32 blocks stay smaller (f32 tiles are 2x the VMEM per block)
        bq, bk = (256, 512) if is_bf16 else (128, 128)
        if sp > 1:
            # shard_map needs the sequence length divisible by the mesh
            # axis; the special token makes it N+1, so pad with masked
            # slots (keys beyond `lengths` are ignored, padded query rows
            # are sliced off). The schedule (gathered-KV vs ring) comes
            # from the SeqSharding spec.
            pad = (-nq) % sp
            if pad:
                q, k, v = (jnp.pad(a, [(0, 0), (0, 0), (0, pad), (0, 0)])
                           for a in (q, k, v))
            ctx = seq_mesh.attend(q, k, v, lengths,
                                  block_q=bq, block_k=bk)[:, :, :nq]
        else:
            ctx = masked_flash_attention(q, k, v, lengths, bq, bk)
    else:
        scale = 1.0 / math.sqrt(d // h)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        if key_valid is not None:
            logits = jnp.where(key_valid[:, None, None, :], logits, NEG_INF)
        weights = jax.nn.softmax(logits, axis=-1)
        weights = dropout(weights, dropout_rate, rng=rng,
                          deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(cd), v,
                         preferred_element_type=jnp.float32).astype(cd)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, nq, d)
    return proj(params["out"], ctx).astype(query.dtype)
