"""Masked flash attention in Pallas (TPU).

The aggregator's self-attention is quadratic in the bag length; PATHS
keeps bags small by top-K selection, but level-0 bags are the full tissue
grid and grow with slide size / base power (`data_utils/slide.py:258-269`,
SURVEY.md §5 long-context note). This kernel computes softmax attention
with a key-padding mask in O(block) VMEM via the online-softmax recurrence,
so bag length is bounded by HBM rather than by an N x N score matrix.

Both directions are Pallas kernels under `jax.custom_vjp`: the forward
saves per-row log-sum-exp, and the backward computes dq (loop over key
blocks) and dk/dv (loop over query blocks) with the standard
flash-attention recurrence — no N x N buffer in either pass. Enabled via
`Config.attention_impl` ("pallas"/"auto"); outputs and gradients agree
with the XLA reference to float tolerance (tests/test_flash_attention.py).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# set True to run the kernel in the Pallas interpreter (CPU tests)
INTERPRET = False


def _attn_reference(q, k, v, lengths):
    """XLA reference: softmax(q k^T / sqrt(d)) v with key-padding mask.
    q, k, v: (B, H, N, D); lengths: (B,) valid key count."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d)
    mask = jnp.arange(q.shape[2])[None, :] < lengths[:, None]   # (B, N)
    logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k,
                  n_keys, sm_scale):
    # grid: (B, H, num_q_blocks); refs are blocked to
    # q (1, 1, block_q, d), k/v (1, 1, n_keys, d)
    q = q_ref[0, 0].astype(jnp.float32) * sm_scale          # (bq, d)
    bq, d = q.shape
    length = len_ref[pl.program_id(0)]

    acc = jnp.zeros((bq, d), jnp.float32)
    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)

    num_kb = n_keys // block_k

    def body(kb, carry):
        acc, m, l = carry
        k = k_ref[0, 0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (bq, bk)
        key_idx = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        s = jnp.where(key_idx < length, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l

    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m, l))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
    # log-sum-exp per query row, consumed by the backward kernels; kept
    # (bq, 1)-shaped so the block layout satisfies TPU tiling rules
    lse_ref[0, 0] = m + jnp.log(l_safe)


def _flash_bwd_dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, *, block_k, n_keys, sm_scale):
    # grid: (B, H, num_q_blocks); dq for one q block, looping over k
    q = q_ref[0, 0].astype(jnp.float32)                     # (bq, d)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]                                     # (bq, 1)
    delta = delta_ref[0, 0]                                 # (bq, 1)
    bq, d = q.shape
    length = len_ref[pl.program_id(0)]
    num_kb = n_keys // block_k

    def body(kb, dq):
        k = k_ref[0, 0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        key_idx = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        s = jnp.where(key_idx < length, s, NEG_INF)
        p = jnp.exp(s - lse)                                # (bq, bk)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0, 0] = (dq * sm_scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, *, block_q, n_queries,
                          sm_scale):
    # grid: (B, H, num_k_blocks); dk/dv for one k block, looping over q
    k = k_ref[0, 0].astype(jnp.float32)                     # (bk, d)
    v = v_ref[0, 0].astype(jnp.float32)
    bk, d = k.shape
    kb = pl.program_id(2)
    length = len_ref[pl.program_id(0)]
    key_idx = kb * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
    key_live = key_idx < length                             # (1, bk)
    num_qb = n_queries // block_q

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, 0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)]    # (bq, 1)
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(key_live, s, NEG_INF)                 # (bq, bk)
        p = jnp.exp(s - lse)
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        0, num_qb, body, (jnp.zeros((bk, d), jnp.float32),
                          jnp.zeros((bk, d), jnp.float32)))
    dk_ref[0, 0] = (dk * sm_scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _padded(q, k, v, block_q, block_k, *extra):
    n = q.shape[2]
    n_pad = -n % max(block_q, block_k)
    if n_pad:
        pad = [(0, 0), (0, 0), (0, n_pad), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        extra = tuple(jnp.pad(e, pad) for e in extra)
    return (q, k, v, *extra)


def _flash_forward(q, k, v, lengths, *, block_q=256, block_k=512):
    """Returns (out, lse), both unpadded (lse is (B, H, N))."""
    b, h, n, d = q.shape
    sm_scale = 1.0 / math.sqrt(d)

    # pad sequence to block multiples (padded keys are masked by `lengths`,
    # padded queries produce garbage rows that callers never read)
    q, k, v = _padded(q, k, v, block_q, block_k)
    np_ = q.shape[2]

    grid = (b, h, np_ // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, n_keys=np_,
                          sm_scale=sm_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda b, h, qb, *_: (b, h, qb, 0)),
                pl.BlockSpec((1, 1, np_, d), lambda b, h, qb, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, np_, d), lambda b, h, qb, *_: (b, h, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_q, d),
                             lambda b, h, qb, *_: (b, h, qb, 0)),
                pl.BlockSpec((1, 1, block_q, 1),
                             lambda b, h, qb, *_: (b, h, qb, 0)),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, np_, 1), jnp.float32),
        ),
        interpret=INTERPRET,
    )(lengths.astype(jnp.int32), q, k, v)
    return out[:, :, :n], lse[:, :, :n, 0]


def _flash_backward(q, k, v, lengths, out, lse, g, *, block_q=256,
                    block_k=512):
    """Block-wise dq/dk/dv — O(block) memory like the forward."""
    b, h, n, d = q.shape
    sm_scale = 1.0 / math.sqrt(d)
    lengths = lengths.astype(jnp.int32)

    q, k, v, g_p, out_p = _padded(q, k, v, block_q, block_k, g, out)
    np_ = q.shape[2]
    pad3 = [(0, 0), (0, 0), (0, np_ - n)]
    lse_p = jnp.pad(lse, pad3)[..., None]                     # (B, H, Np, 1)
    delta = jnp.sum(g_p.astype(jnp.float32) * out_p.astype(jnp.float32),
                    axis=-1, keepdims=True)                   # (B, H, Np, 1)

    row_spec = pl.BlockSpec((1, 1, np_, d), lambda b, h, i, *_: (b, h, 0, 0))
    vec_spec = pl.BlockSpec((1, 1, np_, 1), lambda b, h, i, *_: (b, h, 0, 0))
    blk_spec = pl.BlockSpec((1, 1, block_q, d),
                            lambda b, h, i, *_: (b, h, i, 0))
    blkv_spec = pl.BlockSpec((1, 1, block_q, 1),
                             lambda b, h, i, *_: (b, h, i, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k, n_keys=np_,
                          sm_scale=sm_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, np_ // block_q),
            in_specs=[blk_spec, row_spec, row_spec, blk_spec, blkv_spec,
                      blkv_spec],
            out_specs=blk_spec,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=INTERPRET,
    )(lengths, q, k, v, g_p, lse_p, delta)

    kblk_spec = pl.BlockSpec((1, 1, block_k, d),
                             lambda b, h, i, *_: (b, h, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q,
                          n_queries=np_, sm_scale=sm_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, np_ // block_k),
            in_specs=[row_spec, kblk_spec, kblk_spec, row_spec, vec_spec,
                      vec_spec],
            out_specs=(kblk_spec, kblk_spec),
        ),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        interpret=INTERPRET,
    )(lengths, q, k, v, g_p, lse_p, delta)

    return dq[:, :, :n], dk[:, :, :n], dv[:, :, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def masked_flash_attention(q, k, v, lengths, block_q=256, block_k=512):
    """softmax(q k^T / sqrt(d) + key mask) v, (B, H, N, D) in, same out.

    Keys at positions >= lengths[b] are masked for every query; padded
    query rows still produce (normalized) outputs attending over valid
    keys, matching the XLA reference path. Both directions run as Pallas
    kernels with O(block) memory — no N x N score buffer in either pass.

    Default blocks (256, 512) measured ~3x faster than (128, 128) for the
    gradient path at N=8192 on v5e (more MXU work per VMEM round trip).
    """
    out, _ = _flash_forward(q, k, v, lengths, block_q=block_q,
                            block_k=block_k)
    return out


def _fwd(q, k, v, lengths, block_q, block_k):
    out, lse = _flash_forward(q, k, v, lengths, block_q=block_q,
                              block_k=block_k)
    return out, (q, k, v, lengths, out, lse)


def _bwd(block_q, block_k, res, g):
    q, k, v, lengths, out, lse = res
    dq, dk, dv = _flash_backward(q, k, v, lengths, out, lse, g,
                                 block_q=block_q, block_k=block_k)
    return dq, dk, dv, None


masked_flash_attention.defvjp(_fwd, _bwd)
