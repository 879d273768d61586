"""Masked flash attention in Pallas (TPU).

The aggregator's self-attention is quadratic in the bag length; PATHS
keeps bags small by top-K selection, but level-0 bags are the full tissue
grid and grow with slide size / base power (`data_utils/slide.py:258-269`,
SURVEY.md §5 long-context note). This kernel computes softmax attention
with a key-padding mask in O(block) VMEM via the online-softmax recurrence,
so bag length is bounded by HBM rather than by an N x N score matrix.

Blocking: every pass runs on a 4-D grid whose innermost dimension walks
the contraction axis (key blocks for forward/dq, query blocks for dk/dv)
while accumulators live in VMEM scratch that persists across grid steps.
K/V (and in the dkv pass, Q/dO) therefore stream through VMEM one
(block, head_dim) tile at a time — resident VMEM is O(block), independent
of sequence length, for both directions. Key blocks entirely beyond a
batch row's valid length are skipped (`pl.when`), so ragged bags don't pay
for their padding.

Both directions are Pallas kernels under `jax.custom_vjp`: the forward
saves per-row log-sum-exp, and the backward computes dq (stream over key
blocks) and dk/dv (stream over query blocks) with the standard
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

_DIMS4 = pltpu.CompilerParams(dimension_semantics=(
    "parallel", "parallel", "parallel", "arbitrary"))


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


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                  acc_ref, m_ref, l_ref, *, block_k, num_kb, sm_scale):
    # grid: (B, H, num_q_blocks, num_k_blocks) — kb innermost; refs are
    # blocked to q/o (1,1,bq,d), k/v (1,1,bk,d); accumulators persist in
    # VMEM scratch across the kb sweep
    kb = pl.program_id(3)
    length = len_ref[pl.program_id(0)]

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(kb * block_k < length)
    def _compute():
        q = q_ref[0, 0]                                     # (bq, d)
        k = k_ref[0, 0]                                     # (bk, d)
        v = v_ref[0, 0]
        bq = q.shape[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale                                    # (bq, bk)
        key_idx = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        s = jnp.where(key_idx < length, s, NEG_INF)

        m_prev, l_prev = m_ref[...], l_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_ref[...] = m_new
        l_ref[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _finalize():
        l_safe = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0, 0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        # log-sum-exp per query row, consumed by the backward kernels; kept
        # (bq, 1)-shaped so the block layout satisfies TPU tiling rules
        lse_ref[0, 0] = m_ref[...] + jnp.log(l_safe)


def _flash_bwd_dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, dq_acc, *, block_k, num_kb,
                         sm_scale):
    # grid: (B, H, num_q_blocks, num_k_blocks) — dq accumulates in scratch
    # while K/V stream through one block at a time
    kb = pl.program_id(3)
    length = len_ref[pl.program_id(0)]

    @pl.when(kb == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(kb * block_k < length)
    def _compute():
        q = q_ref[0, 0]                                     # (bq, d)
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]                                 # (bq, 1)
        delta = delta_ref[0, 0]                             # (bq, 1)
        k = k_ref[0, 0]                                     # (bk, d)
        v = v_ref[0, 0]
        bq = q.shape[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale
        key_idx = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        s = jnp.where(key_idx < length, s, NEG_INF)
        p = jnp.exp(s - lse)                                # (bq, bk)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _finalize():
        dq_ref[0, 0] = (dq_acc[...] * sm_scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                          block_q, num_qb, sm_scale):
    # grid: (B, H, num_k_blocks, num_q_blocks) — qb innermost; dk/dv for
    # one k block accumulate in scratch while Q/dO stream through
    kb = pl.program_id(2)
    qb = pl.program_id(3)
    length = len_ref[pl.program_id(0)]
    block_k = dk_acc.shape[0]

    @pl.when(qb == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    # a key block entirely beyond the valid length has zero gradient
    @pl.when(kb * block_k < length)
    def _compute():
        k = k_ref[0, 0]                                     # (bk, d)
        v = v_ref[0, 0]
        q = q_ref[0, 0]                                     # (bq, d)
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]                                 # (bq, 1)
        delta = delta_ref[0, 0]
        key_idx = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale
        s = jnp.where(key_idx < length, s, NEG_INF)         # (bq, bk)
        p = jnp.exp(s - lse)
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qb == num_qb - 1)
    def _finalize():
        dk_ref[0, 0] = (dk_acc[...] * sm_scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _pad_seq(block, *xs):
    """Zero-pad axis 2 of each array to a multiple of `block`."""
    out = []
    for x in xs:
        n_pad = -x.shape[2] % block
        out.append(jnp.pad(x, [(0, 0), (0, 0), (0, n_pad), (0, 0)])
                   if n_pad else x)
    return out[0] if len(out) == 1 else tuple(out)


def _flash_forward(q, k, v, lengths, *, block_q=256, block_k=512):
    """Returns (out, lse), both unpadded (lse is (B, H, Nq)).

    Nq and Nk may differ (cross attention over a query shard vs the full
    gathered key sequence — `parallel/seq_attention.py`); each pads to
    its own block multiple. Padded keys are masked by `lengths`; padded
    queries produce garbage rows that are sliced off."""
    b, h, nq, d = q.shape
    sm_scale = 1.0 / math.sqrt(d)

    q = _pad_seq(block_q, q)
    k, v = _pad_seq(block_k, k, v)
    npq, npk = q.shape[2], k.shape[2]
    num_kb = npk // block_k

    grid = (b, h, npq // block_q, num_kb)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, num_kb=num_kb,
                          sm_scale=sm_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda b, h, qb, kb, *_: (b, h, qb, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda b, h, qb, kb, *_: (b, h, kb, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda b, h, qb, kb, *_: (b, h, kb, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_q, d),
                             lambda b, h, qb, kb, *_: (b, h, qb, 0)),
                pl.BlockSpec((1, 1, block_q, 1),
                             lambda b, h, qb, kb, *_: (b, h, qb, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, npq, 1), jnp.float32),
        ),
        compiler_params=_DIMS4,
        interpret=INTERPRET,
    )(lengths.astype(jnp.int32), q, k, v)
    return out[:, :, :nq], lse[:, :, :nq, 0]


def _flash_backward(q, k, v, lengths, out, lse, g, *, block_q=256,
                    block_k=512):
    """Block-wise dq/dk/dv — O(block) memory like the forward.

    Handles Nq != Nk like the forward. Zero-padded query rows carry
    zero-padded dO, so their p-weighted contributions to dk/dv vanish
    identically; padded dq/dk rows are sliced off."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    sm_scale = 1.0 / math.sqrt(d)
    lengths = lengths.astype(jnp.int32)

    q, g_p, out_p = _pad_seq(block_q, q, g, out)
    k, v = _pad_seq(block_k, k, v)
    npq, npk = q.shape[2], k.shape[2]
    lse_p = jnp.pad(lse, [(0, 0), (0, 0), (0, npq - nq)])[..., None]
    delta = jnp.sum(g_p.astype(jnp.float32) * out_p.astype(jnp.float32),
                    axis=-1, keepdims=True)                   # (B, H, Npq, 1)

    num_qb, num_kb = npq // block_q, npk // block_k

    qblk = pl.BlockSpec((1, 1, block_q, d),
                        lambda b, h, qb, kb, *_: (b, h, qb, 0))
    qvec = pl.BlockSpec((1, 1, block_q, 1),
                        lambda b, h, qb, kb, *_: (b, h, qb, 0))
    kblk = pl.BlockSpec((1, 1, block_k, d),
                        lambda b, h, qb, kb, *_: (b, h, kb, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k,
                          num_kb=num_kb, sm_scale=sm_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, num_qb, num_kb),
            in_specs=[qblk, kblk, kblk, qblk, qvec, qvec],
            out_specs=qblk,
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=_DIMS4,
        interpret=INTERPRET,
    )(lengths, q, k, v, g_p, lse_p, delta)

    # dkv grid: k blocks outer, q blocks inner
    kblk2 = pl.BlockSpec((1, 1, block_k, d),
                         lambda b, h, kb, qb, *_: (b, h, kb, 0))
    qblk2 = pl.BlockSpec((1, 1, block_q, d),
                         lambda b, h, kb, qb, *_: (b, h, qb, 0))
    qvec2 = pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, h, kb, qb, *_: (b, h, qb, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q,
                          num_qb=num_qb, sm_scale=sm_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, num_kb, num_qb),
            in_specs=[qblk2, kblk2, kblk2, qblk2, qvec2, qvec2],
            out_specs=(kblk2, kblk2),
            scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                            pltpu.VMEM((block_k, d), jnp.float32)],
        ),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        compiler_params=_DIMS4,
        interpret=INTERPRET,
    )(lengths, q, k, v, g_p, lse_p, delta)

    return dq[:, :, :nq], dk[:, :, :nk], dv[:, :, :nk]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def masked_flash_attention(q, k, v, lengths, block_q=256, block_k=512):
    """softmax(q k^T / sqrt(d) + key mask) v, (B, H, N, D) in, same out.

    Keys at positions >= lengths[b] are masked for every query; padded
    query rows still produce (normalized) outputs attending over valid
    keys, matching the XLA reference path. Both directions run as Pallas
    kernels with O(block) VMEM — K/V (or Q/dO) stream through one block
    per grid step, so any N that fits in HBM is safe at any dtype.

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
