"""Masked flash attention in Pallas (TPU).

The aggregator's self-attention is quadratic in the bag length; PATHS
keeps bags small by top-K selection, but level-0 bags are the full tissue
grid and grow with slide size / base power (`data_utils/slide.py:258-269`,
SURVEY.md §5 long-context note). This kernel computes softmax attention
with a key-padding mask in O(block) VMEM via the online-softmax recurrence,
so bag length is bounded by HBM rather than by an N x N score matrix.

Forward-only Pallas with a custom VJP whose backward recomputes through
the XLA reference implementation — training uses XLA end to end unless the
kernel is explicitly enabled (`Config.attention_impl = "pallas"`), and the
two paths agree to float tolerance (tests/test_flash_attention.py).
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


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, block_k, n_keys,
                  sm_scale):
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
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(q, k, v, lengths, *, block_q=128, block_k=128):
    b, h, n, d = q.shape
    sm_scale = 1.0 / math.sqrt(d)

    # pad sequence to block multiples (padded keys are masked by `lengths`,
    # padded queries produce garbage rows that callers never read)
    n_pad = -n % max(block_q, block_k)
    if n_pad:
        pad = [(0, 0), (0, 0), (0, n_pad), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    np_ = q.shape[2]

    grid = (b, h, np_ // block_q)
    out = pl.pallas_call(
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
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda b, h, qb, *_: (b, h, qb, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=INTERPRET,
    )(lengths.astype(jnp.int32), q, k, v)
    return out[:, :, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def masked_flash_attention(q, k, v, lengths, block_q=128, block_k=128):
    """softmax(q k^T / sqrt(d) + key mask) v, (B, H, N, D) in, same out.

    Keys at positions >= lengths[b] are masked for every query; padded
    query rows still produce (normalized) outputs attending over valid
    keys, matching the XLA reference path.
    """
    return _flash_forward(q, k, v, lengths, block_q=block_q, block_k=block_k)


def _fwd(q, k, v, lengths, block_q, block_k):
    out = _flash_forward(q, k, v, lengths, block_q=block_q, block_k=block_k)
    return out, (q, k, v, lengths)


def _bwd(block_q, block_k, res, g):
    q, k, v, lengths = res
    _, vjp = jax.vjp(lambda q, k, v: _attn_reference(q, k, v, lengths),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


masked_flash_attention.defvjp(_fwd, _bwd)
