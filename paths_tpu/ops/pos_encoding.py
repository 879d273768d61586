"""Sinusoidal positional encodings.

Numerics match the reference (`utils.py:16-94`) exactly, including its
idiosyncrasies: the 2D encoding concatenates two half-width 1D encodings
whose frequency term divides by the FULL dim (not dim//2), i.e.
`div_term = exp(arange(0, dim//2, 2) * (-ln(k) / dim))`.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def _div_term(dim: int, span: int, k: float, dtype) -> jnp.ndarray:
    """exp(arange(0, span, 2) * (-ln(k) / dim))"""
    return jnp.exp(jnp.arange(0, span, 2, dtype=dtype) * (-math.log(k) / dim))


def positional_encoding_1d(length: int, dim: int, k: float = 10000.0,
                           dtype=jnp.float32) -> jnp.ndarray:
    """Standard 1D sinusoidal PE. Shape (length, dim).

    pe[:, 0::2] = sin(pos * div), pe[:, 1::2] = cos(pos * div)
    (reference `utils.py:16-23`).
    """
    pos = jnp.arange(length, dtype=dtype)[:, None]          # (L, 1)
    div = _div_term(dim, dim, k, dtype)[None, :]            # (1, ceil(dim/2))
    ang = pos * div                                         # (L, ceil(dim/2))
    sin, cos = jnp.sin(ang), jnp.cos(ang)
    # interleave: even columns sin, odd columns cos
    pe = jnp.stack([sin, cos], axis=-1).reshape(length, -1)
    return pe[:, :dim]


def positional_encoding_2d_from_pos(apos: jnp.ndarray, bpos: jnp.ndarray,
                                    dim: int, k: float = 10000.0,
                                    dtype=jnp.float32) -> jnp.ndarray:
    """2D sinusoidal PE for n points: PE2D(a, b) = PE1D(a) || PE1D(b).

    `apos` fills columns [0, dim//2), `bpos` fills [dim//2, dim)
    (reference `utils.py:47-67`; note div_term divides by full `dim`).
    Inputs may be any shape (...,); output has trailing dim appended.
    """
    apos = jnp.asarray(apos, dtype)[..., None]
    bpos = jnp.asarray(bpos, dtype)[..., None]
    half = dim // 2
    div = _div_term(dim, half, k, dtype)                    # (ceil(half/2),)

    a_ang = apos * div
    b_ang = bpos * div
    pe_a = jnp.stack([jnp.sin(a_ang), jnp.cos(a_ang)], axis=-1).reshape(*apos.shape[:-1], -1)[..., :half]
    pe_b = jnp.stack([jnp.sin(b_ang), jnp.cos(b_ang)], axis=-1).reshape(*bpos.shape[:-1], -1)[..., :half]
    return jnp.concatenate([pe_a, pe_b], axis=-1)


def positional_encoding_2d_grid(n: int, m: int, dim: int, k: float = 10000.0,
                                dtype=jnp.float32) -> jnp.ndarray:
    """2D PE over an (n, m) grid; shape (n, m, dim) (reference `utils.py:26-45`)."""
    a = jnp.broadcast_to(jnp.arange(n, dtype=dtype)[:, None], (n, m))
    b = jnp.broadcast_to(jnp.arange(m, dtype=dtype)[None, :], (n, m))
    return positional_encoding_2d_from_pos(a, b, dim, k=k, dtype=dtype)
