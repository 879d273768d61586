"""Transformer aggregator: masked attention over a patch bag -> one slide
feature vector.

Mirrors the reference's `TransformerAggregator` (`model/aggregator.py`): the
bag is projected D -> trans_dim, positionally encoded, a learned special
token is prepended to the decoder sequence, and the decoder output at the
special-token position is the aggregate. The encoder ("conditional")
sequence is empty in PATHS, so cross-attention contributes zero.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from paths_tpu.nn.core import linear_apply, linear_init
from paths_tpu.nn.transformer import transformer_apply, transformer_init
from paths_tpu.ops.pos_encoding import (
    positional_encoding_1d,
    positional_encoding_2d_from_pos,
)


def aggregator_init(key, input_dim: int, model_dim: int, num_heads: int,
                    layers: int, dtype=jnp.float32) -> dict:
    kp, kt, ks = jax.random.split(key, 3)
    return {
        "proj_in": linear_init(kp, input_dim, model_dim, init="torch", dtype=dtype),
        "transformer": transformer_init(kt, model_dim, num_heads, layers,
                                        ff_dim=model_dim * 4, dtype=dtype),
        "special_token": jax.random.normal(ks, (model_dim,), dtype),
    }


def pos_encode_1d(params: dict, xs: jnp.ndarray, *, project: bool = True,
                  compute_dtype=None) -> jnp.ndarray:
    """Project then add 1D PE by bag position (`aggregator.py:37-41`)."""
    if project:
        xs = linear_apply(params["proj_in"], xs, compute_dtype=compute_dtype)
    _, n, d = xs.shape
    return xs + positional_encoding_1d(n, d, dtype=xs.dtype)[None]


def pos_encode_2d(params: dict, xs: jnp.ndarray, patch_locs: jnp.ndarray, *,
                  project: bool = True, compute_dtype=None) -> jnp.ndarray:
    """Project then add 2D PE from patch-grid coords (`aggregator.py:43-56`).

    `patch_locs` is (B, N, 2) patch-indexed (pixel coords // patch_size);
    coordinate 0 fills the first half of the encoding.
    """
    if project:
        xs = linear_apply(params["proj_in"], xs, compute_dtype=compute_dtype)
    d = xs.shape[-1]
    pe = positional_encoding_2d_from_pos(patch_locs[..., 0], patch_locs[..., 1],
                                         d, dtype=jnp.float32)
    return xs + pe.astype(xs.dtype)


def aggregator_apply(params: dict, cond_seq: jnp.ndarray, xs: jnp.ndarray,
                     cond_valid: Optional[jnp.ndarray],
                     xs_valid: Optional[jnp.ndarray], *,
                     dropout_rate: float = 0.0, rng: Optional[jax.Array] = None,
                     deterministic: bool = True, compute_dtype=None,
                     impl: str = "xla", seq_mesh=None) -> jnp.ndarray:
    """Aggregate `xs` (already projected+encoded, (B, N, dm)) into (B, dm).

    A learned special token is prepended (always valid); the decoder output
    at its position is returned (`aggregator.py:58-76`). `cond_seq` may be
    (B, 0, dm).
    """
    b = xs.shape[0]
    special = jnp.broadcast_to(
        params["special_token"].astype(xs.dtype)[None, None, :],
        (b, 1, xs.shape[-1]))
    seq = jnp.concatenate([special, xs], axis=1)
    if xs_valid is not None:
        tgt_valid = jnp.concatenate(
            [jnp.ones((b, 1), bool), xs_valid.astype(bool)], axis=1)
    else:
        tgt_valid = None

    out = transformer_apply(params["transformer"], cond_seq, seq,
                            src_valid=cond_valid, tgt_valid=tgt_valid,
                            rate=dropout_rate, rng=rng,
                            deterministic=deterministic,
                            compute_dtype=compute_dtype, impl=impl,
                            seq_mesh=seq_mesh)
    return out[:, 0]
