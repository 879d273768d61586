"""Masking utilities for statically-shaped padded patch bags.

The reference handles variable bag lengths with `num_ims` + derived index
masks (`data_utils/patch_batch.py:66-70`, `utils.py:97-115`). Here every
bag is padded to a static size and carries a boolean validity mask; these
helpers implement the equivalent semantics as branchless ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large finite negative; avoids NaN from (-inf) - (-inf)


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) boolean validity mask.

    True marks a real element (the complement of the reference's
    `padding_mask`, `utils.py:97-103`, which marks padding).
    """
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def masked_topk(values: jnp.ndarray, mask: jnp.ndarray, k: int):
    """Top-k over the last axis considering only `mask`-valid entries.

    Returns `(indices, valid)` where `indices` is (..., k) int32 and
    `valid` is (..., k) bool — False for slots beyond the number of valid
    entries (the reference's `count = min(n, keep_patches)` semantics,
    `data_utils/slide.py:296`).

    Invalid entries are pushed to -inf so they are selected only after all
    valid entries; ties among equal values resolve to the lower index, the
    same convention as `jax.lax.top_k` and (in practice) `torch.topk`.
    """
    masked = jnp.where(mask, values, NEG_INF)
    _, idx = jax.lax.top_k(masked, k)
    valid = jnp.take_along_axis(mask, idx, axis=-1)
    return idx.astype(jnp.int32), valid


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray, axis=None):
    """Mean over valid entries only; 0 where no entry is valid."""
    m = mask.astype(values.dtype)
    s = jnp.sum(values * m, axis=axis)
    n = jnp.sum(m, axis=axis)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), 0.0)
