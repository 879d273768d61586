"""Post-norm transformer encoder/decoder stacks.

Layer structure matches `torch.nn.Transformer` defaults (norm_first=False,
ReLU feed-forward, dim_feedforward = 4*dim here set by caller, final
LayerNorm after each stack), which is what the reference aggregator wraps
(`model/aggregator.py:25-33`). Dropout sites match torch: attention
weights, after each attention output, inside the FF after ReLU, and after
the FF output.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from paths_tpu.nn.attention import mha_apply, mha_init
from paths_tpu.nn.core import (
    dropout,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
)


def _ff_init(key, dim: int, ff_dim: int, dtype):
    k1, k2 = jax.random.split(key)
    return {"lin1": linear_init(k1, dim, ff_dim, init="xavier", dtype=dtype),
            "lin2": linear_init(k2, ff_dim, dim, init="xavier", dtype=dtype)}


def _ff_apply(params, x, *, rate, rng, deterministic, compute_dtype):
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    h = jax.nn.relu(linear_apply(params["lin1"], x, compute_dtype=compute_dtype))
    h = dropout(h, rate, rng=r1, deterministic=deterministic)
    h = linear_apply(params["lin2"], h, compute_dtype=compute_dtype)
    return h.astype(x.dtype)


# ------------------------------------------------------------------- encoder

def encoder_layer_init(key, dim: int, num_heads: int, ff_dim: int, dtype=jnp.float32):
    ka, kf = jax.random.split(key)
    return {
        "self_attn": mha_init(ka, dim, num_heads, dtype),
        "ff": _ff_init(kf, dim, ff_dim, dtype),
        "norm1": layer_norm_init(dim, dtype),
        "norm2": layer_norm_init(dim, dtype),
    }


def encoder_layer_apply(params, x, *, valid=None, rate=0.0, rng=None,
                        deterministic=True, compute_dtype=None, impl="xla",
                        seq_mesh=None):
    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4
    sa = mha_apply(params["self_attn"], x, x, x, key_valid=valid,
                   dropout_rate=rate, rng=rngs[0], deterministic=deterministic,
                   compute_dtype=compute_dtype, impl=impl, seq_mesh=seq_mesh)
    sa = dropout(sa, rate, rng=rngs[1], deterministic=deterministic)
    x = layer_norm_apply(params["norm1"], x + sa)
    ff = _ff_apply(params["ff"], x, rate=rate, rng=rngs[2],
                   deterministic=deterministic, compute_dtype=compute_dtype)
    ff = dropout(ff, rate, rng=rngs[3], deterministic=deterministic)
    return layer_norm_apply(params["norm2"], x + ff)


# ------------------------------------------------------------------- decoder

def decoder_layer_init(key, dim: int, num_heads: int, ff_dim: int, dtype=jnp.float32):
    ks, kc, kf = jax.random.split(key, 3)
    return {
        "self_attn": mha_init(ks, dim, num_heads, dtype),
        "cross_attn": mha_init(kc, dim, num_heads, dtype),
        "ff": _ff_init(kf, dim, ff_dim, dtype),
        "norm1": layer_norm_init(dim, dtype),
        "norm2": layer_norm_init(dim, dtype),
        "norm3": layer_norm_init(dim, dtype),
    }


def decoder_layer_apply(params, x, memory, *, tgt_valid=None, mem_valid=None,
                        rate=0.0, rng=None, deterministic=True,
                        compute_dtype=None, impl="xla", seq_mesh=None):
    """Post-norm decoder layer. `memory` may have length 0, in which case
    cross-attention contributes exactly zero (torch's empty-memory
    behavior; see `mha_apply`)."""
    rngs = jax.random.split(rng, 6) if rng is not None else [None] * 6
    sa = mha_apply(params["self_attn"], x, x, x, key_valid=tgt_valid,
                   dropout_rate=rate, rng=rngs[0], deterministic=deterministic,
                   compute_dtype=compute_dtype, impl=impl, seq_mesh=seq_mesh)
    sa = dropout(sa, rate, rng=rngs[1], deterministic=deterministic)
    x = layer_norm_apply(params["norm1"], x + sa)

    ca = mha_apply(params["cross_attn"], x, memory, memory, key_valid=mem_valid,
                   dropout_rate=rate, rng=rngs[2], deterministic=deterministic,
                   compute_dtype=compute_dtype)
    ca = dropout(ca, rate, rng=rngs[3], deterministic=deterministic)
    x = layer_norm_apply(params["norm2"], x + ca)

    ff = _ff_apply(params["ff"], x, rate=rate, rng=rngs[4],
                   deterministic=deterministic, compute_dtype=compute_dtype)
    ff = dropout(ff, rate, rng=rngs[5], deterministic=deterministic)
    return layer_norm_apply(params["norm3"], x + ff)


# --------------------------------------------------------------------- stacks

def transformer_init(key, dim: int, num_heads: int, num_layers: int,
                     ff_dim: int, dtype=jnp.float32) -> dict:
    """Encoder-decoder pair with final norms (like nn.Transformer)."""
    keys = jax.random.split(key, 2 * num_layers)
    return {
        "encoder": {
            "layers": [encoder_layer_init(keys[i], dim, num_heads, ff_dim, dtype)
                       for i in range(num_layers)],
            "norm": layer_norm_init(dim, dtype),
        },
        "decoder": {
            "layers": [decoder_layer_init(keys[num_layers + i], dim, num_heads,
                                          ff_dim, dtype)
                       for i in range(num_layers)],
            "norm": layer_norm_init(dim, dtype),
        },
    }


def transformer_apply(params, src, tgt, *, src_valid=None, tgt_valid=None,
                      rate=0.0, rng=None, deterministic=True,
                      compute_dtype=None, impl="xla", seq_mesh=None):
    """Full encoder-decoder forward. `src` may be zero-length (B, 0, D)."""
    n_enc = len(params["encoder"]["layers"])
    n_dec = len(params["decoder"]["layers"])
    rngs = (jax.random.split(rng, n_enc + n_dec) if rng is not None
            else [None] * (n_enc + n_dec))

    memory = src
    if src.shape[1] > 0:
        for i, layer in enumerate(params["encoder"]["layers"]):
            memory = encoder_layer_apply(layer, memory, valid=src_valid, rate=rate,
                                         rng=rngs[i], deterministic=deterministic,
                                         compute_dtype=compute_dtype, impl=impl,
                                         seq_mesh=seq_mesh)
        memory = layer_norm_apply(params["encoder"]["norm"], memory)

    x = tgt
    for i, layer in enumerate(params["decoder"]["layers"]):
        x = decoder_layer_apply(layer, x, memory, tgt_valid=tgt_valid,
                                mem_valid=src_valid, rate=rate,
                                rng=rngs[n_enc + i], deterministic=deterministic,
                                compute_dtype=compute_dtype, impl=impl,
                                seq_mesh=seq_mesh)
    return layer_norm_apply(params["decoder"]["norm"], x)
