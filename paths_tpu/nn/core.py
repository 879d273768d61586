"""Minimal parameter-pytree neural-net layers.

Parameters are plain nested dicts of jnp arrays (no framework Module
objects): full control over layout makes torch-parity tests and weight
conversion trivial, and pure functions compose cleanly under jit / grad /
vmap / shard_map.

Weight layout: Linear weights are stored (in_features, out_features) so the
forward is `x @ w + b`. Torch checkpoints (out, in) must be transposed on
conversion.

Initialization mirrors torch defaults (kaiming-uniform weights with
a=sqrt(5), uniform bias in ±1/sqrt(fan_in)) so training dynamics match the
reference; transformer blocks override weights with Xavier-uniform exactly
like `nn.Transformer._reset_parameters`.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


class Static:
    """Non-array metadata stored inside a param pytree (e.g. head counts).

    Registered with no children so jax.grad / optax never see it as a leaf;
    the value rides along as aux data and participates in tree equality.
    """

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __repr__(self):
        return f"Static({self.value!r})"

    def __eq__(self, other):
        return isinstance(other, Static) and self.value == other.value

    def __hash__(self):
        return hash(("Static", self.value))


jax.tree_util.register_pytree_node(
    Static, lambda s: ((), s.value), lambda aux, _: Static(aux))


# ---------------------------------------------------------------- initializers

def torch_linear_uniform(key, in_features: int, out_features: int, dtype=jnp.float32):
    """Torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
    both weight and bias (kaiming_uniform(a=sqrt(5)) reduces to this)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    w = jax.random.uniform(kw, (in_features, out_features), dtype, -bound, bound)
    b = jax.random.uniform(kb, (out_features,), dtype, -bound, bound)
    return w, b


def xavier_uniform(key, in_features: int, out_features: int, dtype=jnp.float32):
    a = math.sqrt(6.0 / (in_features + out_features))
    return jax.random.uniform(key, (in_features, out_features), dtype, -a, a)


# --------------------------------------------------------------------- linear

def linear_init(key, in_features: int, out_features: int, *, init: str = "torch",
                dtype=jnp.float32) -> dict:
    if init == "torch":
        w, b = torch_linear_uniform(key, in_features, out_features, dtype)
    elif init == "xavier":
        # xavier weight, zero bias (transformer-style)
        w = xavier_uniform(key, in_features, out_features, dtype)
        b = jnp.zeros((out_features,), dtype)
    else:
        raise ValueError(init)
    return {"w": w, "b": b}


def linear_apply(params: dict, x: jnp.ndarray, *, compute_dtype=None) -> jnp.ndarray:
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        b = b.astype(compute_dtype)
    return x @ w + b


# ------------------------------------------------------------------------ mlp

def mlp_init(key, dims: Sequence[int], *, init: str = "torch", dtype=jnp.float32) -> dict:
    """Stack of Linear layers with ReLU between them (applied in mlp_apply)."""
    keys = jax.random.split(key, len(dims) - 1)
    return {"layers": [linear_init(k, dims[i], dims[i + 1], init=init, dtype=dtype)
                       for i, k in enumerate(keys)]}


def mlp_apply(params: dict, x: jnp.ndarray, *, compute_dtype=None) -> jnp.ndarray:
    layers = params["layers"]
    for i, layer in enumerate(layers):
        x = linear_apply(layer, x, compute_dtype=compute_dtype)
        if i + 1 < len(layers):
            x = jax.nn.relu(x)
    return x


# ----------------------------------------------------------------- layer norm

def layer_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm_apply(params: dict, x: jnp.ndarray, *, eps: float = 1e-5) -> jnp.ndarray:
    # normalize in fp32 for stability regardless of compute dtype
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


# -------------------------------------------------------------------- dropout

def dropout(x: jnp.ndarray, rate: float, *, rng: Optional[jax.Array],
            deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    assert rng is not None, "dropout in train mode requires an rng"
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
