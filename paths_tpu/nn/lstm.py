"""Hand-rolled LSTM cell shared across hierarchy levels.

Gate math matches the reference's custom cell (`model/interface.py:10-58`),
which is NOT a textbook LSTM: the memory update uses the *previous* output
h(t-1) in all gates, and the output gate sees only (h, x) while the
candidate output tanh-maps the *new* memory:

    xh     = concat(x, h)
    c'     = c * sigmoid(Wf xh) + sigmoid(Wr xh) * tanh(Wm xh)
    h'     = sigmoid(Wo xh) * tanh(Wc c')

In PATHS, input/output dim is the patch-embedding dim and the memory dim is
`hierarchical_ctx_mlp_hidden_dim` (`model/interface.py:90-92`). The cell is
applied per patch per level — the "sequence" axis is the magnification
hierarchy, not the bag.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from paths_tpu.nn.core import linear_apply, linear_init


def lstm_cell_init(key, input_dim: int, output_dim: int, hidden_dim: int,
                   dtype=jnp.float32) -> dict:
    kf, kr, km, ko, kc = jax.random.split(key, 5)
    xh = input_dim + output_dim
    return {
        "forget_gate": linear_init(kf, xh, hidden_dim, dtype=dtype),
        "remember_gate": linear_init(kr, xh, hidden_dim, dtype=dtype),
        "remember_map": linear_init(km, xh, hidden_dim, dtype=dtype),
        "out_select_gate": linear_init(ko, xh, output_dim, dtype=dtype),
        "mem_to_out": linear_init(kc, hidden_dim, output_dim, dtype=dtype),
    }


def lstm_cell_apply(params: dict, xs: jnp.ndarray, hs: jnp.ndarray,
                    cs: jnp.ndarray, *, compute_dtype=None):
    """One cell step. All of xs/hs/cs are (..., dim); returns (h', c').

    The four gates that read `concat(x, h)` are evaluated as ONE packed
    matmul (their weights concatenated along the output axis) — a single
    large MXU op instead of four narrow ones; XLA CSEs the weight concat
    across steps. Numerics are unchanged (same products, same order).
    """
    cd = compute_dtype
    xhs = jnp.concatenate([xs, hs], axis=-1)
    if cd is not None:
        xhs = xhs.astype(cd)

    names = ["forget_gate", "remember_gate", "remember_map", "out_select_gate"]
    w = jnp.concatenate([params[n]["w"] for n in names], axis=1)
    b = jnp.concatenate([params[n]["b"] for n in names], axis=0)
    if cd is not None:
        w, b = w.astype(cd), b.astype(cd)
    packed = xhs @ w + b

    cdim = params["forget_gate"]["b"].shape[0]
    f = packed[..., :cdim]
    r = packed[..., cdim:2 * cdim]
    rm = packed[..., 2 * cdim:3 * cdim]
    o = packed[..., 3 * cdim:]

    cs = cs * jax.nn.sigmoid(f)
    cs = cs + jax.nn.sigmoid(r) * jnp.tanh(rm)
    hs = jax.nn.sigmoid(o) * jnp.tanh(
        linear_apply(params["mem_to_out"], cs, compute_dtype=cd))
    return hs.astype(xs.dtype), cs.astype(xs.dtype)
