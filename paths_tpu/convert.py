"""Convert reference (PyTorch) PATHS checkpoints into paths_tpu params.

The reference saves `model.pt` = `RecursiveModel.state_dict()`
(`utils.py:169-178`). This module maps that flat key space onto our nested
param pytrees so a user can bring a trained reference model across.

Torch Linear weights are (out, in) and are transposed to our (in, out)
layout; `nn.MultiheadAttention`'s packed `in_proj_weight` (3d, d) is split
into q/k/v. No torch import is required — pass a mapping of numpy arrays
(e.g. `{k: v.numpy() for k, v in torch.load(p).items()}`).
"""
from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from paths_tpu.config import Config
from paths_tpu.nn.core import Static


def _lin(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {"w": jnp.asarray(np.asarray(sd[prefix + ".weight"]).T),
            "b": jnp.asarray(np.asarray(sd[prefix + ".bias"]))}


def _norm(sd, prefix):
    return {"scale": jnp.asarray(np.asarray(sd[prefix + ".weight"])),
            "bias": jnp.asarray(np.asarray(sd[prefix + ".bias"]))}


def _mha(sd, prefix, num_heads: int) -> dict:
    w = np.asarray(sd[prefix + ".in_proj_weight"])
    b = np.asarray(sd[prefix + ".in_proj_bias"])
    d = w.shape[1]
    q, k, v = w[:d], w[d:2 * d], w[2 * d:]
    qb, kb, vb = b[:d], b[d:2 * d], b[2 * d:]
    return {
        "q": {"w": jnp.asarray(q.T), "b": jnp.asarray(qb)},
        "k": {"w": jnp.asarray(k.T), "b": jnp.asarray(kb)},
        "v": {"w": jnp.asarray(v.T), "b": jnp.asarray(vb)},
        "out": _lin(sd, prefix + ".out_proj"),
        "num_heads": Static(num_heads),
    }


def _enc_layer(sd, p, heads):
    return {
        "self_attn": _mha(sd, p + ".self_attn", heads),
        "ff": {"lin1": _lin(sd, p + ".linear1"), "lin2": _lin(sd, p + ".linear2")},
        "norm1": _norm(sd, p + ".norm1"),
        "norm2": _norm(sd, p + ".norm2"),
    }


def _dec_layer(sd, p, heads):
    return {
        "self_attn": _mha(sd, p + ".self_attn", heads),
        "cross_attn": _mha(sd, p + ".multihead_attn", heads),
        "ff": {"lin1": _lin(sd, p + ".linear1"), "lin2": _lin(sd, p + ".linear2")},
        "norm1": _norm(sd, p + ".norm1"),
        "norm2": _norm(sd, p + ".norm2"),
        "norm3": _norm(sd, p + ".norm3"),
    }


def _mlp(sd, prefix, indices=(0, 2)) -> dict:
    """torch nn.Sequential(Linear, ReLU, Linear, ...) -> our mlp params."""
    return {"layers": [_lin(sd, f"{prefix}.{i}") for i in indices]}


def aggregator_from_torch(sd, prefix, heads: int, layers: int) -> dict:
    t = prefix + ".transformer"
    return {
        "proj_in": _lin(sd, prefix + ".proj_in"),
        "special_token": jnp.asarray(np.asarray(sd[prefix + ".special_token"])),
        "transformer": {
            "encoder": {
                "layers": [_enc_layer(sd, f"{t}.encoder.layers.{j}", heads)
                           for j in range(layers)],
                "norm": _norm(sd, t + ".encoder.norm"),
            },
            "decoder": {
                "layers": [_dec_layer(sd, f"{t}.decoder.layers.{j}", heads)
                           for j in range(layers)],
                "norm": _norm(sd, t + ".decoder.norm"),
            },
        },
    }


def lstm_from_torch(sd, prefix="lstm") -> dict:
    # Each gate is nn.Sequential(Linear, activation) -> key `<gate>.0`
    dot = prefix + "." if prefix else ""
    return {name: _lin(sd, f"{dot}{name}.0")
            for name in ["forget_gate", "remember_gate", "remember_map",
                         "out_select_gate", "mem_to_out"]}


def recursive_from_torch(state_dict: Mapping[str, np.ndarray],
                         config: Config) -> dict:
    """Full RecursiveModel state_dict -> our params pytree."""
    mc = config.model_config
    sd = state_dict
    params = {"procs": []}
    for i in range(config.num_levels):
        p = f"procs.{i}"
        proc = {
            "classification": _lin(sd, p + ".classification_layer"),
            "importance_mlp": _mlp(sd, p + ".importance_mlp"),
            "agg": aggregator_from_torch(sd, p + ".global_agg",
                                         mc.trans_heads, mc.trans_layers),
        }
        if not mc.lstm:
            proc["hctx_mlp"] = _mlp(sd, p + ".hctx_mlp")
        params["procs"].append(proc)
    if mc.lstm:
        params["lstm"] = lstm_from_torch(sd)
    return params


def load_torch_checkpoint(path: str, config: Config) -> dict:
    """Load a reference `model.pt` file. Requires torch at call time."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return recursive_from_torch({k: v.numpy() for k, v in sd.items()}, config)
