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


# ---------------------------------------------------------------------------
# Inverse direction: our params pytree -> reference `model.pt` state_dict.
#
# The reference loads checkpoints with `model.load_state_dict(torch.load(p))`
# (`utils.py:189`), i.e. strict key matching against
# `RecursiveModel.state_dict()` (`model/interface.py:83-94`). This exporter
# emits exactly that key space so a paths_tpu-trained model is a drop-in
# *producer* for the reference ecosystem, not just a consumer. Every mapping
# is the bit-exact inverse of the loaders above (transposes only, no
# arithmetic), so torch -> jax -> torch round-trips bitwise.
# ---------------------------------------------------------------------------


def _lin_out(out: dict, prefix: str, p: dict) -> None:
    out[prefix + ".weight"] = np.asarray(p["w"]).T
    out[prefix + ".bias"] = np.asarray(p["b"])


def _norm_out(out, prefix, p):
    out[prefix + ".weight"] = np.asarray(p["scale"])
    out[prefix + ".bias"] = np.asarray(p["bias"])


def _mha_out(out, prefix, p):
    q, k, v = (np.asarray(p[n]["w"]).T for n in ("q", "k", "v"))
    qb, kb, vb = (np.asarray(p[n]["b"]) for n in ("q", "k", "v"))
    out[prefix + ".in_proj_weight"] = np.concatenate([q, k, v], axis=0)
    out[prefix + ".in_proj_bias"] = np.concatenate([qb, kb, vb], axis=0)
    _lin_out(out, prefix + ".out_proj", p["out"])


def _enc_layer_out(out, prefix, p):
    _mha_out(out, prefix + ".self_attn", p["self_attn"])
    _lin_out(out, prefix + ".linear1", p["ff"]["lin1"])
    _lin_out(out, prefix + ".linear2", p["ff"]["lin2"])
    _norm_out(out, prefix + ".norm1", p["norm1"])
    _norm_out(out, prefix + ".norm2", p["norm2"])


def _dec_layer_out(out, prefix, p):
    _mha_out(out, prefix + ".self_attn", p["self_attn"])
    _mha_out(out, prefix + ".multihead_attn", p["cross_attn"])
    _lin_out(out, prefix + ".linear1", p["ff"]["lin1"])
    _lin_out(out, prefix + ".linear2", p["ff"]["lin2"])
    _norm_out(out, prefix + ".norm1", p["norm1"])
    _norm_out(out, prefix + ".norm2", p["norm2"])
    _norm_out(out, prefix + ".norm3", p["norm3"])


def _mlp_out(out, prefix, p, indices=(0, 2)):
    for i, lin in zip(indices, p["layers"]):
        _lin_out(out, f"{prefix}.{i}", lin)


def _aggregator_out(out, prefix, p):
    _lin_out(out, prefix + ".proj_in", p["proj_in"])
    out[prefix + ".special_token"] = np.asarray(p["special_token"])
    t = prefix + ".transformer"
    tr = p["transformer"]
    for j, lp in enumerate(tr["encoder"]["layers"]):
        _enc_layer_out(out, f"{t}.encoder.layers.{j}", lp)
    _norm_out(out, t + ".encoder.norm", tr["encoder"]["norm"])
    for j, lp in enumerate(tr["decoder"]["layers"]):
        _dec_layer_out(out, f"{t}.decoder.layers.{j}", lp)
    _norm_out(out, t + ".decoder.norm", tr["decoder"]["norm"])


def recursive_to_torch(params: dict, config: Config) -> dict:
    """Our params pytree -> flat reference state_dict of numpy arrays.

    Exact inverse of `recursive_from_torch`: produces the key space of the
    reference `RecursiveModel.state_dict()` (PATHSProcessor params at
    `model/paths.py:34-57`, aggregator at `model/aggregator.py:22-35`,
    shared LSTM gates at `model/interface.py:91` + `model/lstm.py`).
    """
    mc = config.model_config
    out: dict = {}
    for i, proc in enumerate(params["procs"]):
        p = f"procs.{i}"
        _lin_out(out, p + ".classification_layer", proc["classification"])
        _mlp_out(out, p + ".importance_mlp", proc["importance_mlp"])
        if not mc.lstm:
            _mlp_out(out, p + ".hctx_mlp", proc["hctx_mlp"])
        _aggregator_out(out, p + ".global_agg", proc["agg"])
    if mc.lstm:
        for name in ["forget_gate", "remember_gate", "remember_map",
                     "out_select_gate", "mem_to_out"]:
            _lin_out(out, f"lstm.{name}.0", params["lstm"][name])
    return out


def save_torch_checkpoint(path: str, params: dict, config: Config) -> None:
    """Write a reference-loadable `model.pt` (`utils.py:171-175` contract).

    Requires torch at call time; tensors are float32 CPU, matching what
    `torch.save(model.state_dict())` produces on the reference side.
    """
    import torch

    # copy: jax buffers export as read-only numpy views, which torch rejects
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in recursive_to_torch(params, config).items()}
    torch.save(sd, path)
