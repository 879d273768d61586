"""RecursiveModel: one processor per hierarchy level + a shared LSTM cell.

Pure-pytree equivalent of the reference wrapper (`model/interface.py:83-99`):
`params["procs"][depth]` holds each level's processor and `params["lstm"]`
the single cell shared by all levels.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from paths_tpu.config import Config
from paths_tpu.models.batch import PatchBag
from paths_tpu.models.processor import processor_apply, processor_init
from paths_tpu.nn.lstm import lstm_cell_init


def recursive_init(key, config: Config, dtype=jnp.float32) -> dict:
    mc = config.model_config
    keys = jax.random.split(key, config.num_levels + 1)
    params = {
        "procs": [processor_init(keys[i], mc, config, depth=i, dtype=dtype)
                  for i in range(config.num_levels)],
    }
    if mc.lstm:
        params["lstm"] = lstm_cell_init(
            keys[-1], mc.patch_embed_dim, mc.patch_embed_dim,
            mc.hierarchical_ctx_mlp_hidden_dim, dtype=dtype)
    return params


def recursive_apply(params: dict, config: Config, depth: int, bag: PatchBag, *,
                    rng: Optional[jax.Array] = None,
                    deterministic: bool = True, seq_mesh=None) -> dict:
    """Dispatch to the depth-th processor (`model/interface.py:96-99`)."""
    return processor_apply(
        params["procs"][depth], config.model_config, config, depth, bag,
        lstm_params=params.get("lstm"), rng=rng, deterministic=deterministic,
        seq_mesh=seq_mesh)


def num_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
