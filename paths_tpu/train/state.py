"""Checkpointing: params + optimizer state + training history.

Reference contract (`utils.py:169-198`): `save_state` writes the model and
a `train_stats` dict (epoch + per-epoch metric histories) into the model
directory; `load_state` restores both, returning `{"epoch": 1}` on a fresh
directory; the train loop resumes from `train_stats["epoch"]`.

Formats:
  * `model.npz` / `opt.npz` (default; flat key-path -> array; robust,
    dependency-free, works for any params pytree) + `train_stats.json`
  * `backend="orbax"`: an Orbax StandardCheckpointer tree under
    `<root>/orbax` — the canonical TPU checkpoint layout (sharded-array
    aware, multi-host safe), for deployments that feed checkpoints to
    other JAX tooling
A torch `model.pt` present in the directory (a reference checkpoint) is
loaded transparently via `paths_tpu.convert`. `load_state` auto-detects
whichever format is present.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from paths_tpu.config import Config


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(template, flat: Dict[str, np.ndarray]):
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in leaves_with_path:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        assert key in flat, f"checkpoint missing key {key}"
        arr = flat[key]
        assert arr.shape == np.shape(leaf), (
            f"shape mismatch for {key}: checkpoint {arr.shape} vs model "
            f"{np.shape(leaf)}")
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _orbax_dir(root_path: str) -> str:
    return os.path.join(os.path.abspath(root_path), "orbax")


def _orbax_checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_state(root_path: str, params, opt_state=None,
               train_stats: Optional[dict] = None,
               backend: str = "npz") -> None:
    print(f"Saving to {root_path}...")
    os.makedirs(root_path, exist_ok=True)
    if backend == "orbax":
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        ckpt = _orbax_checkpointer()
        ckpt.save(_orbax_dir(root_path), state, force=True)
        ckpt.wait_until_finished()
    else:
        np.savez(os.path.join(root_path, "model.npz"), **_flatten(params))
        if opt_state is not None:
            np.savez(os.path.join(root_path, "opt.npz"),
                     **_flatten(opt_state))
    if train_stats is not None:
        with open(os.path.join(root_path, "train_stats.json"), "w") as f:
            json.dump(train_stats, f)


def load_state(root_path: str, params, opt_state=None,
               config: Optional[Config] = None) -> Tuple:
    """Restore (params, opt_state, train_stats). Missing files leave the
    passed-in values untouched (reference `utils.py:181-198`)."""
    npz_path = os.path.join(root_path, "model.npz")
    pt_path = os.path.join(root_path, "model.pt")

    # When BOTH formats exist (e.g. checkpoint_backend switched between
    # runs), prefer the configured backend, falling back to newer mtime —
    # never silently resume from a stale checkpoint of the other format.
    use_orbax = os.path.isdir(_orbax_dir(root_path))
    if use_orbax and os.path.isfile(npz_path):
        backend = getattr(config, "checkpoint_backend", None)
        if backend in ("npz", "orbax"):
            use_orbax = backend == "orbax"
        else:
            def newest(p):
                return max((os.path.getmtime(os.path.join(r, f))
                            for r, _, fs in os.walk(p) for f in fs),
                           default=os.path.getmtime(p)) if os.path.isdir(p) \
                    else os.path.getmtime(p)
            use_orbax = newest(_orbax_dir(root_path)) >= newest(npz_path)
        print(f"Both orbax/ and model.npz present in {root_path}; "
              f"loading {'orbax' if use_orbax else 'npz'}")

    if use_orbax:
        import orbax.checkpoint as ocp

        ckpt = _orbax_checkpointer()
        saved = ckpt.metadata(_orbax_dir(root_path)).item_metadata.tree
        abstract = {"params": jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, params)}
        has_opt = "opt_state" in saved
        if opt_state is not None and has_opt:
            abstract["opt_state"] = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, opt_state)
        elif has_opt:
            # orbax restore templates must match the SAVED tree exactly;
            # inference callers pass opt_state=None, so reconstruct the
            # saved opt_state's abstract shape from checkpoint metadata
            # and discard the arrays after restore
            abstract["opt_state"] = jax.tree_util.tree_map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype),
                saved["opt_state"])
        restored = ckpt.restore(_orbax_dir(root_path), abstract)
        params = restored["params"]
        if opt_state is not None and has_opt:
            opt_state = restored["opt_state"]
    elif os.path.isfile(npz_path):
        with np.load(npz_path) as z:
            params = _unflatten(params, dict(z.items()))
    elif os.path.isfile(pt_path):
        assert config is not None, "loading a torch checkpoint needs a config"
        from paths_tpu.convert import load_torch_checkpoint

        print(f"Loading reference torch checkpoint {pt_path}")
        params = load_torch_checkpoint(pt_path, config)
    else:
        print(f"{npz_path} not found, not loading model state!")

    opt_path = os.path.join(root_path, "opt.npz")
    if not use_orbax and opt_state is not None and os.path.isfile(opt_path):
        with np.load(opt_path) as z:
            opt_state = _unflatten(opt_state, dict(z.items()))

    stats_path = os.path.join(root_path, "train_stats.json")
    pkl_path = os.path.join(root_path, "train_stats.pkl")
    if os.path.isfile(stats_path):
        with open(stats_path) as f:
            train_stats = json.load(f)
        # json stringifies int epoch keys in metric histories
        for k, v in train_stats.items():
            if isinstance(v, dict):
                train_stats[k] = {int(e): x for e, x in v.items()}
    elif os.path.isfile(pkl_path):
        # a reference-format model dir (`utils.py:169-198` pickles the
        # stats dict): resume continues from ITS epoch counter and metric
        # histories instead of silently restarting at epoch 1; our next
        # save writes train_stats.json, which takes precedence from then
        # on
        import pickle

        with open(pkl_path, "rb") as f:
            train_stats = pickle.load(f)
        print(f"Loaded reference train stats {pkl_path} "
              f"(epoch {train_stats.get('epoch')})")
    else:
        print("No train stats found, assuming first run")
        train_stats = {"epoch": 1}
    return params, opt_state, train_stats
