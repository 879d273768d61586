"""Reference-user migration paths: torch model.pt checkpoints and .pt
feature grids load transparently; subtype task trains end to end."""
import os

import jax
import numpy as np
import torch

from helpers_torch import TorchRecursive, to_numpy_sd
from paths_tpu.data.dataset import load_splits
from paths_tpu.data.synthetic import make_synthetic_metadata, make_synthetic_store
from paths_tpu.models.recursive import recursive_init
from paths_tpu.parallel.mesh import make_mesh
from paths_tpu.train.loop import train_loop
from paths_tpu.train.state import load_state
from test_model_parity import small_config, torch_kwargs
from test_train_loop import tiny_train_config


def test_load_reference_torch_checkpoint(tmp_path):
    """A reference `model.pt` (state_dict) in the model dir is loaded via
    the converter when no native checkpoint exists (train/state.py)."""
    cfg = small_config()
    torch.manual_seed(0)
    tmodel = TorchRecursive(cfg.num_levels, lstm=True, **torch_kwargs(cfg))
    torch.save(tmodel.state_dict(), os.path.join(str(tmp_path), "model.pt"))

    params = recursive_init(jax.random.PRNGKey(42), cfg)
    before = np.asarray(params["procs"][0]["classification"]["w"]).copy()
    params, _, stats = load_state(str(tmp_path), params, config=cfg)

    expect = tmodel.procs[0].classification_layer.weight.detach().numpy().T
    np.testing.assert_allclose(
        np.asarray(params["procs"][0]["classification"]["w"]), expect,
        atol=1e-6)
    assert not np.allclose(before, expect)
    assert stats == {"epoch": 1}  # no train_stats -> fresh run


def test_load_reference_train_stats_pkl(tmp_path):
    """A reference model dir's pickled `train_stats.pkl`
    (`utils.py:169-198`) resumes the epoch counter and metric histories;
    a native train_stats.json takes precedence when both exist."""
    import json
    import pickle

    cfg = small_config()
    ref_stats = {"epoch": 17, "train_loss": {1: 1.5, 16: 0.2},
                 "train_c-index": {16: 0.9}, "val_loss": {}}
    with open(os.path.join(str(tmp_path), "train_stats.pkl"), "wb") as f:
        pickle.dump(ref_stats, f)

    params = recursive_init(jax.random.PRNGKey(0), cfg)
    _, _, stats = load_state(str(tmp_path), params, config=cfg)
    assert stats == ref_stats

    with open(os.path.join(str(tmp_path), "train_stats.json"), "w") as f:
        json.dump({"epoch": 3, "train_loss": {"2": 0.7}}, f)
    _, _, stats = load_state(str(tmp_path), params, config=cfg)
    assert stats == {"epoch": 3, "train_loss": {2: 0.7}}


def test_native_checkpoint_preferred_over_torch(tmp_path):
    """model.npz wins when both formats are present."""
    from paths_tpu.train.state import save_state

    cfg = small_config()
    params_a = recursive_init(jax.random.PRNGKey(1), cfg)
    save_state(str(tmp_path), params_a)
    torch.manual_seed(0)
    tmodel = TorchRecursive(cfg.num_levels, lstm=True, **torch_kwargs(cfg))
    torch.save(tmodel.state_dict(), os.path.join(str(tmp_path), "model.pt"))

    params = recursive_init(jax.random.PRNGKey(2), cfg)
    params, _, _ = load_state(str(tmp_path), params, config=cfg)
    np.testing.assert_array_equal(
        np.asarray(params["procs"][0]["classification"]["w"]),
        np.asarray(params_a["procs"][0]["classification"]["w"]))


def test_subtype_training_end_to_end(tmp_path):
    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp, task="subtype_classification",
                            filter_to_subtypes=["IDC", "ILC"], num_epochs=2)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=10,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids, subtypes=["IDC", "ILC"])
    train, val, test = load_splits([0.6, 0.2, 0.2], seed=0, config=cfg)
    stats = train_loop(cfg, os.path.join(tmp, "m"), train, val, test,
                       mesh=make_mesh(1), verbose=False)
    assert np.isfinite(stats["train_loss"][2])
    assert "train_AUC" in stats and 0.0 <= stats["train_AUC"][2] <= 1.0


def _assert_sd_bitwise_equal(a, b):
    assert set(a) == set(b), (set(a) ^ set(b))
    for k in a:
        x, y = np.asarray(a[k]), np.asarray(b[k])
        assert x.shape == y.shape and x.dtype == y.dtype, k
        np.testing.assert_array_equal(x, y, err_msg=k)


def test_export_torch_roundtrip_bitwise():
    """torch -> jax -> torch is bitwise: `recursive_to_torch` is the exact
    inverse of `recursive_from_torch` (transposes only, no arithmetic)."""
    from paths_tpu.convert import recursive_from_torch, recursive_to_torch

    for lstm in (True, False):
        cfg = small_config(lstm=lstm)
        torch.manual_seed(5)
        tmodel = TorchRecursive(cfg.num_levels, lstm=lstm,
                                **torch_kwargs(cfg))
        sd = to_numpy_sd(tmodel)
        back = recursive_to_torch(recursive_from_torch(sd, cfg), cfg)
        _assert_sd_bitwise_equal(sd, back)


def test_save_torch_checkpoint_loads_back(tmp_path):
    """`save_torch_checkpoint` writes a model.pt our own loader (and the
    mirror's strict load_state_dict) accepts, reproducing the params."""
    from paths_tpu.convert import (load_torch_checkpoint,
                                   save_torch_checkpoint)

    cfg = small_config()
    params = recursive_init(jax.random.PRNGKey(9), cfg)
    path = os.path.join(str(tmp_path), "model.pt")
    save_torch_checkpoint(path, params, cfg)

    # strict load into the torch mirror: exact key space
    tmodel = TorchRecursive(cfg.num_levels, lstm=True, **torch_kwargs(cfg))
    tmodel.load_state_dict(torch.load(path, weights_only=True), strict=True)

    # and our loader round-trips the values bitwise
    again = load_torch_checkpoint(path, cfg)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(again)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        if hasattr(x, "shape"):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
