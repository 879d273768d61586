"""`config.engine="auto"`: HBM-estimate-driven fused/streaming choice
(engine/auto.py). Both sides of the threshold are exercised end to end
through `train_loop` by pinning the HBM budget."""
import os

import numpy as np
import pytest

from paths_tpu.config import Config
from paths_tpu.data.dataset import load_splits
from paths_tpu.data.synthetic import make_synthetic_metadata, make_synthetic_store
from paths_tpu.engine.auto import (estimate_fused_batch_bytes, hbm_bytes,
                                   resolve_engine)
from paths_tpu.parallel.mesh import make_mesh
from paths_tpu.train.loop import train_loop
from test_train_loop import tiny_train_config


def _pads(cfg, n0=96, rows=64, hw=(8, 8)):
    L = cfg.num_levels
    return {"n0": n0, "rows": [0] + [rows] * (L - 1),
            "grid_hw": [(0, 0)] + [hw] * (L - 1)}


def test_resolve_engine_passthrough(tmp_path):
    cfg = tiny_train_config(str(tmp_path))
    assert resolve_engine(cfg, _pads(cfg), 4, hbm=1 << 40) == "fused"
    cfg.engine = "streaming"
    assert resolve_engine(cfg, _pads(cfg), 4, hbm=1 << 40) == "streaming"


def test_resolve_engine_threshold(tmp_path):
    """fused above the budget line, streaming below it; no pads ->
    streaming (never OOMs)."""
    cfg = tiny_train_config(str(tmp_path), engine="auto")
    pads = _pads(cfg)
    batch = estimate_fused_batch_bytes(cfg, pads, 4)
    assert batch > 0
    assert resolve_engine(cfg, pads, 4, hbm=1 << 40) == "fused"
    assert resolve_engine(cfg, pads, 4, hbm=0) == "streaming"
    assert resolve_engine(cfg, None, 4) == "streaming"


def test_estimate_scales_with_shapes(tmp_path):
    """The estimate moves in the right direction with batch size and
    table widths — the quantities that actually fill HBM."""
    cfg = tiny_train_config(str(tmp_path), engine="auto")
    small = estimate_fused_batch_bytes(cfg, _pads(cfg), 4)
    assert estimate_fused_batch_bytes(cfg, _pads(cfg), 8) > small
    assert estimate_fused_batch_bytes(
        cfg, _pads(cfg, n0=4096, rows=4096), 4) > small


def test_hbm_bytes_default():
    assert hbm_bytes() > 0


@pytest.mark.parametrize("hbm,expect_metric", [
    (1 << 40, "fused"), (1, "streaming")])
def test_train_loop_auto_both_sides(tmp_path, monkeypatch, capsys,
                                    hbm, expect_metric):
    """engine=auto trains end to end on BOTH sides of the threshold; the
    decision is logged."""
    import paths_tpu.engine.auto as auto_mod

    monkeypatch.setattr(auto_mod, "hbm_bytes", lambda default=0: hbm)
    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp, engine="auto")
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=8,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    train, val, test = load_splits([0.5, 0.25, 0.25], seed=0, config=cfg)
    stats = train_loop(cfg, os.path.join(tmp, "m"), train, val, test,
                       mesh=make_mesh(1), verbose=True)
    assert np.isfinite(stats["train_loss"][cfg.num_epochs])
    out = capsys.readouterr().out
    assert f"-> {expect_metric}" in out
