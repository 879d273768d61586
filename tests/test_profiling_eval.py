"""Profiling helpers + standalone eval CLI."""
import os

import jax.numpy as jnp
import numpy as np

from paths_tpu.profiling import step_timer, time_fn


def test_time_fn():
    f = lambda x: jnp.sum(x * x)
    stats = time_fn(f, jnp.ones(128), warmup=1, iters=3)
    assert stats["mean_s"] > 0 and stats["min_s"] <= stats["max_s"]


def test_step_timer():
    t = step_timer()
    with t("data"):
        pass
    with t("step"):
        pass
    s = t.summary()
    assert "data_s" in s and "step_frac" in s
    assert abs(s["data_frac"] + s["step_frac"] - 1.0) < 1e-6


def test_predict_cli(tmp_path):
    from paths_tpu.cli.predict import main as predict_main
    from paths_tpu.cli.train import main as train_main
    from paths_tpu.data.synthetic import (
        make_synthetic_metadata,
        make_synthetic_store,
    )
    from test_train_loop import tiny_train_config

    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp, num_epochs=1)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=8,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    mdir = os.path.join(tmp, "model")
    os.makedirs(mdir)
    cfg.save(mdir)
    train_main(["-m", mdir, "--no-wandb"])

    out_csv = os.path.join(tmp, "preds.csv")
    rows = predict_main(["-m", mdir, "--split", "test", "-o", out_csv])
    lines = open(out_csv).read().splitlines()
    assert lines[0] == "slide_id,risk,hazard_0,hazard_1"
    assert len(lines) == len(rows) + 1 and len(rows) >= 1
    # risk equals -sum cumprod(1-h)
    _, risk, h0, h1 = lines[1].split(",")
    s = np.cumprod([1 - float(h0), 1 - float(h1)])
    assert abs(float(risk) + s.sum()) < 1e-4

    # --artifact path: the frozen StableHLO program produces the same
    # predictions for the same slides (row order may differ: the
    # artifact path predicts by slide id)
    from paths_tpu.cli.export import main as export_main

    art = os.path.join(tmp, "model.shlo")
    export_main(["-m", mdir, "-o", art, "--freeze"])
    art_csv = os.path.join(tmp, "preds_artifact.csv")
    predict_main(["-m", mdir, "--split", "test", "-o", art_csv,
                  "--artifact", art])
    live = {l.split(",")[0]: l for l in lines[1:]}
    art_lines = open(art_csv).read().splitlines()
    assert art_lines[0] == lines[0]
    got = {l.split(",")[0]: l for l in art_lines[1:]}
    assert set(got) == set(live)
    for sid in live:
        lv = [float(x) for x in live[sid].split(",")[1:]]
        av = [float(x) for x in got[sid].split(",")[1:]]
        np.testing.assert_allclose(av, lv, atol=2e-5)


def test_evaluate_cli(tmp_path):
    from paths_tpu.cli.train import main as train_main
    from paths_tpu.cli.evaluate import main as eval_main
    from paths_tpu.data.synthetic import (
        make_synthetic_metadata,
        make_synthetic_store,
    )
    from test_train_loop import tiny_train_config

    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp, num_epochs=1)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=8,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    mdir = os.path.join(tmp, "model")
    os.makedirs(mdir)
    cfg.save(mdir)

    train_main(["-m", mdir, "--no-wandb"])
    out = eval_main(["-m", mdir, "--split", "test"])
    assert "test_c-index" in out and np.isfinite(out["test_loss"])


def test_cli_train_profile_flag(tmp_path):
    """--profile DIR wraps the run in a jax.profiler trace and leaves a
    trace artifact behind."""
    import os

    from paths_tpu.cli.train import main as train_main
    from paths_tpu.data.synthetic import (
        make_synthetic_metadata,
        make_synthetic_store,
    )
    from test_train_loop import tiny_train_config

    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp, num_epochs=1)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=6,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    mdir = os.path.join(tmp, "model_prof")
    os.makedirs(mdir)
    cfg.save(mdir)
    tdir = os.path.join(tmp, "trace")
    train_main(["-m", mdir, "--no-wandb", "--profile", tdir])
    assert any("plugins" in r or f for r, _, f in os.walk(tdir)), (
        "no trace artifacts written")


def test_evaluate_cli_2d_mesh(tmp_path):
    """config.mesh_shape=[2, 4] drives the evaluate CLI through the same
    2-D (data x model) mesh path as train_loop."""
    from paths_tpu.cli.evaluate import main as eval_main
    from paths_tpu.cli.train import main as train_main
    from paths_tpu.data.synthetic import (
        make_synthetic_metadata,
        make_synthetic_store,
    )
    from test_train_loop import tiny_train_config

    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp, num_epochs=1)
    cfg.mesh_shape = [2, 4]
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=8,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    mdir = os.path.join(tmp, "model")
    os.makedirs(mdir)
    cfg.save(mdir)

    train_main(["-m", mdir, "--no-wandb"])
    out = eval_main(["-m", mdir, "--split", "test"])
    assert "test_c-index" in out and np.isfinite(out["test_loss"])


def test_evaluate_cli_honors_streaming_engine(tmp_path):
    """cli.evaluate runs a streaming-trained model through the
    StreamingEngine (tables stay host-side — the fused path would collate
    every level's tables to the device, the exact blow-up streaming
    avoids) and reports the same metrics as the fused evaluator on an
    identical checkpoint."""
    import shutil

    from paths_tpu.cli.evaluate import main as eval_main
    from paths_tpu.cli.train import main as train_main
    from paths_tpu.config import Config
    from paths_tpu.data.synthetic import (
        make_synthetic_metadata,
        make_synthetic_store,
    )
    from test_train_loop import tiny_train_config

    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp, num_epochs=1, engine="streaming")
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=8,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    mdir = os.path.join(tmp, "model_stream")
    os.makedirs(mdir)
    cfg.save(mdir)
    train_main(["-m", mdir, "--no-wandb"])

    out_stream = eval_main(["-m", mdir, "--split", "test"])
    assert np.isfinite(out_stream["test_loss"])

    # same checkpoint re-labeled fused: metrics must agree (engine parity)
    fdir = os.path.join(tmp, "model_fused")
    shutil.copytree(mdir, fdir)
    fcfg = Config.load(fdir)
    fcfg.engine = "fused"
    fcfg.save(fdir)
    out_fused = eval_main(["-m", fdir, "--split", "test"])
    for k in out_stream:
        np.testing.assert_allclose(out_stream[k], out_fused[k], atol=1e-5,
                                   err_msg=k)
