"""StableHLO serving export: artifact round-trips and matches the live
forward, with and without frozen weights."""
import jax
import numpy as np

from paths_tpu.data.dataset import collate_batch, load_splits, union_pads
from paths_tpu.data.synthetic import make_synthetic_metadata, make_synthetic_store
from paths_tpu.engine.hierarchy import end2end_forward
from paths_tpu.export import (bag_to_dict, export_serving, load_serving,
                              make_serving_fn, tables_to_dicts)
from paths_tpu.models.recursive import recursive_init
from test_train_loop import tiny_train_config


def setup(tmp_path):
    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=6,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    ds = load_splits([1.0, 0.0, 0.0], seed=0, config=cfg)[0]
    pads = union_pads(ds.global_pads())
    bag0, tables, _ = collate_batch(ds, [0, 1, 2, 3],
                                    level0_bucket=cfg.level0_bucket,
                                    pads=pads)
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    return cfg, params, bag0, tables


def test_export_roundtrip_matches_forward(tmp_path):
    cfg, params, bag0, tables = setup(tmp_path)

    blob = export_serving(cfg, params, bag0, tables)
    assert isinstance(blob, bytes) and len(blob) > 0

    out = load_serving(blob).call(params, bag_to_dict(bag0),
                                  tables_to_dicts(tables))

    outs = end2end_forward(params, cfg, bag0, tables)
    want_logits = outs[-1]["logits"]
    want_pred = jax.nn.sigmoid(want_logits)  # tiny config is survival

    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(want_logits), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["pred"]),
                               np.asarray(want_pred), rtol=1e-6)
    assert len(out["importances"]) == cfg.num_levels


def test_export_frozen_weights(tmp_path):
    """Frozen artifact takes no params and bakes them as constants —
    its output must match the weights-as-args artifact."""
    cfg, params, bag0, tables = setup(tmp_path)

    live = make_serving_fn(cfg)(params, bag_to_dict(bag0),
                                tables_to_dicts(tables))
    blob = export_serving(cfg, params, bag0, tables, freeze_params=True)
    out = load_serving(blob).call(bag_to_dict(bag0),
                                  tables_to_dicts(tables))
    np.testing.assert_allclose(np.asarray(out["pred"]),
                               np.asarray(live["pred"]), rtol=1e-6)


def test_export_cli(tmp_path, monkeypatch):
    """End-to-end: train-init a model dir, export via the CLI, reload
    the artifact and run it."""
    import os

    from paths_tpu.cli.export import main as export_main
    from paths_tpu.train.state import save_state

    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=6,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    model_dir = os.path.join(tmp, "model")
    os.makedirs(model_dir)
    cfg.save(model_dir)
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    save_state(model_dir, params, None, {"epoch": 1})

    out_path = os.path.join(tmp, "model.shlo")
    export_main(["-m", model_dir, "-o", out_path, "--batch-size", "2"])
    blob = open(out_path, "rb").read()
    exp = load_serving(blob)
    assert exp.in_avals  # program loaded; shapes recorded


def test_export_multiplatform_from_cpu(tmp_path):
    """A TPU+CPU artifact exports from a CPU-only host (lowering needs
    no device) and still runs here — the real deployment workflow:
    export on a dev box, serve on the TPU fleet."""
    cfg, params, bag0, tables = setup(tmp_path)
    blob = export_serving(cfg, params, bag0, tables,
                          platforms=["tpu", "cpu"])
    exp = load_serving(blob)
    assert set(exp.platforms) == {"tpu", "cpu"}
    out = exp.call(params, bag_to_dict(bag0), tables_to_dicts(tables))
    live = make_serving_fn(cfg)(params, bag_to_dict(bag0),
                                tables_to_dicts(tables))
    np.testing.assert_allclose(np.asarray(out["pred"]),
                               np.asarray(live["pred"]), rtol=1e-6)


def test_export_poly_batch(tmp_path):
    """One artifact with a symbolic batch axis serves every batch size;
    parity with the live forward at a size never seen at export."""
    cfg, params, bag0, tables = setup(tmp_path)
    blob = export_serving(cfg, params, bag0, tables, poly_batch=True)
    exp = load_serving(blob)
    bag_d, tab_d = bag_to_dict(bag0), tables_to_dicts(tables)

    for B in (1, 3):
        sub_bag = {k: v[:B] for k, v in bag_d.items()}
        sub_tab = [{k: v[:B] for k, v in t.items()} for t in tab_d]
        out = exp.call(params, sub_bag, sub_tab)
        assert np.asarray(out["pred"]).shape[0] == B
        live = make_serving_fn(cfg)(params, sub_bag, sub_tab)
        np.testing.assert_allclose(np.asarray(out["pred"]),
                                   np.asarray(live["pred"]), rtol=1e-6)


def test_artifact_pads_roundtrip(tmp_path):
    """A serving host can recover exact collation pads from the
    artifact and collate a FRESH batch (different slides) to shapes the
    program accepts."""
    from paths_tpu.export import artifact_pads

    cfg, params, bag0, tables = setup(tmp_path)
    blob = export_serving(cfg, params, bag0, tables)
    exp = load_serving(blob)

    batch, pads = artifact_pads(exp)
    assert batch == 4 and pads["n0"] == bag0.fts.shape[1]
    assert pads["rows"][1:] == [t.fts.shape[1] for t in tables]
    assert pads["grid_hw"][1:] == [tuple(t.index.shape[1:3])
                                   for t in tables]

    # different slides, collated purely from the artifact's pads
    ds = load_splits([1.0, 0.0, 0.0], seed=0,
                     config=cfg)[0]
    bag2, tab2, _ = collate_batch(ds, [2, 3, 4, 5], level0_bucket=1,
                                  row_bucket=1, grid_bucket=1, pads=pads)
    out = exp.call(params, bag_to_dict(bag2), tables_to_dicts(tab2))
    live = make_serving_fn(cfg)(params, bag_to_dict(bag2),
                                tables_to_dicts(tab2))
    np.testing.assert_allclose(np.asarray(out["pred"]),
                               np.asarray(live["pred"]), rtol=1e-6)

    # poly-batch artifact reports batch=None
    blob = export_serving(cfg, params, bag0, tables, poly_batch=True)
    batch, pads2 = artifact_pads(load_serving(blob))
    assert batch is None and pads2 == pads


def test_export_model_variants(tmp_path):
    """Export parity across config variants the flagship doesn't use:
    subtype-classification task, 1d pos-encoding, rnn (no-LSTM) ctx."""
    import pytest

    for i, kw in enumerate([
        dict(task="subtype_classification",
             filter_to_subtypes=["IDC", "ILC"]),
        dict(model_kw=dict(pos_encoding_mode="1d")),
        dict(model_kw=dict(lstm=False, hierarchical_ctx=False)),
    ]):
        tmp = str(tmp_path / f"v{i}")
        model_kw = kw.pop("model_kw", {})
        cfg = tiny_train_config(tmp, **kw)
        for k, v in model_kw.items():
            setattr(cfg.model_config, k, v)
        ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=6,
                                   base_hw=(3, 3))
        make_synthetic_metadata(
            cfg.csv_path, ids,
            subtypes=(["IDC", "ILC"]
                      if cfg.task == "subtype_classification" else None))
        ds = load_splits([1.0, 0.0, 0.0], seed=0, config=cfg)[0]
        pads = union_pads(ds.global_pads())
        bag0, tables, _ = collate_batch(ds, [0, 1],
                                        level0_bucket=cfg.level0_bucket,
                                        pads=pads)
        params = recursive_init(jax.random.PRNGKey(i), cfg)

        blob = export_serving(cfg, params, bag0, tables)
        out = load_serving(blob).call(params, bag_to_dict(bag0),
                                      tables_to_dicts(tables))
        live = make_serving_fn(cfg)(params, bag_to_dict(bag0),
                                    tables_to_dicts(tables))
        np.testing.assert_allclose(np.asarray(out["pred"]),
                                   np.asarray(live["pred"]), rtol=1e-6,
                                   err_msg=str(kw or model_kw))
