"""Serving layer: ServingSession batching/parity and the HTTP endpoint.

The reference has no serving path (inference exists only inside
`train.py:106-116`); these tests pin the deployment workflow
preprocess -> train -> export -> serve end to end on synthetic slides.
"""
import json
import os
import threading

import jax
import numpy as np
import pytest

from paths_tpu.data.synthetic import make_synthetic_metadata, make_synthetic_store
from paths_tpu.models.recursive import recursive_init
from paths_tpu.serve import ServingSession, serving_dataset, store_slide_ids
from paths_tpu.train.state import save_state
from test_train_loop import tiny_train_config


@pytest.fixture(scope="module")
def model_setup(tmp_path_factory):
    """A trained-init model dir + synthetic store shared by the module
    (session construction jit-compiles; do it once)."""
    tmp = str(tmp_path_factory.mktemp("serve"))
    cfg = tiny_train_config(tmp)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=6,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    model_dir = os.path.join(tmp, "model")
    os.makedirs(model_dir)
    cfg.save(model_dir)
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    save_state(model_dir, params, None, {"epoch": 1})
    return tmp, cfg, model_dir, sorted(ids)


@pytest.fixture(scope="module")
def live_session(model_setup):
    _, _, model_dir, _ = model_setup
    return ServingSession(model_dir, batch_size=2)


def test_store_slide_ids(model_setup):
    _, cfg, _, ids = model_setup
    from paths_tpu.data.feature_store import FeatureStore

    assert store_slide_ids(FeatureStore(cfg.preprocess_dir),
                           cfg.base_power) == ids


def test_session_predict_batch_invariance(live_session, model_setup):
    """Predictions are per-slide: a 3-slide request equals the same
    slides predicted one at a time (the final short batch pads by
    repeating a slide — padding must not leak into results)."""
    _, cfg, _, ids = model_setup
    want = [live_session.predict([sid])[0] for sid in ids[:3]]
    got = live_session.predict(ids[:3])
    assert [r["slide_id"] for r in got] == ids[:3]
    for a, b in zip(got, want):
        assert a["slide_id"] == b["slide_id"]
        np.testing.assert_allclose(a["hazards"], b["hazards"], rtol=1e-5)
        np.testing.assert_allclose(a["risk"], b["risk"], rtol=1e-5)
        # risk definition (reference eval.py:59-64)
        surv = np.cumprod(1.0 - np.asarray(a["hazards"]))
        assert a["risk"] == pytest.approx(float(-surv.sum()), rel=1e-6)

    with pytest.raises(KeyError):
        live_session.predict(["nope"])

    # static_shapes contract: slide dims collate to dataset-wide pads
    # and batch widths bucket to powers of two, so the requests above
    # (widths 1 and 2) compiled at most log2(B)+1 = 2 programs
    assert cfg.static_shapes and live_session._call._cache_size() <= 2

    # repeat requests hit the device-resident batch cache (same rows)
    assert len(live_session._batch_cache) > 0
    again = live_session.predict(ids[:3])
    for a, b in zip(again, got):
        np.testing.assert_allclose(a["hazards"], b["hazards"], rtol=0,
                                   atol=0)


def test_session_artifact_matches_live(live_session, model_setup, tmp_path):
    """A frozen StableHLO artifact serves the same predictions as the
    live model, collating fresh requests purely from artifact_pads."""
    tmp, cfg, model_dir, ids = model_setup
    from paths_tpu.data.dataset import collate_batch
    from paths_tpu.data.feature_store import FeatureStore
    from paths_tpu.export import export_serving

    ds = serving_dataset(cfg, FeatureStore(cfg.preprocess_dir), ids)
    pads = ds.global_pads()
    bag, tables, _ = collate_batch(ds, [0, 1], level0_bucket=1,
                                   row_bucket=1, grid_bucket=1, pads=pads)
    art = str(tmp_path / "m.shlo")
    with open(art, "wb") as f:
        f.write(export_serving(cfg, live_session._params, bag, tables,
                               freeze_params=True))

    sess = ServingSession(model_dir, artifact=art)
    assert sess.batch_size == 2 and sess.info()["backend"] == "frozen-artifact"
    got = sess.predict(ids[:4])          # 2 device batches
    want = live_session.predict(ids[:4])
    for a, b in zip(got, want):
        np.testing.assert_allclose(a["hazards"], b["hazards"], rtol=1e-5)


def test_session_poly_batch_artifact(live_session, model_setup, tmp_path):
    """A poly-batch artifact serves odd-sized requests with NO padding
    (the symbolic axis accepts any size) and matches the live model."""
    tmp, cfg, model_dir, ids = model_setup
    from paths_tpu.data.dataset import collate_batch
    from paths_tpu.data.feature_store import FeatureStore
    from paths_tpu.export import export_serving

    ds = serving_dataset(cfg, FeatureStore(cfg.preprocess_dir), ids)
    pads = ds.global_pads()
    bag, tables, _ = collate_batch(ds, [0, 1], level0_bucket=1,
                                   row_bucket=1, grid_bucket=1, pads=pads)
    art = str(tmp_path / "poly.shlo")
    with open(art, "wb") as f:
        f.write(export_serving(cfg, live_session._params, bag, tables,
                               poly_batch=True))

    # the operator picks the MAX serving width at load time (no
    # re-export); requests pad to power-of-two buckets under it, so
    # exp.call sees at most log2(B)+1 concrete shapes
    sess = ServingSession(model_dir, artifact=art, batch_size=4)
    assert sess.batch_size == 4
    got = sess.predict(ids[:3])
    want = live_session.predict(ids[:3])
    for a, b in zip(got, want):
        np.testing.assert_allclose(a["hazards"], b["hazards"], rtol=1e-5)


def test_session_rejects_slides_exceeding_artifact(live_session,
                                                   model_setup, tmp_path):
    """Slides preprocessed after export that exceed the artifact's
    frozen shapes are rejected with a clear message, not an opaque XLA
    aval mismatch."""
    tmp, cfg, model_dir, ids = model_setup
    from paths_tpu.data.dataset import collate_batch
    from paths_tpu.data.feature_store import FeatureStore
    from paths_tpu.export import export_serving

    store = FeatureStore(cfg.preprocess_dir)
    full = serving_dataset(cfg, store, ids)
    n0s = [s.level0[2] for s in full.slides]
    small = ids[int(np.argmin(n0s))]
    big = ids[int(np.argmax(n0s))]
    assert min(n0s) < max(n0s), "fixture slides must differ in size"

    ds = serving_dataset(cfg, store, [small, small])
    pads = ds.global_pads()
    bag, tables, _ = collate_batch(ds, [0, 1], level0_bucket=1,
                                   row_bucket=1, grid_bucket=1, pads=pads)
    art = str(tmp_path / "small.shlo")
    with open(art, "wb") as f:
        f.write(export_serving(cfg, live_session._params, bag, tables,
                               freeze_params=True))

    sess = ServingSession(model_dir, artifact=art)
    with pytest.raises(ValueError, match="exceed the artifact"):
        sess.predict([big])
    got = sess.predict([small])          # fitting slides still serve
    want = live_session.predict([small])
    np.testing.assert_allclose(got[0]["hazards"], want[0]["hazards"],
                               rtol=1e-5)


def test_session_subtype_rows(model_setup):
    """Classification sessions return argmax class + per-class softmax
    probabilities (reference eval.py:104-117 semantics)."""
    import jax

    from paths_tpu.models.recursive import recursive_init
    from paths_tpu.train.state import save_state

    tmp, _, _, ids = model_setup
    cfg = tiny_train_config(tmp, task="subtype_classification",
                            filter_to_subtypes=["IDC", "ILC"], nbins=2)
    sdir = os.path.join(tmp, "model_subtype")
    os.makedirs(sdir, exist_ok=True)
    cfg.save(sdir)
    params = recursive_init(jax.random.PRNGKey(1), cfg)
    save_state(sdir, params, None, {"epoch": 1})

    sess = ServingSession(sdir, batch_size=2)
    rows = sess.predict(ids[:2])
    for r in rows:
        assert set(r) == {"slide_id", "pred", "probs"}
        assert r["pred"] in ("IDC", "ILC")
        assert set(r["probs"]) == {"IDC", "ILC"}
        total = sum(r["probs"].values())
        assert total == pytest.approx(1.0, rel=1e-6)
        assert r["pred"] == max(r["probs"], key=r["probs"].get)


def test_session_mesh_data_parallel(live_session, model_setup):
    """An 8-device data-parallel serving session (params replicated,
    requests sharded along `data`) returns the 1-device predictions."""
    from paths_tpu.parallel.mesh import make_mesh

    _, _, model_dir, ids = model_setup
    sess = ServingSession(model_dir, batch_size=8, mesh=make_mesh(8))
    got = sess.predict(ids[:5])          # width buckets to 8 (= dp)
    want = live_session.predict(ids[:5])
    for a, b in zip(got, want):
        np.testing.assert_allclose(a["hazards"], b["hazards"], rtol=1e-5)

    with pytest.raises(ValueError, match="multiple of the data"):
        ServingSession(model_dir, batch_size=6, mesh=make_mesh(8))


def test_session_streaming_engine(live_session, model_setup):
    """A streaming-config model serves through the host-streaming
    forward (tables never leave the host) and matches the fused live
    session's predictions."""
    import json

    tmp, cfg, model_dir, ids = model_setup
    sdir = os.path.join(tmp, "model_streaming")
    os.makedirs(sdir, exist_ok=True)
    scfg = tiny_train_config(tmp, engine="streaming")
    scfg.save(sdir)
    for fn in ("model.npz", "train_stats.json"):
        src = os.path.join(model_dir, fn)
        if os.path.exists(src):
            import shutil

            shutil.copy(src, os.path.join(sdir, fn))

    sess = ServingSession(sdir, batch_size=2)
    assert sess.info()["backend"] == "live-streaming"
    got = sess.predict(ids[:3])
    want = live_session.predict(ids[:3])
    for a, b in zip(got, want):
        np.testing.assert_allclose(a["hazards"], b["hazards"], rtol=1e-5)


def test_http_server_concurrent_requests(live_session, model_setup):
    """Concurrent /predict requests (threaded server + device lock) all
    return correct, uncorrupted per-slide results."""
    import http.client

    from paths_tpu.cli.serve import make_server

    _, _, _, ids = model_setup
    want = {sid: live_session.predict([sid])[0]["risk"] for sid in ids}
    server = make_server(live_session, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        host, port = server.server_address[:2]
        results, errors = {}, []

        def worker(wid):
            try:
                req = [ids[(wid + k) % len(ids)] for k in range(3)]
                conn = http.client.HTTPConnection(host, port, timeout=60)
                conn.request("POST", "/predict",
                             body=json.dumps({"slide_ids": req}))
                rows = json.loads(conn.getresponse().read())["predictions"]
                conn.close()
                results[wid] = rows
            except Exception as e:        # noqa: BLE001
                errors.append((wid, e))

        threads = [threading.Thread(target=worker, args=(w,))
                   for w in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert not errors, errors
        assert len(results) == 4
        for wid, rows in results.items():
            for k, row in enumerate(rows):
                sid = ids[(wid + k) % len(ids)]
                assert row["slide_id"] == sid
                np.testing.assert_allclose(row["risk"], want[sid],
                                           rtol=1e-5)
    finally:
        server.shutdown()
        server.server_close()


def test_http_server(live_session, model_setup):
    import http.client

    from paths_tpu.cli.serve import make_server

    _, _, _, ids = model_setup
    server = make_server(live_session, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        host, port = server.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=30)

        def call(method, path, body=None):
            conn.request(method, path,
                         body=None if body is None else json.dumps(body))
            r = conn.getresponse()
            return r.status, json.loads(r.read())

        status, health = call("GET", "/healthz")
        assert status == 200 and health["ok"] and health["task"] == "survival"

        status, listing = call("GET", "/slides")
        assert status == 200 and listing["slide_ids"] == ids

        status, out = call("POST", "/predict", {"slide_ids": ids[:2]})
        assert status == 200
        rows = out["predictions"]
        assert [r["slide_id"] for r in rows] == ids[:2]
        want = live_session.predict(ids[:2])
        np.testing.assert_allclose(rows[0]["hazards"], want[0]["hazards"],
                                   rtol=1e-5)

        assert call("POST", "/predict", {"slide_ids": ["nope"]})[0] == 404
        assert call("POST", "/predict", {})[0] == 400
        assert call("POST", "/predict", {"slide_ids": []})[0] == 400
        assert call("POST", "/predict", {"slide_ids": [1, 2]})[0] == 400
        assert call("POST", "/predict", ["not-a-dict"])[0] == 400
        assert call("POST", "/predict", "just-a-string")[0] == 400
        assert call("GET", "/nope")[0] == 404

        status, m = call("GET", "/metrics")
        assert status == 200
        assert m["requests"] >= 8 and m["errors"] >= 5
        assert m["slides_predicted"] == 2
        assert m["predict_seconds_total"] > 0
        conn.close()
    finally:
        server.shutdown()
        server.server_close()
