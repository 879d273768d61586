"""Remaining config branches: sharded preprocessing over the mesh,
slide_ctx_mode='none', importance_mode='none'."""
import numpy as np
import torch

from test_model_parity import _parity_case
from test_preprocess import _dummy_encoder, make_fake_slide


def test_preprocess_data_sharded_mesh():
    """Patch encode batches shard over the 8-device data mesh and produce
    the same grid as single-device."""
    from paths_tpu.parallel.mesh import make_mesh
    from paths_tpu.preprocess.pipeline import process_level
    from paths_tpu.preprocess.wsi import ArrayWSI

    img, blob = make_fake_slide(rows=512, cols=768)
    wsi = ArrayWSI(img, base_power=10.0)
    encode, dim = _dummy_encoder()

    g1 = process_level(wsi, encode, dim, power=10.0, patch_size=128,
                       batch_size=8, threads=2)
    mesh = make_mesh(8)
    g8 = process_level(wsi, encode, dim, power=10.0, patch_size=128,
                       batch_size=8, threads=2, mesh=mesh)
    np.testing.assert_allclose(g8, g1, atol=1e-6)


def test_process_slides_data_sharded_mesh(tmp_path):
    """The cross-slide pipelined path with mesh-sharded encode batches
    matches the single-device serial path."""
    import os

    from paths_tpu.data.feature_store import FeatureStore
    from paths_tpu.parallel.mesh import make_mesh
    from paths_tpu.preprocess.pipeline import process_slide, process_slides

    img, _ = make_fake_slide(rows=512, cols=768)
    p = os.path.join(str(tmp_path), "s0.npy")
    np.save(p, img)
    encode, dim = _dummy_encoder()

    ref_store = FeatureStore(str(tmp_path / "ref"), create=True)
    process_slide(p, "s0", encode, dim, [5.0, 10.0], ref_store,
                  patch_size=128, batch_size=8, threads=2,
                  default_power=10.0)

    pipe_store = FeatureStore(str(tmp_path / "pipe"), create=True)
    process_slides([(p, "s0")], encode, dim, [5.0, 10.0], pipe_store,
                   patch_size=128, batch_size=8, threads=2,
                   default_power=10.0, mesh=make_mesh(8))
    for power in (5.0, 10.0):
        np.testing.assert_allclose(np.asarray(pipe_store.load("s0", power)),
                                   np.asarray(ref_store.load("s0", power)),
                                   atol=1e-6)


def test_processor_parity_slide_ctx_none():
    _parity_case({"slide_ctx_mode": "none"}, depth=2, seed=31)


def test_processor_parity_importance_none():
    _parity_case({"importance_mode": "none"}, depth=1, seed=32)
