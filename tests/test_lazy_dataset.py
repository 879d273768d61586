"""Memory-bounded lazy dataset mode + periodic checkpointing."""
import os

import numpy as np

from paths_tpu.data.dataset import collate_batch, load_splits
from paths_tpu.data.synthetic import make_synthetic_metadata, make_synthetic_store
from paths_tpu.parallel.mesh import make_mesh
from paths_tpu.train.loop import train_loop
from test_train_loop import tiny_train_config


def test_lazy_mode_unloads_after_batch(tmp_path):
    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=6,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    ds = load_splits([1.0, 0.0, 0.0], seed=0, config=cfg, preload=False)[0]
    assert not ds.cache_slides

    bag0, tables, labels = collate_batch(ds, [0, 1], level0_bucket=8)
    assert bag0.fts.shape[0] == 2
    # tables were unloaded again after collation
    assert all(s._tables is None for s in ds.slides)

    # results identical to cached mode
    ds2 = load_splits([1.0, 0.0, 0.0], seed=0, config=cfg, preload=True)[0]
    bag0b, tablesb, _ = collate_batch(ds2, [0, 1], level0_bucket=8)
    np.testing.assert_array_equal(np.asarray(bag0.fts), np.asarray(bag0b.fts))
    np.testing.assert_array_equal(np.asarray(tables[0].index),
                                  np.asarray(tablesb[0].index))
    assert all(s._tables is not None for s in ds2.slides)


def test_bf16_tables(tmp_path):
    """table_dtype=bfloat16 halves HBM; loss stays close to f32."""
    import jax
    import jax.numpy as jnp

    from paths_tpu.engine.hierarchy import end2end_loss
    from paths_tpu.models.recursive import recursive_init

    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=4,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    ds = load_splits([1.0, 0.0, 0.0], seed=0, config=cfg)[0]
    params = recursive_init(jax.random.PRNGKey(0), cfg)

    b32 = collate_batch(ds, [0, 1, 2], level0_bucket=8)
    cfg.table_dtype = "bfloat16"
    b16 = collate_batch(ds, [0, 1, 2], level0_bucket=8)
    assert b16[1][0].fts.dtype == jnp.bfloat16
    labels = b32[2]
    l32 = float(end2end_loss(params, cfg, b32[0], b32[1], labels)[0])
    l16 = float(end2end_loss(params, cfg, b16[0], b16[1], labels)[0])
    assert abs(l32 - l16) / (abs(l32) + 1e-9) < 0.05


def test_periodic_save(tmp_path):
    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp, num_epochs=3, save_epochs=1)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=6,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    train, val, test = load_splits([0.7, 0.0, 0.3], seed=0, config=cfg)
    mdir = os.path.join(tmp, "m")
    mtimes = []

    import paths_tpu.train.loop as L

    orig = L.save_state
    calls = []

    def counting_save(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    L.save_state = counting_save
    try:
        train_loop(cfg, mdir, train, val, test, mesh=make_mesh(1),
                   verbose=False)
    finally:
        L.save_state = orig
    # 3 periodic + 1 final
    assert len(calls) == 4
