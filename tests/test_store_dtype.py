"""float16 feature stores: `cli.preprocess --store-dtype float16` halves
the on-disk store / host RAM / collation wire bytes. These tests pin

  * the pipeline writing f16 grids that equal the f32 grids cast,
  * table building preserving the storage dtype (so `stack_tables`
    ships half-width bytes and upcasts ON DEVICE to `table_dtype`),
  * the f16 background test (entry-wise, no f16 accumulator underflow),
  * end-to-end loss parity between f16 and f32 stores, fused AND
    streaming engines.

Reference interop note: the reference stores f32 grids
(`preprocess/preprocess.py:89` via torch.zeros default), so float32
stays the default; float16 is the opt-in TPU-native layout.
"""
import os

import jax
import numpy as np

from paths_tpu.config import Config, PATHSProcessorConfig
from paths_tpu.data.dataset import collate_batch, load_splits
from paths_tpu.data.feature_store import FeatureStore
from paths_tpu.data.synthetic import make_synthetic_metadata, make_synthetic_store
from paths_tpu.engine.tables import build_level_table
from paths_tpu.preprocess.pipeline import process_slides


def _dummy_encoder(dim=32):
    def encode(imgs):
        imgs = np.asarray(imgs, np.float32)
        n = imgs.shape[0]
        base = imgs.mean(axis=(1, 2))                    # (B, 3)
        return np.tile(base, (1, dim // 3 + 1))[:, :dim] * 0.37

    return encode, dim


def _fake_slide(rows=384, cols=384, seed=0):
    rng = np.random.default_rng(seed)
    img = np.full((rows, cols, 3), 245, np.uint8)
    img[64:256, 64:320] = rng.integers(60, 160, (192, 256, 3))
    return img


def test_pipeline_writes_f16_grids(tmp_path):
    img = _fake_slide()
    p = os.path.join(str(tmp_path), "s.npy")
    np.save(p, img)
    encode, dim = _dummy_encoder()

    kw = dict(patch_size=128, batch_size=4, threads=2, default_power=10.0,
              stage_h2d=False)
    store32 = FeatureStore(str(tmp_path / "o32"), create=True)
    process_slides([(p, "s")], encode, dim, [5.0, 10.0], store32, **kw)
    store16 = FeatureStore(str(tmp_path / "o16"), create=True)
    process_slides([(p, "s")], encode, dim, [5.0, 10.0], store16,
                   store_dtype="float16", **kw)

    for power in (5.0, 10.0):
        g32 = np.asarray(store32.load("s", power))
        g16 = np.asarray(store16.load("s", power))
        assert g16.dtype == np.float16 and g32.dtype == np.float32
        np.testing.assert_array_equal(g16, g32.astype(np.float16))
        # background rows stay exactly zero through the cast
        bg32 = ~np.any(g32.reshape(-1, dim) != 0, axis=1)
        bg16 = ~np.any(g16.reshape(-1, dim) != 0, axis=1)
        np.testing.assert_array_equal(bg16, bg32)
    # the f16 store is half the bytes
    sz32 = os.path.getsize(store32.path("s", 10.0))
    sz16 = os.path.getsize(store16.path("s", 10.0))
    assert sz16 < 0.6 * sz32


def test_store_dtype_rejects_unknown():
    import pytest

    from paths_tpu.preprocess.pipeline import _grid_dtype

    assert _grid_dtype("float16") == np.float16
    with pytest.raises(ValueError):
        _grid_dtype("bfloat16")   # not a numpy storage dtype


def test_build_level_table_f16_matches_f32():
    rng = np.random.default_rng(3)
    g32 = rng.normal(size=(5, 7, 12)).astype(np.float32)
    g32[rng.uniform(size=(5, 7)) > 0.5] = 0
    g16 = g32.astype(np.float16)

    t32 = build_level_table(g32, min_rows=16)
    t16 = build_level_table(g16, min_rows=16)
    assert t16["fts"].dtype == np.float16   # storage dtype preserved
    assert int(t16["count"]) == int(t32["count"])
    np.testing.assert_array_equal(t16["index"], t32["index"])
    np.testing.assert_array_equal(t16["locs"], t32["locs"])
    np.testing.assert_array_equal(t16["fts"].astype(np.float32),
                                  g32.reshape(-1, 12)[
                                      np.ravel_multi_index(
                                          (t16["locs"][:, 0],
                                           t16["locs"][:, 1]), (5, 7))]
                                  .astype(np.float16).astype(np.float32))


def test_f16_background_is_entrywise():
    """Tiny-but-nonzero f16 rows stay foreground: the f16 path tests
    entries, never a (rounding-prone) f16 accumulator."""
    d = 8
    g = np.zeros((2, 2, d), np.float16)
    g[0, 0] = np.float16(6e-8)       # subnormal, sum could underflow
    g[0, 1, 0] = np.float16(1.0)     # signed-cancelling pair
    g[0, 1, 1] = np.float16(-1.0)
    t = build_level_table(g)
    assert int(t["count"]) == 2      # both live; (1,0)/(1,1) background
    assert t["index"][1, 0] == -1 and t["index"][1, 1] == -1


def _setup_stores(tmp_path, n=6):
    """Identical synthetic pyramids saved twice: f32 and f16."""
    from test_train_loop import tiny_train_config

    tmp = str(tmp_path)
    cfg32 = tiny_train_config(tmp)
    ids = make_synthetic_store(cfg32.preprocess_dir, cfg32, num_slides=n,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg32.csv_path, ids)
    cfg16 = tiny_train_config(tmp, preprocess_dir=os.path.join(tmp, "st16"))
    ids16 = make_synthetic_store(cfg16.preprocess_dir, cfg16, num_slides=n,
                                 base_hw=(3, 3), store_dtype=np.float16)
    assert ids16 == ids
    ds32 = load_splits([1.0, 0.0, 0.0], seed=0, config=cfg32)[0]
    ds16 = load_splits([1.0, 0.0, 0.0], seed=0, config=cfg16)[0]
    return cfg32, ds32, cfg16, ds16


def test_end2end_f16_store_matches_f32(tmp_path):
    """Fused engine: same slides stored f16 vs f32 -> same selections,
    loss within f16 rounding; tables upcast to table_dtype ON DEVICE."""
    from paths_tpu.engine.hierarchy import end2end_forward, end2end_loss
    from paths_tpu.models.recursive import recursive_init

    cfg32, ds32, cfg16, ds16 = _setup_stores(tmp_path)
    idx = [0, 1, 2, 3]
    bag32, tab32, lab32 = collate_batch(ds32, idx, level0_bucket=8)
    bag16, tab16, lab16 = collate_batch(ds16, idx, level0_bucket=8)
    for t in tab16:   # device dtype is table_dtype, not the storage dtype
        assert t.fts.dtype == np.dtype(cfg16.table_dtype)

    params = recursive_init(jax.random.PRNGKey(0), cfg32)
    loss32, _ = end2end_loss(params, cfg32, bag32, tab32, lab32)
    loss16, _ = end2end_loss(params, cfg16, bag16, tab16, lab16)
    np.testing.assert_allclose(float(loss16), float(loss32), rtol=2e-3)

    outs32 = end2end_forward(params, cfg32, bag32, tab32)
    outs16 = end2end_forward(params, cfg16, bag16, tab16)
    for o32, o16 in zip(outs32, outs16):   # identical kept patches
        np.testing.assert_array_equal(np.asarray(o32["bag"].locs),
                                      np.asarray(o16["bag"].locs))
        np.testing.assert_array_equal(np.asarray(o32["bag"].mask),
                                      np.asarray(o16["bag"].mask))


def test_streaming_f16_store_matches_fused(tmp_path):
    """Streaming engine on an f16 store: gathered bags ship f16 and
    upcast on device; loss/grads match the fused engine on the SAME
    f16 store to float tolerance."""
    from paths_tpu.engine.hierarchy import end2end_loss
    from paths_tpu.engine.streaming import StreamingEngine
    from paths_tpu.models.recursive import recursive_init

    _, _, cfg16, ds16 = _setup_stores(tmp_path)
    idx = [0, 1, 2]
    bag0, tables, labels = collate_batch(ds16, idx, level0_bucket=8)
    params = recursive_init(jax.random.PRNGKey(0), cfg16)

    (loss_f, _), grads_f = jax.value_and_grad(
        lambda p: end2end_loss(p, cfg16, bag0, tables, labels),
        has_aux=True)(params)

    eng = StreamingEngine(cfg16)
    host_tables = [[dict(t) for t in ds16.slides[i].tables] for i in idx]
    assert host_tables[0][0]["fts"].dtype == np.float16
    loss_s, _, grads_s = eng.loss_and_grad(params, bag0, host_tables,
                                           labels, deterministic=True)
    np.testing.assert_allclose(float(loss_s), float(loss_f), rtol=2e-5)
    for gf, gs in zip(jax.tree_util.tree_leaves(grads_f),
                      jax.tree_util.tree_leaves(grads_s)):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gf), atol=3e-5)


def test_wire_dtype_narrower_side():
    from paths_tpu.engine.tables import wire_dtype

    assert wire_dtype(np.float16, np.float32) == np.float16   # f16 store
    assert wire_dtype(np.float32, None) == np.float32
    assert wire_dtype(np.float32, np.float16) == np.float16   # narrow target
    assert wire_dtype(np.float32, np.float32) == np.float32
    import jax.numpy as jnp

    # f32 store + bf16 tables must ship 2-byte, not 4-byte
    assert np.dtype(wire_dtype(np.float32, jnp.bfloat16)).itemsize == 2


def test_host_stack_dtype_mixed_warns():
    import warnings

    import pytest

    from paths_tpu import engine
    from paths_tpu.engine.tables import host_stack_dtype

    assert host_stack_dtype([np.dtype(np.float16)] * 3) == np.float16
    engine.tables._warned_mixed_dtypes.clear()
    with pytest.warns(UserWarning, match="mixes storage dtypes"):
        # widest wins regardless of order (a resumed run can mix dtypes)
        assert host_stack_dtype(
            [np.float16, np.float32, np.float16]) == np.float32
    # once per process per dtype pair (the streaming engine hits this
    # every level of every batch — ADVICE r4)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert host_stack_dtype(
            [np.float32, np.float16]) == np.float32


def test_level0_bag_ships_storage_dtype(tmp_path):
    """collate_bag0 must put the level-0 features at the f16 storage dtype
    (upcast to table_dtype happens ON DEVICE) — the bag is part of every
    serving request's H2D bytes."""
    import jax.numpy as jnp

    from paths_tpu.data.dataset import collate_bag0

    _, ds32, cfg16, ds16 = _setup_stores(tmp_path)
    shipped = []

    def put(a):
        shipped.append(np.dtype(a.dtype))
        return jnp.asarray(a)

    bag16 = collate_bag0(ds16, [0, 1], level0_bucket=8, put=put)
    assert np.float16 in shipped          # features crossed at half width
    assert bag16.fts.dtype == np.dtype(cfg16.table_dtype)  # device upcast

    shipped.clear()
    collate_bag0(ds32, [0, 1], level0_bucket=8, put=put)
    assert np.float16 not in shipped      # f32 store still ships f32


def test_slide_pyramid_keeps_memmap(tmp_path):
    """Materializing a pyramid must not copy the store's grids: the
    loaded arrays stay views of the read-only .npy memmap (evictable
    page cache, not resident RAM) on the numpy path."""
    import paths_tpu.native as native
    from paths_tpu.data.slide import SlidePyramid

    store = FeatureStore(str(tmp_path / "st"), create=True)
    rng = np.random.default_rng(0)
    for power in (2.5, 5.0):
        g = rng.normal(size=(4, 4, 8)).astype(np.float32)
        g[rng.uniform(size=(4, 4)) > 0.6] = 0
        store.save("s", power, g)

    saved = native._lib, native._tried
    native._lib, native._tried = None, True   # force the numpy path
    try:
        s = SlidePyramid("s", store, 2.5, num_levels=2, patch_size=16,
                         preload=True)
        base = s.level0[0]
        hit_memmap = False
        while isinstance(base, np.ndarray):   # reshape view -> memmap
            if isinstance(base, np.memmap):
                hit_memmap = True
                break
            base = base.base
        assert hit_memmap
    finally:
        native._lib, native._tried = saved


def test_resume_dtype_mismatch_warns(tmp_path):
    """Skip-if-exists resume over grids of another dtype keeps them but
    warns (the silent alternative is a mixed store nobody asked for)."""
    import pytest

    img = _fake_slide()
    p = os.path.join(str(tmp_path), "s.npy")
    np.save(p, img)
    encode, dim = _dummy_encoder()
    kw = dict(patch_size=128, batch_size=4, threads=2, default_power=10.0,
              stage_h2d=False)

    store = FeatureStore(str(tmp_path / "o"), create=True)
    process_slides([(p, "s")], encode, dim, [10.0], store, **kw)
    assert np.asarray(store.load("s", 10.0)).dtype == np.float32

    with pytest.warns(UserWarning, match="store_dtype"):
        process_slides([(p, "s")], encode, dim, [10.0], store,
                       store_dtype="float16", **kw)
    # untouched: the old f32 grid was kept
    assert np.asarray(store.load("s", 10.0)).dtype == np.float32


def test_preprocess_cli_store_dtype(tmp_path):
    img = _fake_slide(rows=448, cols=448)
    d = tmp_path / "slides"
    d.mkdir()
    np.save(str(d / "s1.npy"), img)

    from paths_tpu.cli.preprocess import main

    out = str(tmp_path / "out")
    main(["-m", "kaiko-vits16", "-d", str(d), "-o", out, "-b", "4",
          "-p", "224", "-ms", "2.5", "--ext", ".npy",
          "--store-dtype", "float16"])
    grid = np.asarray(FeatureStore(out).load("s1", 2.5))
    assert grid.dtype == np.float16 and grid.shape[2] == 384
