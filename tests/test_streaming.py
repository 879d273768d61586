"""Streaming (two-pass) engine vs the fused on-device engine: identical
losses, predictions, and gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from paths_tpu.data.dataset import collate_batch, load_splits
from paths_tpu.data.synthetic import make_synthetic_metadata, make_synthetic_store
from paths_tpu.engine.hierarchy import end2end_loss
from paths_tpu.engine.streaming import StreamingEngine, lookup_host
from paths_tpu.models.recursive import recursive_init
from test_train_loop import tiny_train_config


def setup(tmp_path, n=6):
    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=n,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    ds = load_splits([1.0, 0.0, 0.0], seed=0, config=cfg)[0]
    return cfg, ds


def strip_tables(ds, indices):
    """Per-slide host table dicts, [slide][level]."""
    return [[dict(t) for t in ds.slides[i].tables] for i in indices]


def test_streaming_matches_fused(tmp_path):
    cfg, ds = setup(tmp_path)
    idx = [0, 1, 2, 3]
    bag0, tables, labels = collate_batch(ds, idx, level0_bucket=8)
    params = recursive_init(jax.random.PRNGKey(0), cfg)

    # fused
    (loss_f, aux_f), grads_f = jax.value_and_grad(
        lambda p: end2end_loss(p, cfg, bag0, tables, labels),
        has_aux=True)(params)

    # streaming
    eng = StreamingEngine(cfg)
    host_tables = strip_tables(ds, idx)
    loss_s, pred_s, grads_s = eng.loss_and_grad(
        params, bag0, host_tables, labels, deterministic=True)

    np.testing.assert_allclose(float(loss_s), float(loss_f), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(pred_s), np.asarray(aux_f["pred"]),
                               atol=2e-5)
    for gf, gs in zip(jax.tree_util.tree_leaves(grads_f),
                      jax.tree_util.tree_leaves(grads_s)):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gf), atol=3e-5)


def test_streaming_forward_selections_match(tmp_path):
    """Selected locs per level agree between engines."""
    from paths_tpu.engine.hierarchy import end2end_forward

    cfg, ds = setup(tmp_path)
    idx = [0, 1]
    bag0, tables, labels = collate_batch(ds, idx, level0_bucket=8)
    params = recursive_init(jax.random.PRNGKey(1), cfg)

    outs_f = end2end_forward(params, cfg, bag0, tables)
    eng = StreamingEngine(cfg)
    outs_s, _ = eng.forward(params, bag0, strip_tables(ds, idx))

    for lvl in range(cfg.num_levels):
        bf, bs = outs_f[lvl]["bag"], outs_s[lvl]["bag"]
        np.testing.assert_array_equal(np.asarray(bf.mask), np.asarray(bs.mask))
        mf = np.asarray(bf.mask)
        np.testing.assert_array_equal(np.asarray(bf.locs)[mf],
                                      np.asarray(bs.locs)[mf])


def test_streaming_train_loop(tmp_path):
    """config.engine='streaming' trains end to end through the loop with
    lazy slides, matching fused-engine semantics (same learning signal)."""
    import os

    from paths_tpu.parallel.mesh import make_mesh
    from paths_tpu.train.loop import train_loop

    cfg, ds = setup(tmp_path, n=10)
    cfg.engine = "streaming"
    cfg.num_epochs = 2
    train, val, test = load_splits([0.6, 0.2, 0.2], seed=0, config=cfg,
                                   preload=False)
    stats = train_loop(cfg, os.path.join(str(tmp_path), "m_stream"),
                       train, val, test, mesh=make_mesh(1), verbose=False)
    assert np.isfinite(stats["train_loss"][2])
    # lazy slides got unloaded after each batch
    assert all(s._tables is None for s in train.slides)

    # same data, fused engine: identical first-epoch loss (same seeds)
    cfg.engine = "fused"
    stats_f = train_loop(cfg, os.path.join(str(tmp_path), "m_fused"),
                         train, val, test, mesh=make_mesh(1), verbose=False)
    np.testing.assert_allclose(stats["train_loss"][1],
                               stats_f["train_loss"][1], rtol=2e-4)


def test_streaming_dp_matches_single_device(tmp_path):
    """engine='streaming' on an 8-device data-parallel mesh reproduces the
    single-device trajectory (selection pass + sharded replay + gradient
    all-reduce, same seeds and batches)."""
    import os

    from paths_tpu.parallel.mesh import make_mesh
    from paths_tpu.train.loop import train_loop

    cfg, ds_ = setup(tmp_path, n=10)
    cfg.engine = "streaming"
    cfg.num_epochs = 2
    train, val, test = load_splits([0.6, 0.2, 0.2], seed=0, config=cfg,
                                   preload=False)
    s1 = train_loop(cfg, os.path.join(str(tmp_path), "s1"),
                    train, val, test, mesh=make_mesh(1), verbose=False)
    s8 = train_loop(cfg, os.path.join(str(tmp_path), "s8"),
                    train, val, test, mesh=make_mesh(8), verbose=False)
    for e in s1["train_loss"]:
        np.testing.assert_allclose(s1["train_loss"][e], s8["train_loss"][e],
                                   rtol=2e-4)


def test_streaming_seq_parallel_matches_1d(tmp_path):
    """engine='streaming' on a 2-D (2 data x 4 model) mesh — level-0 bag
    patch-sharded along `model`, attention threaded a SeqSharding —
    reproduces the 1-device streaming trajectory (backlog: streaming +
    sequence parallelism)."""
    import os

    from paths_tpu.parallel.mesh import make_mesh
    from paths_tpu.train.loop import train_loop

    cfg, _ = setup(tmp_path, n=10)
    cfg.engine = "streaming"
    cfg.num_epochs = 2
    train, val, test = load_splits([0.6, 0.2, 0.2], seed=0, config=cfg,
                                   preload=False)
    cfg.mesh_shape = [1]
    s1 = train_loop(cfg, os.path.join(str(tmp_path), "sq1"),
                    train, val, test, mesh=make_mesh(1), verbose=False)
    cfg.mesh_shape = [2, 4]
    s24 = train_loop(cfg, os.path.join(str(tmp_path), "sq24"),
                     train, val, test, verbose=False)
    for e in s1["train_loss"]:
        np.testing.assert_allclose(s1["train_loss"][e], s24["train_loss"][e],
                                   rtol=5e-4)


def test_streaming_seq_flash_kernel_grad_matches(tmp_path):
    """Streaming loss_and_grad with attention routed through the
    sequence-parallel flash kernel (attention_impl='pallas', interpreter)
    on a (2 data x 4 model) mesh matches the fused single-device
    gradients — selections, replay, and the shard_map custom VJP all
    agree."""
    import paths_tpu.kernels.flash_attention as fa
    from paths_tpu.parallel.mesh import (
        make_mesh_2d,
        replicate,
        shard_bag_patches,
    )

    cfg, ds = setup(tmp_path)
    idx = [0, 1, 2, 3]
    bag0, tables, labels = collate_batch(ds, idx, level0_bucket=8)
    params = recursive_init(jax.random.PRNGKey(0), cfg)

    # reference on the plain XLA path, single device
    (loss_f, aux_f), grads_f = jax.value_and_grad(
        lambda p: end2end_loss(p, cfg, bag0, tables, labels),
        has_aux=True)(params)

    cfg.attention_impl = "pallas"   # force the kernel for every bag size
    mesh = make_mesh_2d(2, 4)
    eng = StreamingEngine(cfg, mesh=mesh)
    assert eng._seq_mesh is not None and eng._seq_mesh.size == 4
    fa.INTERPRET = True
    try:
        loss_s, pred_s, grads_s = eng.loss_and_grad(
            replicate(mesh, params), shard_bag_patches(mesh, bag0),
            strip_tables(ds, idx), labels, deterministic=True)
        np.testing.assert_allclose(float(loss_s), float(loss_f), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(pred_s),
                                   np.asarray(aux_f["pred"]), atol=2e-5)
        for gf, gs in zip(jax.tree_util.tree_leaves(grads_f),
                          jax.tree_util.tree_leaves(grads_s)):
            np.testing.assert_allclose(np.asarray(gs), np.asarray(gf),
                                       atol=5e-5)
    finally:
        fa.INTERPRET = False


def test_lookup_host_fallback(tmp_path):
    """Host lookup reproduces the all-background fallback."""
    from paths_tpu.engine.tables import build_level_table

    grid = np.zeros((2, 2, 8), np.float32)      # all background
    t = build_level_table(grid, min_rows=8)
    child_locs = np.array([[[5, 5], [5, 6], [6, 5], [6, 6]] * 2])  # (1,8,2) OOB
    kvalid = np.ones((1, 8), bool)
    lk = lookup_host(child_locs, kvalid, [t])
    assert lk["use_fallback"][0]
    assert lk["mask"][0].sum() == 4             # all 4 raw cells
    np.testing.assert_array_equal(lk["locs"][0][:4],
                                  [[0, 0], [0, 1], [1, 0], [1, 1]])


def test_streaming_static_shapes_no_retrace(tmp_path):
    """Under shuffle, the streaming batch path must yield ONE level-0
    width across epochs when static_shapes pads are in play — per-batch
    maxima would re-trace fwd/select/grad every time the batch max crosses
    a bucket boundary (the multi-minute remote-compile hazard
    `data/dataset.py::global_pads` documents)."""
    from paths_tpu.train.loop import _epoch_batches_streaming

    tmp = str(tmp_path)
    # base_hw=(4,5) + the per-slide +0..2 jitter puts n0 in 20..42, so
    # shuffled batch maxima straddle the 32-wide bucket boundary
    cfg = tiny_train_config(tmp)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=8,
                               base_hw=(4, 5))
    make_synthetic_metadata(cfg.csv_path, ids)
    ds = load_splits([1.0, 0.0, 0.0], seed=0, config=cfg)[0]

    def widths(pads, seeds):
        out = set()
        for seed in seeds:
            for bag0, *_ in _epoch_batches_streaming(
                    ds, 1, shuffle=True, seed=seed, mesh_size=1, config=cfg,
                    prefetch=0, pads=pads):
                out.add(bag0.fts.shape[1])
        return out

    # guard: without pads the widths DO vary (otherwise this test is vacuous)
    assert len(widths(None, [1])) >= 2

    pads = ds.global_pads(level0_only=True)
    w = widths(pads, [1, 2, 3])
    assert len(w) == 1, f"streaming retrace hazard: widths {w}"
    # level0-only pads scan must agree with the full scan's n0
    assert pads["n0"] == ds.global_pads()["n0"]


def test_epoch_batches_pad_final_batch_under_static_shapes(tmp_path):
    """With static_shapes pads, the FINAL partial batch pads up to the
    full batch width (one compiled program per run); without pads it
    keeps its natural size. 8 slides / batch 3 -> tail of 2."""
    from paths_tpu.train.loop import _epoch_batches, _epoch_batches_streaming

    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=8,
                               base_hw=(4, 5))
    make_synthetic_metadata(cfg.csv_path, ids)
    ds = load_splits([1.0, 0.0, 0.0], seed=0, config=cfg)[0]
    pads = ds.global_pads()

    def batch_dims(pads):
        # yields (bag0, tables, labels, w)
        return [(bag0.fts.shape[0], int(labels["weight"].shape[0]),
                 float(np.sum(w)))
                for bag0, tables, labels, w in _epoch_batches(
                    ds, 3, shuffle=False, seed=0, mesh_size=1, config=cfg,
                    prefetch=0, pads=pads)]

    dims = batch_dims(pads)
    assert [d[0] for d in dims] == [3, 3, 3]          # tail padded 2 -> 3
    assert [d[1] for d in dims] == [3, 3, 3]          # weights match width
    assert [d[2] for d in dims] == [3.0, 3.0, 2.0]    # pad weight is 0

    dims = batch_dims(None)
    assert [d[0] for d in dims] == [3, 3, 2]          # natural tail

    sdims = [bag0.fts.shape[0] for bag0, *_ in _epoch_batches_streaming(
        ds, 3, shuffle=False, seed=0, mesh_size=1, config=cfg,
        prefetch=0, pads=ds.global_pads(level0_only=True))]
    assert sdims == [3, 3, 3]
