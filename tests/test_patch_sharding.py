"""Patch-axis (`model`) sharding: GSPMD sequence parallelism over a bag's
patch dimension (SURVEY.md §2 'TPU-native equivalents' — the multi-chip
path for level-0 bags too large for one chip). Sharded runs must
reproduce single-device numerics exactly; XLA inserts the attention
collectives."""
import jax
import numpy as np

from paths_tpu.engine.hierarchy import end2end_loss
from paths_tpu.models.recursive import recursive_apply, recursive_init
from paths_tpu.parallel.mesh import (
    make_mesh_2d,
    replicate,
    shard_bag_patches,
    shard_batch,
)
from test_hierarchy import jax_inputs, make_grids
from test_model_parity import small_config


def _setup(b=2, seed=0):
    cfg = small_config()
    rng = np.random.default_rng(seed)
    dims = [(2, 4), (4, 8), (8, 16)]   # n0 = 8: divisible by model axis
    slides = [make_grids(rng, dims, cfg.model_config.patch_embed_dim,
                         bg_fraction=0.0) for _ in range(b)]
    bag0, tables = jax_inputs(slides, cfg)
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    return cfg, params, bag0, tables


def test_level0_forward_patch_sharded_matches():
    """(1 data x 8 model): every patch column on a different device."""
    cfg, params, bag0, _ = _setup()
    ref = recursive_apply(params, cfg, 0, bag0)

    mesh = make_mesh_2d(1, 8)
    out = jax.jit(lambda p, b: recursive_apply(p, cfg, 0, b))(
        replicate(mesh, params), shard_bag_patches(mesh, bag0))
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["importance"]),
                               np.asarray(ref["importance"]), atol=1e-5)


def test_end2end_dp_plus_patch_sharding():
    """(2 data x 4 model): slides split across mesh rows, level-0 patches
    split across mesh columns, full 3-level recursion + loss."""
    cfg, params, bag0, tables = _setup(b=2)
    labels = {"survival_bin": jax.numpy.asarray([1, 0]),
              "censored": jax.numpy.asarray([0, 1])}
    ref_loss, ref_aux = end2end_loss(params, cfg, bag0, tables, labels)

    mesh = make_mesh_2d(2, 4)
    loss, aux = jax.jit(
        lambda p, b, t, l: end2end_loss(p, cfg, b, t, l))(
        replicate(mesh, params), shard_bag_patches(mesh, bag0),
        shard_batch(mesh, tables), shard_batch(mesh, labels))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux["pred"]),
                               np.asarray(ref_aux["pred"]), atol=1e-5)


def test_seq_flash_routing_matches_xla():
    """impl="pallas" + a 2-D mesh routes the aggregator's self-attention
    through the sequence-parallel shard_map flash kernel (including the
    N+1 -> multiple-of-sp padding for the special token); level-0 outputs
    match the unsharded XLA reference."""
    import dataclasses

    import paths_tpu.kernels.flash_attention as fa

    cfg, params, bag0, _ = _setup()
    ref = recursive_apply(params, cfg, 0, bag0)

    cfg2 = dataclasses.replace(cfg, attention_impl="pallas")
    mesh = make_mesh_2d(2, 4)
    fa.INTERPRET = True
    try:
        out = jax.jit(
            lambda p, b: recursive_apply(p, cfg2, 0, b, seq_mesh=mesh))(
            replicate(mesh, params), shard_bag_patches(mesh, bag0))
        np.testing.assert_allclose(np.asarray(out["logits"]),
                                   np.asarray(ref["logits"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out["importance"]),
                                   np.asarray(ref["importance"]), atol=2e-5)
    finally:
        fa.INTERPRET = False


def test_config_mesh_trajectory_matches_1d(tmp_path):
    """config.mesh_shape=[2, 4] drives a (data x model) mesh through the
    REAL train_loop; the multi-epoch training trajectory matches 1-D DP
    (VERDICT r2 item 1: seq parallelism as a first-class feature)."""
    import os

    from paths_tpu.data.dataset import load_splits
    from paths_tpu.data.synthetic import (
        make_synthetic_metadata,
        make_synthetic_store,
    )
    from paths_tpu.train.loop import train_loop
    from test_train_loop import tiny_train_config

    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp, num_epochs=3)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=8,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    train, _, test = load_splits([0.75, 0.0, 0.25], seed=0, config=cfg)

    cfg.mesh_shape = [1]
    s1 = train_loop(cfg, os.path.join(tmp, "m1"), train, None, test,
                    verbose=False)
    cfg.mesh_shape = [2, 4]
    s24 = train_loop(cfg, os.path.join(tmp, "m24"), train, None, test,
                     verbose=False)
    for e in s1["train_loss"]:
        np.testing.assert_allclose(s1["train_loss"][e],
                                   s24["train_loss"][e], rtol=5e-4)


def test_ring_schedule_routing_matches_xla():
    """config.seq_attention="ring" routes to the ring-scheduled kernel;
    level-0 outputs still match the unsharded XLA reference."""
    import dataclasses

    import paths_tpu.kernels.flash_attention as fa
    from paths_tpu.parallel.seq_attention import SeqSharding

    cfg, params, bag0, _ = _setup(seed=5)
    ref = recursive_apply(params, cfg, 0, bag0)

    cfg2 = dataclasses.replace(cfg, attention_impl="pallas",
                               seq_attention="ring")
    mesh = make_mesh_2d(2, 4)
    seq = SeqSharding(mesh, impl=cfg2.seq_attention)
    fa.INTERPRET = True
    try:
        out = jax.jit(
            lambda p, b: recursive_apply(p, cfg2, 0, b, seq_mesh=seq))(
            replicate(mesh, params), shard_bag_patches(mesh, bag0))
        np.testing.assert_allclose(np.asarray(out["logits"]),
                                   np.asarray(ref["logits"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out["importance"]),
                                   np.asarray(ref["importance"]), atol=2e-5)
    finally:
        fa.INTERPRET = False
