"""Training loop: loss decreases, checkpoints resume, DP over the 8-device
virtual mesh with batch padding, CLI entry point."""
import json
import os

import numpy as np
import pytest

from paths_tpu.config import Config, PATHSProcessorConfig
from paths_tpu.data.dataset import load_splits
from paths_tpu.data.synthetic import make_synthetic_metadata, make_synthetic_store
from paths_tpu.parallel.mesh import make_mesh
from paths_tpu.train.loop import train_loop
from paths_tpu.train.state import load_state, save_state


def tiny_train_config(tmp, **kw) -> Config:
    mc = PATHSProcessorConfig(patch_embed_dim=16, trans_dim=8, trans_heads=2,
                              trans_layers=1, importance_mlp_hidden_dim=8,
                              hierarchical_ctx_mlp_hidden_dim=8,
                              pos_encoding_mode="2d", dropout=0.0)
    # level0_bucket=32 pads every batch to ONE static width: the whole
    # loop then compiles a single program per mesh (test speed on 1 core)
    defaults = dict(num_levels=3, top_k_patches=2, nbins=2, task="survival",
                    num_epochs=2, lr=1e-3, batch_size=4, level0_bucket=32,
                    csv_path=os.path.join(tmp, "meta.csv.zip"),
                    preprocess_dir=os.path.join(tmp, "store"),
                    wsi_dir=os.path.join(tmp, "brca"))
    defaults.update(kw)
    return Config(model_config=mc, **defaults)


@pytest.fixture
def ds(tmp_path):
    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=12,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    train, val, test = load_splits([0.6, 0.2, 0.2], seed=0, config=cfg)
    return tmp, cfg, train, val, test


def test_train_loop_runs_and_learns(ds):
    tmp, cfg, train, val, test = ds
    cfg.num_epochs = 6
    cfg.lr = 3e-3
    mdir = os.path.join(tmp, "model")
    mesh = make_mesh(1)
    stats = train_loop(cfg, mdir, train, val, test, mesh=mesh, verbose=False)

    losses = stats["train_loss"]
    assert set(losses) == {1, 2, 3, 4, 5, 6}
    assert losses[6] < losses[1], f"no learning: {losses}"
    assert os.path.isfile(os.path.join(mdir, "model.npz"))
    # test metrics go to the logger (reference behavior: train_stats only
    # tracks keys initialized by the loop, train.py:39-41)
    lines = open(os.path.join(mdir, "metrics.jsonl")).read().splitlines()
    assert len(lines) >= 6 and "train_loss" in lines[0]
    assert "test_c-index" in lines[-1]


def test_train_generalizes_on_signal(tmp_path):
    """End-to-end learning proof on held-out data: slides carry a latent
    risk signal in their features (`make_signal_store`), survival times
    derive from it (`make_signal_metadata`), and training must push the
    TEST-split c-index well above chance. This is the closest available
    proxy for the real-TCGA c-index validation (network-blocked —
    BASELINE.md north star)."""
    import json

    from paths_tpu.data.synthetic import make_signal_metadata, make_signal_store

    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp, num_epochs=10, lr=3e-3, eval_epochs=2)
    ids, z = make_signal_store(cfg.preprocess_dir, cfg, num_slides=60,
                               base_hw=(3, 3), seed=0)
    make_signal_metadata(cfg.csv_path, ids, z, seed=0)
    train, val, test = load_splits([0.6, 0.2, 0.2], seed=0, config=cfg)

    mdir = os.path.join(tmp, "model")
    stats = train_loop(cfg, mdir, train, val, test, mesh=make_mesh(1),
                       verbose=False)

    assert stats["train_loss"][cfg.num_epochs] < stats["train_loss"][1]
    lines = open(os.path.join(mdir, "metrics.jsonl")).read().splitlines()
    final = json.loads(lines[-1])
    # fixed seed scores 0.833 here; 0.80 is the VERDICT-r3 bar (the
    # injected signal supports it — BACKLOG 0.80-0.85 across seeds)
    assert final["test_c-index"] >= 0.80, (
        f"no generalization: test c-index {final['test_c-index']:.3f} "
        f"(val history {stats.get('val_c-index')})")


@pytest.mark.parametrize("engine", ["fused", "streaming"])
def test_cache_eval_batches_matches(ds, engine):
    """cache_eval_batches=True (device-resident eval batches reused
    across eval epochs; for streaming, the collated level-0 bag — the
    per-batch H2D that dominates eval cost on slow links) reproduces the
    uncached run's metrics exactly, in BOTH engines."""
    import json

    tmp, cfg, train, val, test = ds
    cfg.num_epochs = 4
    cfg.eval_epochs = 2
    cfg.engine = engine
    stats = {}
    for flag in (False, True):
        cfg.cache_eval_batches = flag
        mdir = os.path.join(tmp, f"model_evcache_{engine}_{flag}")
        train_loop(cfg, mdir, train, val, test, mesh=make_mesh(1),
                   verbose=False)
        lines = open(os.path.join(mdir, "metrics.jsonl")).read().splitlines()
        stats[flag] = [json.loads(l) for l in lines]
    assert len(stats[False]) == len(stats[True])
    for a, b in zip(stats[False], stats[True]):
        assert a.keys() == b.keys()
        for k in a:
            assert a[k] == b[k], (k, a, b)


def test_train_generalizes_on_signal_streaming(tmp_path):
    """The streaming engine (host-resident tables) learns the same
    held-out signal end to end — generalization isn't an artifact of
    the fused engine's data flow."""
    import json

    from paths_tpu.data.synthetic import make_signal_metadata, make_signal_store

    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp, num_epochs=10, lr=3e-3, eval_epochs=5,
                            engine="streaming")
    ids, z = make_signal_store(cfg.preprocess_dir, cfg, num_slides=60,
                               base_hw=(3, 3), seed=0)
    make_signal_metadata(cfg.csv_path, ids, z, seed=0)
    train, val, test = load_splits([0.6, 0.2, 0.2], seed=0, config=cfg)

    mdir = os.path.join(tmp, "model")
    train_loop(cfg, mdir, train, val, test, mesh=make_mesh(1),
               verbose=False)
    lines = open(os.path.join(mdir, "metrics.jsonl")).read().splitlines()
    final = json.loads(lines[-1])
    # identical trajectory to the fused run (0.833); same 0.80 bar
    assert final["test_c-index"] >= 0.80, f"no generalization: {final}"


@pytest.mark.parametrize("engine", ["fused", "streaming"])
def test_train_generalizes_on_signal_subtype(tmp_path, engine):
    """Same held-out learning proof for the classification task, on BOTH
    engines: subtype labels derive (noisily) from the latent feature
    signal, and the TEST-split AUC must clear chance decisively (fixed
    seed scores 0.944 at 15 epochs; 0.85 bar)."""
    import json

    from paths_tpu.data.synthetic import make_signal_metadata, make_signal_store

    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp, num_epochs=15, lr=3e-3, eval_epochs=3,
                            task="subtype_classification",
                            filter_to_subtypes=["IDC", "ILC"], nbins=2,
                            engine=engine)
    ids, z = make_signal_store(cfg.preprocess_dir, cfg, num_slides=60,
                               base_hw=(3, 3), seed=3)
    make_signal_metadata(cfg.csv_path, ids, z, seed=3,
                         subtypes=["IDC", "ILC"])
    train, val, test = load_splits([0.6, 0.2, 0.2], seed=3, config=cfg)

    mdir = os.path.join(tmp, "model")
    train_loop(cfg, mdir, train, val, test, mesh=make_mesh(1),
               verbose=False)
    lines = open(os.path.join(mdir, "metrics.jsonl")).read().splitlines()
    final = json.loads(lines[-1])
    assert final["test_AUC"] >= 0.85, f"no generalization: {final}"


def test_train_resumes_from_checkpoint(ds):
    tmp, cfg, train, val, test = ds
    mdir = os.path.join(tmp, "model_resume")
    mesh = make_mesh(1)
    cfg.num_epochs = 2
    stats1 = train_loop(cfg, mdir, train, val, test, mesh=mesh, verbose=False)
    # saved stats claim completion at epoch 2; extend and resume
    cfg.num_epochs = 3
    stats2 = train_loop(cfg, mdir, train, val, test, mesh=mesh, verbose=False)
    # resumed at saved epoch (=2, reference semantics: train_stats["epoch"]
    # is num_epochs at completion and resume re-runs it), then epoch 3;
    # epoch-1 history survives from the first run
    assert set(stats2["train_loss"]) == {1, 2, 3}
    assert stats2["epoch"] == 3


def test_train_dp_mesh_padding(ds):
    """8-device mesh with 7 train slides: batches pad to mesh multiples
    with zero-weighted duplicates; loss stays finite and weighted."""
    tmp, cfg, train, val, test = ds
    mdir = os.path.join(tmp, "model_dp")
    mesh = make_mesh(8)
    cfg.num_epochs = 1
    cfg.batch_size = [4]
    stats = train_loop(cfg, mdir, train, val, test, mesh=mesh, verbose=False)
    assert np.isfinite(stats["train_loss"][1])


def test_dp_matches_single_device(ds):
    """The sharded update must produce the same training trajectory as a
    single device (same seeds, same batches)."""
    tmp, cfg, train, val, test = ds
    cfg.num_epochs = 2
    s1 = train_loop(cfg, os.path.join(tmp, "m1"), train, val, test,
                    mesh=make_mesh(1), verbose=False)
    s8 = train_loop(cfg, os.path.join(tmp, "m8"), train, val, test,
                    mesh=make_mesh(8), verbose=False)
    for e in s1["train_loss"]:
        np.testing.assert_allclose(s1["train_loss"][e], s8["train_loss"][e],
                                   rtol=2e-4)


def test_early_stopping_saves_best(ds):
    tmp, cfg, train, val, test = ds
    cfg.early_stopping = True
    cfg.num_epochs = 3
    mdir = os.path.join(tmp, "model_es")
    stats = train_loop(cfg, mdir, train, val, test, mesh=make_mesh(1),
                       verbose=False)
    assert stats["epoch"] == cfg.num_epochs
    assert os.path.isfile(os.path.join(mdir, "model.npz"))


def test_grad_clipping(ds):
    import jax
    import jax.numpy as jnp

    from paths_tpu.models.recursive import recursive_init
    from paths_tpu.train.loop import make_optimizer

    tmp, cfg, train, val, test = ds
    cfg.clip_grad_norm = 1e-4  # absurdly tight: updates must shrink
    tx = make_optimizer(cfg)
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 100.0, params)
    updates, _ = tx.update(grads, opt_state, params)
    # clipped global update magnitude bounded by lr * something tiny
    gn = float(jnp.sqrt(sum(jnp.sum(u * u)
                            for u in jax.tree_util.tree_leaves(updates))))
    assert gn < 1.0

    # end-to-end: still trains with clipping active
    cfg.num_epochs = 1
    stats = train_loop(cfg, os.path.join(tmp, "m_clip"), train, val, test,
                       mesh=make_mesh(1), verbose=False)
    assert np.isfinite(stats["train_loss"][1])


def test_train_bf16_compute(ds):
    """bfloat16 compute path: finite losses, fp32 params maintained."""
    import jax

    tmp, cfg, train, val, test = ds
    cfg.compute_dtype = "bfloat16"
    cfg.num_epochs = 1
    mdir = os.path.join(tmp, "model_bf16")
    stats = train_loop(cfg, mdir, train, val, test, mesh=make_mesh(1),
                       verbose=False)
    assert np.isfinite(stats["train_loss"][1])


def test_state_roundtrip(tmp_path):
    import jax

    from paths_tpu.models.recursive import recursive_init

    cfg = tiny_train_config(str(tmp_path))
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    stats = {"epoch": 5, "train_loss": {1: 0.5, 2: 0.4}}
    save_state(str(tmp_path), params, train_stats=stats)
    params2 = recursive_init(jax.random.PRNGKey(1), cfg)
    params2, _, stats2 = load_state(str(tmp_path), params2)
    np.testing.assert_array_equal(
        np.asarray(params["procs"][0]["classification"]["w"]),
        np.asarray(params2["procs"][0]["classification"]["w"]))
    assert stats2["epoch"] == 5
    assert stats2["train_loss"][2] == 0.4  # int keys restored from json


def test_state_roundtrip_orbax(tmp_path):
    """Orbax backend: params + optimizer state round-trip, auto-detected
    by load_state; params pytree contains Static metadata-free leaves."""
    import jax
    import optax

    from paths_tpu.models.recursive import recursive_init
    from paths_tpu.train.loop import make_optimizer

    cfg = tiny_train_config(str(tmp_path))
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    stats = {"epoch": 3, "train_loss": {1: 0.9}}
    save_state(str(tmp_path), params, opt_state, stats, backend="orbax")

    params2 = recursive_init(jax.random.PRNGKey(1), cfg)
    opt_state2 = tx.init(params2)
    params2, opt_state2, stats2 = load_state(str(tmp_path), params2,
                                             opt_state2)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(opt_state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert stats2["epoch"] == 3

    # inference-style load (evaluate/predict/heatmap CLIs): no opt_state
    # template, yet the checkpoint contains one — must restore params
    params3 = recursive_init(jax.random.PRNGKey(2), cfg)
    params3, none_opt, _ = load_state(str(tmp_path), params3)
    assert none_opt is None
    np.testing.assert_array_equal(
        np.asarray(params["procs"][0]["classification"]["w"]),
        np.asarray(params3["procs"][0]["classification"]["w"]))

    # params-only checkpoint loaded WITH an opt template: opt untouched
    save_state(str(tmp_path / "ponly"), params, train_stats=stats,
               backend="orbax")
    params4 = recursive_init(jax.random.PRNGKey(3), cfg)
    opt4 = tx.init(params4)
    params4, opt4b, _ = load_state(str(tmp_path / "ponly"), params4, opt4)
    assert opt4b is opt4


def test_cli_train(ds, monkeypatch):
    tmp, cfg, *_ = ds
    mdir = os.path.join(tmp, "model_cli")
    os.makedirs(mdir)
    cfg.num_epochs = 1
    cfg.hipt_splits = False
    cfg.save(mdir)

    from paths_tpu.cli.train import main

    main(["-m", mdir, "--no-wandb"])
    assert os.path.isfile(os.path.join(mdir, "model.npz"))
    assert os.path.isfile(os.path.join(mdir, "train_stats.json"))
    stats = json.load(open(os.path.join(mdir, "train_stats.json")))
    assert stats["epoch"] == 1


def test_train_rbg_prng(ds):
    """prng_impl="rbg" (the TPU default via "auto"): one epoch trains to
    a finite loss; masks differ from threefry but semantics (iid
    Bernoulli dropout) are the same."""
    tmp, cfg, train, val, test = ds
    cfg.prng_impl = "rbg"
    cfg.model_config.dropout = 0.1
    cfg.num_epochs = 1
    stats = train_loop(cfg, os.path.join(tmp, "m_rbg"), train, val, test,
                       mesh=make_mesh(1), verbose=False)
    assert np.isfinite(stats["train_loss"][1])


def test_make_train_rng_impls(tmp_path):
    """"auto" resolves to threefry on CPU (byte-stable test trajectories);
    explicit "rbg" yields a typed rbg key; both seed deterministically."""
    import jax

    from paths_tpu.train.loop import make_train_rng

    cfg = tiny_train_config(str(tmp_path))
    k1 = make_train_rng(cfg)
    assert "threefry" in str(jax.random.key_impl(k1))
    cfg.prng_impl = "rbg"
    k2 = make_train_rng(cfg)
    assert "rbg" in str(jax.random.key_impl(k2))
    k3 = make_train_rng(cfg)
    assert jax.numpy.array_equal(jax.random.key_data(k2),
                                 jax.random.key_data(k3))


def test_no_device_constants_in_step_programs(ds):
    """The jaxprs of the train/eval steps must embed no jax.Array
    constants — a committed device array in the closure becomes a
    *device* HLO constant that lowering fetches device->host on every
    process start (32 bytes measured 135s through a remote-device
    tunnel; see CHILD_OFFSETS in engine/hierarchy.py). Host numpy
    constants are fine: they embed into the HLO at trace time."""
    import jax

    from paths_tpu.data.dataset import union_pads
    from paths_tpu.models.recursive import recursive_init
    from paths_tpu.train.loop import (_epoch_batches, make_optimizer,
                                      make_step_fns, make_train_rng,
                                      mesh_from_config)

    tmp, cfg, train, val, test = ds
    mesh = mesh_from_config(cfg)
    pads = union_pads(*(d.global_pads() for d in [train, val, test]))
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    update, evaluate = make_step_fns(cfg, tx, mesh=mesh)
    bag0, tables, labels, w = next(iter(_epoch_batches(
        train, cfg.batch_size[0], shuffle=False, seed=0, mesh_size=1,
        config=cfg, pads=pads)))
    rng = make_train_rng(cfg)
    ep = jax.numpy.asarray(1.0)

    for name, jaxpr in [
        ("update", jax.make_jaxpr(update.__wrapped__)(
            params, opt_state, bag0, tables, labels, rng, ep)),
        ("evaluate", jax.make_jaxpr(evaluate.__wrapped__)(
            params, bag0, tables, labels)),
    ]:
        offenders = [(type(c).__name__, getattr(c, "shape", None))
                     for c in jaxpr.consts if isinstance(c, jax.Array)]
        assert not offenders, \
            f"{name} embeds device-array constants: {offenders}"
