"""Preprocess-direction interop oracle (VERDICT r4 missing #3).

Round 4 closed the checkpoint direction (`convert.save_torch_checkpoint`
strict-loads into the reference); this closes the same hole one layer
down: a store written by OUR preprocessor with `--store-format pt` is
consumed by the ACTUAL reference code — `preprocess/loader.py:14-18`
(`torch.load` of `{id}_{power:.3f}.pt`) + `data_utils/slide.py:227-269`
(`PreprocessedSlide`) — and reproduces our level-0 bags exactly, so a
paths_tpu-preprocessed dataset can feed the reference's training script.

Skipped when /root/reference is not mounted.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from helpers_reference import reference_available, reference_modules
from paths_tpu.data.feature_store import FeatureStore
from paths_tpu.engine.tables import level0_bag_arrays
from paths_tpu.preprocess.pipeline import process_slide

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")

PATCH = 64
POWERS = [2.5, 5.0]


def _dummy_encoder(dim=33):
    def encode(imgs):  # (B, P, P, 3) in [0,1] -> mean-pool feature
        pooled = imgs.mean(axis=(1, 2))
        return jnp.tile(pooled, (1, dim // 3 + 1))[:, :dim] + 1.0

    return encode, dim


def _write_slide(tmp_path):
    rng = np.random.default_rng(0)
    rows = cols = 512
    img = np.full((rows, cols, 3), 240, np.uint8)
    yy, xx = np.mgrid[0:rows, 0:cols]
    blob = ((yy - rows // 2) ** 2 + (xx - cols // 3) ** 2) < (rows // 3) ** 2
    img[blob] = rng.integers(80, 160, (rows, cols, 3)).astype(np.uint8)[blob]
    p = os.path.join(str(tmp_path), "s0.npy")
    np.save(p, img)
    return p


@pytest.fixture(scope="module")
def pt_store(tmp_path_factory):
    """One slide preprocessed twice: native .npy and reference .pt."""
    tmp = tmp_path_factory.mktemp("pt_interop")
    path = _write_slide(tmp)
    encode, dim = _dummy_encoder()
    stores = {}
    for fmt in ("npy", "pt"):
        root = os.path.join(str(tmp), f"store_{fmt}")
        store = FeatureStore(root, create=True, save_format=fmt)
        process_slide(path, "s0", encode, dim, POWERS, store,
                      patch_size=PATCH, batch_size=16, threads=2,
                      default_power=10.0)
        stores[fmt] = store
    return stores


def test_pt_store_writes_reference_format(pt_store):
    store = pt_store["pt"]
    for power in POWERS:
        p = store.path("s0", power)
        assert p is not None and p.endswith(".pt"), p
        t = torch.load(p, weights_only=True)
        assert isinstance(t, torch.Tensor) and t.dtype == torch.float32
        assert t.ndim == 3
        # our own loader reads the pt grid back identically to the npy one
        np.testing.assert_array_equal(
            np.asarray(store.load("s0", power)),
            np.asarray(pt_store["npy"].load("s0", power)))


def test_reference_loader_and_slide_consume_pt_store(pt_store):
    """The reference's own loader + PreprocessedSlide over OUR store:
    level grids and the level-0 bag must equal our data path's."""
    store = pt_store["pt"]
    with reference_modules("preprocess.loader", "data_utils.slide") as (
            loader, ref_slide):
        loader.set_preprocess_dir(store.root)

        # the raw loader contract ({id}_{power:.3f}.pt)
        for power in POWERS:
            ref_grid = loader.load("s0", power)
            np.testing.assert_array_equal(
                ref_grid.numpy(), np.asarray(store.load("s0", power)))

        s = ref_slide.load_patch_preprocessed_slide(
            "s0.svs", base_power=POWERS[0], patch_size=PATCH,
            ctx_dim=(8, 8), num_levels=len(POWERS))

    # reference level-0 bag (all grid cells, row-major,
    # `data_utils/slide.py:258-269`) == our level0_bag_arrays on the grid
    grid0 = np.asarray(pt_store["npy"].load("s0", POWERS[0]))
    our_fts, our_locs, n = level0_bag_arrays(grid0, PATCH)
    ref_fts0 = s.fts[0].numpy()
    assert ref_fts0.shape[0] == n
    np.testing.assert_array_equal(ref_fts0, np.asarray(our_fts)[:n])
    # reference locs are grid coords; ours are pixel coords (x PATCH)
    np.testing.assert_array_equal(s.locs.numpy() * PATCH,
                                  np.asarray(our_locs)[:n])
    # deeper levels ride the same grids
    np.testing.assert_array_equal(
        s.fts[1].numpy(), np.asarray(pt_store["npy"].load("s0", POWERS[1])))


def test_pt_store_resume_skips_existing(pt_store, capsys):
    """Skip-if-exists resume treats .pt outputs as present (reference
    `preprocess.py:134-136` semantics)."""
    store = pt_store["pt"]
    before = {p: os.path.getmtime(store.path("s0", p)) for p in POWERS}

    def exploding_encode(imgs):  # must never run on resume
        raise AssertionError("resume re-encoded an existing grid")

    path = os.path.join(os.path.dirname(store.root), "s0.npy")
    process_slide(path, "s0", exploding_encode, 33, POWERS, store,
                  patch_size=PATCH, batch_size=16, threads=2,
                  default_power=10.0)
    after = {p: os.path.getmtime(store.path("s0", p)) for p in POWERS}
    assert before == after
