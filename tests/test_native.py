"""Native (C++/OpenMP) host kernels vs the numpy reference paths."""
import shutil

import numpy as np
import pytest

import paths_tpu.engine.tables as T
import paths_tpu.native as native


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    from paths_tpu.native.build import build

    build(verbose=False)
    native._tried = False
    native._lib = None
    assert native.available()
    yield
    native._tried = False
    native._lib = None


def _numpy_table(grid, min_rows):
    """Force the numpy implementation regardless of the built lib."""
    native._lib, native._tried = None, True
    try:
        return T.build_level_table(grid, min_rows)
    finally:
        native._lib, native._tried = None, False


def test_table_native_matches_numpy():
    rng = np.random.default_rng(0)
    for (h, w, d), bgf, rows in [((7, 9, 16), 0.5, 20), ((32, 40, 64), 0.3, 0),
                                 ((4, 4, 8), 1.0, 12), ((4, 4, 8), 0.0, 0)]:
        g = rng.normal(size=(h, w, d)).astype(np.float32)
        g[rng.uniform(size=(h, w)) < bgf] = 0
        nat = native.build_level_table_native(g, rows)
        ref = _numpy_table(g, rows)
        assert nat["count"] == ref["count"]
        assert nat["fts"].shape == ref["fts"].shape
        np.testing.assert_array_equal(nat["index"], ref["index"])
        np.testing.assert_array_equal(nat["locs"], ref["locs"])
        np.testing.assert_array_equal(nat["fts"], ref["fts"])
        np.testing.assert_array_equal(nat["grid_hw"], ref["grid_hw"])


def test_level0_native_matches_numpy():
    rng = np.random.default_rng(1)
    g = rng.normal(size=(5, 7, 12)).astype(np.float32)
    nat_f, nat_l, nat_n = native.level0_bag_native(g, 256)

    native._lib, native._tried = None, True
    try:
        ref_f, ref_l, ref_n = T.level0_bag_arrays(g, 256)
    finally:
        native._lib, native._tried = None, False

    assert nat_n == ref_n
    np.testing.assert_array_equal(nat_f, ref_f)
    np.testing.assert_array_equal(nat_l, ref_l)
