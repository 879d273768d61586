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


@pytest.fixture(scope="module")
def jpeg_lib(built_lib):
    from paths_tpu.native import jpeg as njpeg
    from paths_tpu.native.build import build_jpeg

    if build_jpeg(verbose=False) is None:
        pytest.skip("libjpeg dev files unavailable")
    njpeg._tried = False
    njpeg._lib = None
    assert njpeg.available()
    yield njpeg
    njpeg._tried = False
    njpeg._lib = None


def _pil_jpeg(img, quality=85):
    import io

    from PIL import Image

    b = io.BytesIO()
    Image.fromarray(img).save(b, "JPEG", quality=quality)
    return b.getvalue()


def test_jpeg_batch_decode_matches_pil(jpeg_lib):
    """Native batched decode == PIL decode of the same streams (both
    are libjpeg; allow ±2 for IDCT variant differences across builds),
    with correct top-left placement, white padding, and failure slots."""
    import io

    from PIL import Image

    rng = np.random.default_rng(2)
    shapes = [(128, 128), (40, 96), (128, 128), (96, 128)]
    imgs = [(rng.random((h, w, 3)) * 255).astype(np.uint8)
            for h, w in shapes]
    bufs = [_pil_jpeg(im) for im in imgs]
    bufs.insert(2, b"\xff\xd8 definitely not a jpeg")

    out, dims = jpeg_lib.decode_batch(bufs, (128, 128))
    assert out.shape == (5, 128, 128, 3) and out.dtype == np.uint8
    assert dims[2].tolist() == [-1, -1]
    assert (out[2] == 255).all()                 # failed slot pad-filled
    for bi in [0, 1, 3, 4]:
        ref = np.asarray(Image.open(io.BytesIO(bufs[bi])).convert("RGB"))
        h, w = ref.shape[:2]
        assert dims[bi].tolist() == [h, w]
        diff = np.abs(out[bi, :h, :w].astype(int) - ref.astype(int))
        assert diff.max() <= 2
        assert (out[bi, h:] == 255).all() and (out[bi, :, w:] == 255).all()

    # oversize image counts as a failure, not a buffer overrun
    big = _pil_jpeg((rng.random((200, 64, 3)) * 255).astype(np.uint8))
    out2, dims2 = jpeg_lib.decode_batch([big], (128, 128))
    assert dims2[0].tolist() == [-1, -1] and (out2 == 255).all()

    assert jpeg_lib.header_dims(bufs[1]) == shapes[1]
    assert jpeg_lib.header_dims(b"junk") is None


def test_tiled_reader_native_decode_matches_pil(jpeg_lib, tmp_path):
    """TiledJpegWSI with the native batched decoder returns the same
    pixels as the PIL fallback for reads spanning many tiles, partial
    edge tiles, and out-of-bounds padding — including reads larger than
    the steady-state tile cache."""
    from paths_tpu.preprocess.wsi import TiledJpegWSI, write_tiled_jpeg

    rng = np.random.default_rng(3)
    base = (rng.random((500, 700, 3)) * 255).astype(np.uint8)
    d = str(tmp_path / "s.tiles")
    write_tiled_jpeg(base, d, base_power=10.0, tile=128, quality=90)

    nat = TiledJpegWSI(d, cache_tiles=4, decoder="native")
    pil = TiledJpegWSI(d, cache_tiles=4, decoder="pil")
    assert nat._native is not None and pil._native is None
    for power, loc, size in [(10.0, (100, 200), (300, 400)),  # 12 tiles > cap
                             (10.0, (400, 600), (256, 256)),  # partial OOB
                             (10.0, (-20, -20), (64, 64)),    # negative OOB
                             (2.5, (5, 10), (60, 80))]:       # pyramid level
        a = nat.read_rect(loc, size, power)
        b = pil.read_rect(loc, size, power)
        assert a.shape == b.shape == (*size, 3)
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 2, (power, loc)
    assert len(nat._cache) <= 4                  # cap restored after reads
    nat.close()
    pil.close()


def test_level0_bag_is_zero_copy_view():
    """level0_bag_arrays must return a VIEW of the grid (memmapped
    stores stay evictable page cache — ADVICE r4), never a copy."""
    rng = np.random.default_rng(1)
    g = rng.normal(size=(5, 7, 12)).astype(np.float32)
    fts, locs, n = T.level0_bag_arrays(g, 256)
    assert n == 35 and fts.base is g
    np.testing.assert_array_equal(fts, g.reshape(-1, 12))
