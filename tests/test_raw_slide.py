"""RawSlide on-the-fly path + heatmap rendering on a synthetic WSI."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from paths_tpu.config import Config, PATHSProcessorConfig
from paths_tpu.data.raw_slide import (
    RawSlide,
    encode_bag,
    load_raw_slide,
    patchify_locs,
)
from paths_tpu.models.recursive import recursive_init
from paths_tpu.viz.heatmap import heatmap_slide, parse_camelyon17_anno_file
from test_preprocess import make_fake_slide


def small_cfg():
    mc = PATHSProcessorConfig(patch_embed_dim=12, trans_dim=8, trans_heads=2,
                              trans_layers=1, importance_mlp_hidden_dim=8,
                              hierarchical_ctx_mlp_hidden_dim=8,
                              pos_encoding_mode="2d", patch_size=64)
    return Config(model_config=mc, num_levels=3, top_k_patches=2, nbins=2)


def dummy_encoder(dim=12):
    def encode(imgs):
        pooled = imgs.mean(axis=(1, 2))
        return jnp.tile(pooled, (1, dim // 3 + 1))[:, :dim] + 0.5
    return encode


def slide_file(tmp_path, rows=1024, cols=1024):
    img, blob = make_fake_slide(rows=rows, cols=cols)
    path = os.path.join(str(tmp_path), "slide.npy")
    np.save(path, img)
    return path, img, blob


def test_patchify_locs_order():
    img = np.arange(4 * 4 * 1).reshape(4, 4, 1).astype(np.float32)
    patches, locs = patchify_locs(img, 2, (10, 20))
    assert patches.shape == (4, 2, 2, 1)
    np.testing.assert_array_equal(
        locs, [[10, 20], [10, 22], [12, 20], [12, 22]])
    np.testing.assert_array_equal(patches[0, :, :, 0], [[0, 1], [4, 5]])
    np.testing.assert_array_equal(patches[1, :, :, 0], [[2, 3], [6, 7]])


def test_load_raw_slide_filters_background(tmp_path):
    path, img, blob = slide_file(tmp_path)
    cfg = small_cfg()
    # base power 10 on a 40x slide: level-0 grid = 256px/64 = 4x4
    slide = load_raw_slide(path, 10.0, 64, cfg.model_config.ctx_dim(),
                           tissue_threshold=0.1, camelyon=False)
    assert slide.patches is not None
    n = slide.patches.shape[0]
    assert 0 < n < 16  # background got filtered
    assert slide.ctx_patch.shape == (n, 0, cfg.model_config.ctx_dim()[1])


def test_recursion_zooms_into_tissue(tmp_path):
    path, img, blob = slide_file(tmp_path)
    cfg = small_cfg()
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    encode = dummy_encoder()

    slide = load_raw_slide(path, 10.0, 64, cfg.model_config.ctx_dim(),
                           tissue_threshold=0.1, camelyon=False)
    slides = [slide]
    for depth in range(cfg.num_levels):
        bag = encode_bag(slide, encode, batch_size=32)
        from paths_tpu.models.recursive import recursive_apply

        out = recursive_apply(params, cfg, depth, bag)
        if depth != cfg.num_levels - 1:
            slide = slide.recurse(2, np.asarray(out["ctx_slide"][0]),
                                  np.asarray(out["ctx_patch"][0]),
                                  np.asarray(out["importance"][0]),
                                  cfg.top_k_patches[depth])
            slide.load_patches()
            slides.append(slide)

    assert slides[1].power == 20.0 and slides[2].power == 40.0
    # K=2 parents -> at most 2*(multiplier^2 * patches per load) patches
    assert slides[1].load_locs.shape[0] == 2
    # parent_ind_map points into the parent's patch list
    pim = slides[1].parent_ind_map()
    assert (pim >= 0).all() and (pim < slides[0].patches.shape[0]).all()


def test_all_background_fallback(tmp_path):
    """A pure-white slide: adaptive threshold halving then keep patch 0
    (slide.py:143-160)."""
    img = np.full((512, 512, 3), 245, np.uint8)
    path = os.path.join(str(tmp_path), "white.npy")
    np.save(path, img)
    cfg = small_cfg()
    slide = load_raw_slide(path, 10.0, 64, cfg.model_config.ctx_dim(),
                           tissue_threshold=0.5, camelyon=False)
    assert slide.patches.shape[0] >= 1


def test_heatmap_end_to_end(tmp_path):
    path, img, blob = slide_file(tmp_path)
    cfg = small_cfg()
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    out_pdf = os.path.join(str(tmp_path), "hm.pdf")
    result = heatmap_slide(cfg, params, dummy_encoder(), path, None, out_pdf,
                           tissue_threshold=0.05, camelyon=False,
                           default_power=40.0)
    assert os.path.isfile(result) and os.path.getsize(result) > 1000


def test_heatmap_cli(tmp_path):
    """The heatmap CLI surface: config dir + checkpoint -> PDF."""
    import jax

    from paths_tpu.cli.heatmap import main
    from paths_tpu.train.state import save_state

    path, img, blob = slide_file(tmp_path)
    cfg = small_cfg()
    mdir = os.path.join(str(tmp_path), "model")
    os.makedirs(mdir)
    # heatmap CLI hard-codes patch_embed_dim to the encoder dim; use a
    # config matching kaiko-vits16 (384) but tiny transformer
    cfg.model_config.patch_embed_dim = 384
    cfg.save(mdir)
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    save_state(mdir, params)

    out = os.path.join(str(tmp_path), "hm_cli.pdf")
    main(["-m", mdir, "-s", path, "-o", out, "--encoder", "kaiko-vits16",
          "--no-camelyon", "--tissue-threshold", "0.05",
          "--default-power", "40"])
    assert os.path.isfile(out) and os.path.getsize(out) > 1000


def test_heatmap_from_store_cli(tmp_path):
    """--slide-id renders an importance heatmap straight from the
    feature store (no raw WSI, no encoder)."""
    import jax

    from paths_tpu.cli.heatmap import main
    from paths_tpu.data.synthetic import make_synthetic_store
    from paths_tpu.train.state import save_state
    from test_train_loop import tiny_train_config

    tmp = str(tmp_path)
    cfg = tiny_train_config(tmp)
    ids = make_synthetic_store(cfg.preprocess_dir, cfg, num_slides=2,
                               base_hw=(3, 3))
    mdir = os.path.join(tmp, "model")
    os.makedirs(mdir)
    cfg.save(mdir)
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    save_state(mdir, params)

    out = os.path.join(tmp, "hm_store.pdf")
    main(["-m", mdir, "--slide-id", ids[0], "-o", out])
    assert os.path.isfile(out) and os.path.getsize(out) > 1000

    # exactly one of --slide-path / --slide-id
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["-m", mdir, "-o", out])


def test_camelyon_xml_parsing(tmp_path):
    xml = """<?xml version="1.0"?>
<ASAP_Annotations>
  <Annotations>
    <Annotation Name="A0" Type="Polygon" PartOfGroup="Tumor" Color="#F4FA58">
      <Coordinates>
        <Coordinate Order="0" X="100.5" Y="200.5"/>
        <Coordinate Order="1" X="300.0" Y="200.0"/>
        <Coordinate Order="2" X="200.0" Y="400.0"/>
      </Coordinates>
    </Annotation>
  </Annotations>
  <AnnotationGroups>
    <Group Name="Tumor" PartOfGroup="None" Color="#F4FA58"/>
  </AnnotationGroups>
</ASAP_Annotations>"""
    p = os.path.join(str(tmp_path), "anno.xml")
    with open(p, "w") as f:
        f.write(xml)
    polys = parse_camelyon17_anno_file(p)
    assert len(polys) == 1
    coords, color = polys[0]
    assert coords[0] == (100.5, 200.5) and len(coords) == 3


def test_folded_importance_matches_naive_painter():
    """The vectorized canvas painting (cell-grid scatter + repeat-upsample
    + fold) must equal a naive per-patch painter implementing the
    reference's semantics (`heatmap_visualise.py:136-155`): paint
    imp + eps into each visited patch's depth-0 rectangle per level, then
    fold child levels into parents with 0.5 weight where the child canvas
    is nonzero."""
    from types import SimpleNamespace

    from paths_tpu.viz.heatmap import FOLD_WEIGHT, VISITED_EPS, folded_importance

    rng = np.random.default_rng(0)
    P = 64
    H, W = 250, 310                     # not multiples of any patch size
    L = 3
    slides, imps = [], []
    for depth in range(L):
        size = P >> depth
        gh, gw = H // size + 1, W // size + 1
        n = int(rng.integers(1, 8))
        cells = rng.choice(gh * gw, size=n, replace=False)
        ys, xs = np.divmod(cells, gw)
        # locs in depth-d pixel space: multiples of P (recursion invariant)
        locs = np.stack([ys, xs], 1) * P
        slides.append(SimpleNamespace(locs=locs))
        imps.append(rng.normal(size=n).astype(np.float32))

    got = folded_importance(slides, imps, P, (H, W))

    naive = np.zeros((L, H, W))
    for depth in range(L):
        size = max(P >> depth, 1)
        for (y, x), v in zip(np.asarray(slides[depth].locs) // P, imps[depth]):
            y0, x0 = y * size, x * size
            naive[depth, y0: y0 + size, x0: x0 + size] = v + VISITED_EPS
    for depth in range(L - 2, -1, -1):
        m = naive[depth + 1] != 0
        naive[depth][m] += naive[depth + 1][m] * FOLD_WEIGHT
    np.testing.assert_allclose(got, naive[0], atol=1e-12)


def test_run_recursion_caches_jits(tmp_path):
    """Repeat slides on one Config reuse the SAME jitted applies: a fresh
    jax.jit wrapper per call retraces every depth's program per slide
    (and re-pays per-executable first-execution cost on remote-compile
    links)."""
    from paths_tpu.viz.heatmap import run_recursion

    path, _, _ = slide_file(tmp_path)
    cfg = small_cfg()
    params = recursive_init(jax.random.PRNGKey(0), cfg)
    enc = dummy_encoder()

    run_recursion(cfg, params, enc, path, tissue_threshold=0.05,
                  camelyon=False, default_power=40.0, verbose=False)
    first = dict(cfg._recursion_jits)
    assert set(first) == set(range(cfg.num_levels))
    run_recursion(cfg, params, enc, path, tissue_threshold=0.05,
                  camelyon=False, default_power=40.0, verbose=False)
    assert all(cfg._recursion_jits[d] is first[d] for d in first)
