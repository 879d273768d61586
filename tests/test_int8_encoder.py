"""Int8 encoder kernels (kernels/vit_int8.py): exact-match against the
pure-jnp mirror of the quantized math, bounded quantization error vs the
f32 path, and registry integration. Kernels run in the Pallas interpreter
on CPU; on-chip numerics are certified by bench.py's kernel_parity block.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paths_tpu.encoders.vit import ViTSpec, stack_vit_blocks, vit_apply, vit_init
from paths_tpu.kernels import vit_int8 as vi8


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(vi8, "INTERPRET", True)


def small_spec(**kw):
    base = dict(img_size=32, patch_size=8, embed_dim=32, depth=2,
                num_heads=2, mlp_ratio=2.0)
    base.update(kw)
    return ViTSpec(**base)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(16, 24)).astype(np.float32))
    wq = vi8.quantize_weight(w)
    assert wq["q"].dtype == jnp.int8 and wq["s"].shape == (24,)
    deq = np.asarray(wq["q"], np.float32) * np.asarray(wq["s"])
    # symmetric per-column: error bounded by half a quantum per column
    np.testing.assert_allclose(deq, np.asarray(w),
                               atol=float(np.asarray(wq["s"]).max()) * 0.51)
    # zero column -> scale 1, zero ints (no 0/0)
    w0 = w.at[:, 3].set(0.0)
    wq0 = vi8.quantize_weight(w0)
    assert float(wq0["s"][3]) == 1.0
    assert not np.asarray(wq0["q"][:, 3]).any()


def _quant_block(spec, seed):
    params = vit_init(jax.random.PRNGKey(seed), spec)
    blk = vi8.quantize_vit_blocks(params)["blocks"][0]
    return blk


def _run_block_kernels(blk, x, spec, num_chunks=1):
    at, ml = blk["attn"], blk["mlp"]
    x = vi8.fused_attn_block_i8(
        x, blk["norm1"]["scale"], blk["norm1"]["bias"], at["qkv_w"],
        at["proj_w"], at["qkv_b"], at["proj_b"], blk.get("ls1"),
        num_heads=spec.num_heads)
    if spec.swiglu:
        return vi8.fused_swiglu_mlp_block_i8(
            x, blk["norm2"]["scale"], blk["norm2"]["bias"], ml["fc1_w"],
            ml["fc1_b"], ml["fc2_w"], ml["fc2_b"], blk.get("ls2"),
            num_chunks=num_chunks)
    return vi8.fused_mlp_block_i8(
        x, blk["norm2"]["scale"], blk["norm2"]["bias"], ml["fc1_w"],
        ml["fc1_b"], ml["fc2_w"], ml["fc2_b"], blk.get("ls2"),
        exact_gelu=True, num_chunks=num_chunks)


@pytest.mark.parametrize("layer_scale", [False, True])
def test_int8_block_matches_reference(layer_scale):
    spec = small_spec(layer_scale=layer_scale)
    blk = _quant_block(spec, seed=1)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, spec.embed_dim))
                    .astype(np.float32))
    got = _run_block_kernels(blk, x, spec)
    ref = vi8.int8_block_reference(blk, x, num_heads=spec.num_heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_int8_chunked_mlp_matches_reference():
    spec = small_spec(mlp_ratio=4.0)   # hidden 128 -> 2 chunks of 64
    blk = _quant_block(spec, seed=3)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 16, spec.embed_dim))
                    .astype(np.float32))
    got = _run_block_kernels(blk, x, spec, num_chunks=2)
    ref = vi8.int8_block_reference(blk, x, num_heads=spec.num_heads,
                                   num_chunks=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_int8_swiglu_matches_reference():
    spec = small_spec(swiglu=True, num_reg_tokens=2, pool="token+mean")
    blk = _quant_block(spec, seed=5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 16, spec.embed_dim))
                    .astype(np.float32))
    got = _run_block_kernels(blk, x, spec, num_chunks=2)
    ref = vi8.int8_block_reference(blk, x, num_heads=spec.num_heads,
                                   swiglu=True, num_chunks=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("swiglu", [False, True])
def test_int8_vs_f32_error_bounded(swiglu):
    """End-to-end encode through vit_apply: int8 features stay close to
    the f32 XLA path (the quantization error itself)."""
    kw = (dict(swiglu=True, num_reg_tokens=2, pool="token+mean")
          if swiglu else dict(layer_scale=True))
    spec = small_spec(depth=2, **kw)
    params = stack_vit_blocks(vit_init(jax.random.PRNGKey(7), spec))
    qparams = vi8.quantize_vit_blocks(params)
    rng = np.random.default_rng(8)
    imgs = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))

    ref = np.asarray(vit_apply(params, imgs, compute_dtype=jnp.float32,
                               attn_impl="xla"))
    got = np.asarray(vit_apply(qparams, imgs, compute_dtype=jnp.float32,
                               attn_impl="int8"))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 2e-2
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.999


def test_int8_requires_quantized_params():
    spec = small_spec()
    params = stack_vit_blocks(vit_init(jax.random.PRNGKey(0), spec))
    imgs = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="quantized"):
        vit_apply(params, imgs, attn_impl="int8")


@pytest.mark.parametrize("impl", ["xla", "fused"])
def test_non_int8_rejects_quantized_params(impl):
    """The inverse direction of the guard above: quantized {'q','s'}
    weights through a float impl must fail with a clear message, not an
    AttributeError deep inside the trace."""
    spec = small_spec()
    params = stack_vit_blocks(vit_init(jax.random.PRNGKey(0), spec))
    qparams = vi8.quantize_vit_blocks(params)
    imgs = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="int8-quantized"):
        vit_apply(qparams, imgs, attn_impl=impl)


def test_registry_int8_path():
    from paths_tpu.encoders.registry import from_name

    encode, dim, _ = from_name("kaiko-vits16", compute_dtype=jnp.float32,
                               block_impl="int8")
    imgs = jnp.asarray(np.random.default_rng(0).uniform(
        size=(2, 224, 224, 3)).astype(np.float32))
    out = np.asarray(encode(imgs))
    assert out.shape == (2, 384) and np.isfinite(out).all()

    ref_encode, _, _ = from_name("kaiko-vits16", compute_dtype=jnp.float32,
                                 block_impl="xla")
    ref = np.asarray(ref_encode(imgs))
    # depth-12 RANDOM-INIT accumulation measures ~2.9e-2 max-rel /
    # 0.9995 cosine here; trained checkpoints (normalized features,
    # UNI's LayerScale) sit far lower — the on-chip parity block and
    # the preprocess selection-overlap test are the production gates
    assert np.abs(out - ref).max() / np.abs(ref).max() < 5e-2
    cos = (out * ref).sum(-1) / (np.linalg.norm(out, axis=-1)
                                 * np.linalg.norm(ref, axis=-1))
    assert cos.min() > 0.999


def test_int8_topk_selection_overlap():
    """Downstream fidelity gate: PATHS keeps top-K patches by a score
    over encoder features — int8 features must select (nearly) the same
    patches. Diverse synthetic patches; a fixed random linear probe
    stands in for the importance head. (On near-duplicate patches ANY
    numeric perturbation reorders ties — that is not an int8 defect.)"""
    from paths_tpu.encoders.registry import from_name

    rng = np.random.default_rng(0)
    imgs = np.empty((64, 224, 224, 3), np.float32)
    for i in range(64):
        img = np.tile(rng.uniform(0.2, 0.95, 3), (224, 224, 1))
        for _ in range(int(rng.integers(1, 5))):
            cy, cx = rng.uniform(0, 224, 2)
            r = rng.uniform(20, 90)
            yy, xx = np.mgrid[0:224, 0:224]
            m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            img[m] = rng.uniform(0.1, 0.9, 3)
        imgs[i] = np.clip(img + rng.normal(size=img.shape) * 0.03, 0, 1)

    e8, _, _ = from_name("kaiko-vits16", compute_dtype=jnp.float32,
                         block_impl="int8")
    ef, _, _ = from_name("kaiko-vits16", compute_dtype=jnp.float32,
                         block_impl="xla")
    x = jnp.asarray(imgs)
    a, b = np.asarray(e8(x)), np.asarray(ef(x))
    v = rng.normal(size=a.shape[1]).astype(np.float32)
    sa, sb = a @ v, b @ v
    # measured here: 8/8 and 15/16 overlap, spearman 0.9987
    assert len(set(np.argsort(-sa)[:8]) & set(np.argsort(-sb)[:8])) >= 7
    assert len(set(np.argsort(-sa)[:16]) & set(np.argsort(-sb)[:16])) >= 14
    ra = np.argsort(np.argsort(sa)).astype(np.float64)
    rb = np.argsort(np.argsort(sb)).astype(np.float64)
    rho = np.corrcoef(ra, rb)[0, 1]
    assert rho > 0.995
