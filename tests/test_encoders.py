"""Encoder zoo parity: JAX ViT/ResNet vs torch mirrors with converted
weights (f32 compute on CPU so tolerances are tight)."""
import jax.numpy as jnp
import numpy as np
import torch

from helpers_encoders import TimmViT, TorchResNet18
from paths_tpu.encoders.convert_vit import vit_from_timm
from paths_tpu.encoders.resnet import resnet_apply, resnet_from_torchvision
from paths_tpu.encoders.transforms import TransformSpec, apply_transform
from paths_tpu.encoders.vit import ViTSpec, vit_apply, vit_init


def small_spec(**kw):
    base = dict(img_size=32, patch_size=8, embed_dim=24, depth=2, num_heads=2,
                mlp_ratio=2.0)
    base.update(kw)
    return ViTSpec(**base)


def _vit_pair(spec, seed=0, pool="token"):
    torch.manual_seed(seed)
    t = TimmViT(spec.img_size, spec.patch_size, spec.embed_dim, spec.depth,
                spec.num_heads, spec.mlp_hidden, layer_scale=spec.layer_scale,
                swiglu=spec.swiglu, reg_tokens=spec.num_reg_tokens,
                pool=pool).eval()
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    j = vit_from_timm(sd, spec)
    return t, j


def _compare(spec, pool="token", atol=1e-4):
    t, j = _vit_pair(spec, pool=pool)
    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(3, spec.img_size, spec.img_size, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = t(torch.tensor(imgs.transpose(0, 3, 1, 2)))
    out_j = vit_apply(j, jnp.asarray(imgs), compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=atol)


def test_vit_plain():
    _compare(small_spec())


def test_vit_layerscale():
    _compare(small_spec(layer_scale=True))


def test_vit_swiglu_with_registers_concat_pool():
    """The Virchow2 shape: SwiGLU MLP, 4 register tokens, cls ‖ mean pool."""
    spec = small_spec(swiglu=True, num_reg_tokens=4, pool="token+mean")
    _compare(spec, pool="token+mean")


def test_vit_bf16_close():
    spec = small_spec(layer_scale=True)
    t, j = _vit_pair(spec)
    rng = np.random.default_rng(1)
    imgs = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = t(torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()
    out_b = np.asarray(vit_apply(j, jnp.asarray(imgs),
                                 compute_dtype=jnp.bfloat16))
    # bf16 matmuls: expect ~1e-2 agreement, not exactness
    assert np.max(np.abs(out_b - out_t)) < 5e-2


def test_resnet18_parity():
    torch.manual_seed(0)
    t = TorchResNet18().eval()
    # make running stats non-trivial
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    j = resnet_from_torchvision(sd, "resnet18")

    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = t(torch.tensor(imgs.transpose(0, 3, 1, 2)))
    out_j = resnet_apply(j, jnp.asarray(imgs), compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-4)


def test_transform_resize_crop_normalize():
    spec = TransformSpec(size=8, crop_pct=0.8, mean=(0.5, 0.5, 0.5),
                         std=(0.25, 0.25, 0.25), method="bilinear")
    imgs = np.random.default_rng(0).uniform(size=(2, 20, 20, 3)).astype(np.float32)
    out = np.asarray(apply_transform(jnp.asarray(imgs), spec))
    assert out.shape == (2, 8, 8, 3)
    # normalization applied: values outside [0,1]*... check mean-shift
    assert out.min() < -0.1 and out.max() > 0.1


def test_matmul_resize_matches_jax_image():
    import jax

    from paths_tpu.encoders.transforms import matmul_resize

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(2, 37, 53, 3)).astype(np.float32))
    for method in ["bicubic", "bilinear"]:
        for nh, nw in [(24, 24), (64, 80), (37, 20)]:
            ref = jax.image.resize(imgs, (2, nh, nw, 3), method)
            out = matmul_resize(imgs, nh, nw, method)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5)


def test_transform_identity():
    spec = TransformSpec(identity=True)
    imgs = np.ones((1, 16, 16, 3), np.float32)
    out = np.asarray(apply_transform(jnp.asarray(imgs), spec))
    np.testing.assert_array_equal(out, imgs)


def test_stacked_scan_matches_unrolled():
    from paths_tpu.encoders.vit import stack_vit_blocks

    spec = small_spec(layer_scale=True, depth=3)
    _, j = _vit_pair(spec, seed=5)
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    out_list = vit_apply(j, imgs, compute_dtype=jnp.float32)
    out_scan = vit_apply(stack_vit_blocks(j), imgs, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_list),
                               atol=1e-5)


def test_fused_block_matches_xla(monkeypatch):
    """Fused Pallas block kernels (attn + chunked MLP) vs the XLA path, in
    the Pallas interpreter on CPU; covers LayerScale and exact-erf GELU."""
    from paths_tpu.encoders.vit import stack_vit_blocks
    from paths_tpu.kernels import vit_fused

    monkeypatch.setattr(vit_fused, "INTERPRET", True)
    spec = small_spec(embed_dim=32, layer_scale=True, depth=2, num_heads=2)
    _, j = _vit_pair(spec, seed=7)
    j = stack_vit_blocks(j)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(size=(4, 32, 32, 3)).astype(np.float32))
    ref = vit_apply(j, imgs, compute_dtype=jnp.float32, attn_impl="xla")
    out = vit_apply(j, imgs, compute_dtype=jnp.float32, attn_impl="fused")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_fused_block_no_layerscale(monkeypatch):
    """ls=None path (Kaiko-style specs) through the fused kernels."""
    from paths_tpu.encoders.vit import stack_vit_blocks
    from paths_tpu.kernels import vit_fused

    monkeypatch.setattr(vit_fused, "INTERPRET", True)
    spec = small_spec(embed_dim=32, depth=1, num_heads=2)
    _, j = _vit_pair(spec, seed=8)
    j = stack_vit_blocks(j)
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    ref = vit_apply(j, imgs, compute_dtype=jnp.float32, attn_impl="xla")
    out = vit_apply(j, imgs, compute_dtype=jnp.float32, attn_impl="fused")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_fused_block_swiglu(monkeypatch):
    """Packed-SwiGLU fused MLP (Virchow2 shape: register tokens,
    token+mean pool) vs the XLA path in the Pallas interpreter."""
    from paths_tpu.encoders.vit import stack_vit_blocks
    from paths_tpu.kernels import vit_fused

    monkeypatch.setattr(vit_fused, "INTERPRET", True)
    spec = small_spec(embed_dim=32, depth=2, num_heads=2, swiglu=True,
                      num_reg_tokens=2, pool="token+mean")
    _, j = _vit_pair(spec, seed=9, pool="token+mean")
    j = stack_vit_blocks(j)
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    ref = vit_apply(j, imgs, compute_dtype=jnp.float32, attn_impl="xla")
    out = vit_apply(j, imgs, compute_dtype=jnp.float32, attn_impl="fused")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_registry_random_init_shapes():
    from paths_tpu.encoders.registry import from_name

    encode, dim, tspec = from_name("kaiko-vits16", compute_dtype=jnp.float32)
    imgs = jnp.asarray(np.random.default_rng(0).uniform(
        size=(2, 224, 224, 3)).astype(np.float32))
    out = encode(imgs)
    assert out.shape == (2, 384) and dim == 384


def test_fused1_single_kernel_block_matches_xla(monkeypatch):
    """The single-kernel whole-block path (attn + MLP in one pallas_call,
    no HBM round-trip between halves) vs XLA, incl. LayerScale and
    chunked MLP accumulation."""
    from paths_tpu.encoders.vit import stack_vit_blocks
    from paths_tpu.kernels import vit_fused

    monkeypatch.setattr(vit_fused, "INTERPRET", True)
    spec = small_spec(embed_dim=32, layer_scale=True, depth=2, num_heads=2)
    _, j = _vit_pair(spec, seed=9)
    j = stack_vit_blocks(j)
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.uniform(size=(4, 32, 32, 3)).astype(np.float32))
    ref = vit_apply(j, imgs, compute_dtype=jnp.float32, attn_impl="xla")
    out = vit_apply(j, imgs, compute_dtype=jnp.float32, attn_impl="fused1")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    # chunked accumulation inside the single kernel
    from paths_tpu.encoders.vit import ViTSpec, vit_init

    p = vit_init(1, ViTSpec(img_size=32, patch_size=8, embed_dim=64,
                            depth=1, num_heads=2, mlp_ratio=4.0))
    blk = p["blocks"][0]
    x = jnp.asarray(rng.normal(size=(2, 17, 64)).astype(np.float32))
    from paths_tpu.encoders.vit import _block

    r = _block(blk, x, p["spec"].value, jnp.float32, "xla")
    g = vit_fused.fused_block(x, blk, num_heads=2, num_chunks=4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=3e-5)


def test_fused_dot_precision_pinned_by_dtype():
    """Regression guard for the on-chip f32 precision fix: the fused
    kernels' contractions must run HIGHEST for f32 operands (on v5e a
    DEFAULT f32 dot silently executes a single bf16 pass, ~5e-4 rel
    error — caught by BENCH's kernel_parity block) and DEFAULT for bf16
    operands (Mosaic rejects an fp32 contract on bf16 — "Bad lhs type").
    Asserted at trace level so it holds on any backend."""
    import jax
    from jax import lax

    from paths_tpu.kernels.vit_fused import _dot

    def dot_precisions(dtype):
        f = lambda a, b: _dot(a, b, (((1,), (0,)), ((), ())))
        jaxpr = jax.make_jaxpr(f)(jnp.zeros((8, 16), dtype),
                                  jnp.zeros((16, 8), dtype))
        return [e.params["precision"] for e in jaxpr.jaxpr.eqns
                if e.primitive.name == "dot_general"]

    assert all(p == (lax.Precision.HIGHEST,) * 2
               for p in dot_precisions(jnp.float32)), \
        dot_precisions(jnp.float32)
    assert all(p == (lax.Precision.DEFAULT,) * 2
               for p in dot_precisions(jnp.bfloat16)), \
        dot_precisions(jnp.bfloat16)
