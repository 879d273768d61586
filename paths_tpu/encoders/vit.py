"""Vision Transformer patch encoders in JAX.

Covers the architectures behind the reference's encoder zoo
(`model/image_encoder.py`): UNI (timm ViT-L/16 with LayerScale), Virchow2
(ViT-H/14 with SwiGLU MLP and 4 register tokens), and the Kaiko DINO ViTs.
All follow the timm `VisionTransformer` computation graph: conv patch
embedding, prepended class (+register) tokens, learned position embedding,
pre-norm blocks (MHA -> LayerScale -> residual; MLP -> LayerScale ->
residual), final LayerNorm.

Built MXU-first: the whole forward is batched matmuls/einsums in a
configurable compute dtype (bf16 by default for preprocessing, where the
reference uses fp16 autocast, `preprocess/preprocess.py:97`).

Weight conversion from timm checkpoints: `paths_tpu/encoders/convert_vit.py`.
"""
from __future__ import annotations

import dataclasses
import math
import jax
import jax.numpy as jnp
import numpy as np

from paths_tpu.nn.core import Static


@dataclasses.dataclass(frozen=True)
class ViTSpec:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    layer_scale: bool = False          # timm LayerScale (UNI: init 1e-5)
    swiglu: bool = False               # Virchow2: SwiGLUPacked + SiLU
    num_reg_tokens: int = 0            # Virchow2: 4 register tokens
    pool: str = "token"                # token | token+mean (Virchow2 concat)
    # "exact" matches timm (erf GELU); "tanh" trades ~1e-3 feature error
    # for ~20% throughput (erf is VPU-bound on TPU)
    gelu: str = "exact"

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def mlp_hidden(self) -> int:
        if self.swiglu:
            # timm SwiGLUPacked convention: hidden = int(dim * ratio) with
            # the packed fc1 producing 2*hidden
            return int(self.embed_dim * self.mlp_ratio)
        return int(self.embed_dim * self.mlp_ratio)

    @property
    def mlp_hidden_padded(self) -> int:
        """Hidden dim stored in params: SwiGLU hidden rounds up to a
        lane multiple (128) so the fused Pallas kernel can tile the
        packed fc1 (Virchow2's 6832 -> 6912). Zero-padding is exact:
        silu(0)*0 = 0 and zero fc2 rows contribute nothing — both the
        XLA split-in-half path and the kernel see identical outputs."""
        if self.swiglu:
            return -(-self.mlp_hidden // 128) * 128
        return self.mlp_hidden

    @property
    def out_dim(self) -> int:
        return self.embed_dim * (2 if self.pool == "token+mean" else 1)


# canonical specs for the reference zoo
UNI = ViTSpec(embed_dim=1024, depth=24, num_heads=16, layer_scale=True)
VIRCHOW2 = ViTSpec(patch_size=14, embed_dim=1280, depth=32, num_heads=20,
                   mlp_ratio=5.3375, swiglu=True, num_reg_tokens=4,
                   pool="token+mean")
KAIKO_VITS16 = ViTSpec(embed_dim=384, depth=12, num_heads=6)
KAIKO_VITS8 = ViTSpec(patch_size=8, embed_dim=384, depth=12, num_heads=6)
KAIKO_VITB16 = ViTSpec(embed_dim=768, depth=12, num_heads=12)
KAIKO_VITB8 = ViTSpec(patch_size=8, embed_dim=768, depth=12, num_heads=12)
KAIKO_VITL14 = ViTSpec(patch_size=14, embed_dim=1024, depth=24, num_heads=16)


def vit_init(key, spec: ViTSpec, dtype=jnp.float32) -> dict:
    """Random-init ViT params, entirely HOST-SIDE numpy.

    Two deliberate properties: numpy RNG (per-tensor jitted samplers
    would trigger ~100 tiny XLA compiles), and numpy LEAVES — on a
    remote-tunneled device, returning jnp arrays costs one device_put
    round trip per tensor (~330 for ViT-H, measured ~400 s of every
    Virchow2 bench section); the caller ships the finished tree in ONE
    `jax.device_put` (paths_tpu/encoders/registry.py). jnp ops accept
    numpy leaves directly, so CPU tests are unaffected. Random encoders
    are only used for shape tests and throughput benchmarks — real runs
    load converted timm weights."""
    if hasattr(key, "dtype"):  # jax PRNGKey -> derive a numpy seed
        seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
    else:
        seed = int(key)
    rng = np.random.default_rng(seed)

    def _trunc_normal(_key_unused, shape, std=0.02, dtype=dtype):
        vals = np.clip(rng.normal(0.0, std, shape),
                       -2 * std, 2 * std).astype(dtype)
        if np.dtype(dtype) == np.float32:
            # snap to the bf16 grid, stored f32: bf16 compute (the
            # production dtype) sees bit-identical weights, while the 16
            # zeroed mantissa bits let the tunnel's payload compression
            # roughly halve the one-shot device_put of these otherwise
            # incompressible random weights (2.5 GB for ViT-H)
            vals = vals.astype(jnp.bfloat16).astype(np.float32)
        return vals

    d = spec.embed_dim
    keys = [None] * (6 + spec.depth)
    n_prefix = 1 + spec.num_reg_tokens

    params = {
        "spec": Static(spec),
        "patch_embed": {
            # conv kernel stored (P, P, 3, D) HWIO
            "w": _trunc_normal(keys[0], (spec.patch_size, spec.patch_size, 3, d),
                               std=0.02, dtype=dtype),
            "b": np.zeros((d,), dtype),
        },
        "cls_token": _trunc_normal(keys[1], (d,), 1e-6, dtype),
        "pos_embed": _trunc_normal(keys[2], (spec.num_patches + n_prefix, d),
                                   0.02, dtype),
        "norm": {"scale": np.ones((d,), dtype), "bias": np.zeros((d,), dtype)},
        "blocks": [],
    }
    if spec.num_reg_tokens:
        params["reg_tokens"] = _trunc_normal(
            keys[3], (spec.num_reg_tokens, d), 1e-6, dtype)

    for i in range(spec.depth):
        bk = [None] * 8
        h = spec.mlp_hidden_padded
        blk = {
            "norm1": {"scale": np.ones((d,), dtype), "bias": np.zeros((d,), dtype)},
            "attn": {
                "qkv_w": _trunc_normal(bk[0], (d, 3 * d), 0.02, dtype),
                "qkv_b": np.zeros((3 * d,), dtype),
                "proj_w": _trunc_normal(bk[1], (d, d), 0.02, dtype),
                "proj_b": np.zeros((d,), dtype),
            },
            "norm2": {"scale": np.ones((d,), dtype), "bias": np.zeros((d,), dtype)},
            "mlp": ({
                "fc1_w": _trunc_normal(bk[2], (d, 2 * h), 0.02, dtype),
                "fc1_b": np.zeros((2 * h,), dtype),
                "fc2_w": _trunc_normal(bk[3], (h, d), 0.02, dtype),
                "fc2_b": np.zeros((d,), dtype),
            } if spec.swiglu else {
                "fc1_w": _trunc_normal(bk[2], (d, h), 0.02, dtype),
                "fc1_b": np.zeros((h,), dtype),
                "fc2_w": _trunc_normal(bk[3], (h, d), 0.02, dtype),
                "fc2_b": np.zeros((d,), dtype),
            }),
        }
        if spec.layer_scale:
            blk["ls1"] = 1e-5 * np.ones((d,), dtype)
            blk["ls2"] = 1e-5 * np.ones((d,), dtype)
        params["blocks"].append(blk)
    return params


def _ln(p, x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _attn(p, x, num_heads, cd, impl="xla"):
    b, n, d = x.shape
    qkv = (x.astype(cd) @ p["qkv_w"].astype(cd)) + p["qkv_b"].astype(cd)
    qkv = qkv.reshape(b, n, 3, num_heads, d // num_heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # B,N,H,hd
    if impl == "flash":
        # fused online-softmax kernel: no (B,H,N,N) score materialization
        # in HBM (the XLA path writes + rereads ~45GB of score traffic per
        # ViT-L forward at B=256); N pads to the block inside the kernel
        from paths_tpu.kernels.flash_attention import masked_flash_attention

        lengths = jnp.full((b,), n, jnp.int32)
        blk = min(256, 128 * -(-n // 128))
        o = masked_flash_attention(q.transpose(0, 2, 1, 3),
                                   k.transpose(0, 2, 1, 3),
                                   v.transpose(0, 2, 1, 3),
                                   lengths, blk, blk)
        o = o.transpose(0, 2, 1, 3).astype(cd)
    else:
        scale = 1.0 / math.sqrt(d // num_heads)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        w = jax.nn.softmax(logits, axis=-1).astype(cd)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v,
                       preferred_element_type=jnp.float32).astype(cd)
    o = o.reshape(b, n, d)
    return (o @ p["proj_w"].astype(cd)) + p["proj_b"].astype(cd)


def _mlp(p, x, swiglu, cd, gelu="exact"):
    h = (x.astype(cd) @ p["fc1_w"].astype(cd)) + p["fc1_b"].astype(cd)
    if swiglu:
        # timm SwiGLUPacked: fc1 -> chunk 2 -> silu(x1) * x2
        x1, x2 = jnp.split(h, 2, axis=-1)
        h = jax.nn.silu(x1) * x2
    else:
        h = jax.nn.gelu(h, approximate=(gelu == "tanh"))
    return (h @ p["fc2_w"].astype(cd)) + p["fc2_b"].astype(cd)


def _block(blk, x, spec, cd, attn_impl="xla"):
    if attn_impl != "int8" and isinstance(blk["attn"]["qkv_w"], dict):
        # symmetric guard to the int8 check below: quantized {'q','s'}
        # weights would otherwise die on a cryptic .astype AttributeError
        # deep inside the trace
        raise ValueError(
            f"attn_impl={attn_impl!r} got int8-quantized params — use "
            "attn_impl='int8', or load unquantized params for this impl")
    if attn_impl == "int8":
        # dynamic-activation / static-weight int8 projections; the gain is
        # halved weight-DMA bytes per block (int8 MXU dots run at bf16
        # rate through Mosaic on v5e — see kernels/vit_int8.py). Requires
        # params quantized by `kernels.vit_int8.quantize_vit_blocks`
        # (registry block_impl "int8" does this). Frozen encoders only —
        # forward-only kernels.
        from paths_tpu.kernels import vit_int8 as vi8

        if not vi8.is_quantized(blk):
            raise ValueError(
                "attn_impl='int8' needs quantized params — run "
                "kernels.vit_int8.quantize_vit_blocks(params) first "
                "(encoders.from_name(block_impl='int8') does)")
        at, ml = blk["attn"], blk["mlp"]
        x = vi8.fused_attn_block_i8(
            x, blk["norm1"]["scale"], blk["norm1"]["bias"], at["qkv_w"],
            at["proj_w"], at["qkv_b"], at["proj_b"], blk.get("ls1"),
            num_heads=spec.num_heads)
        if spec.swiglu:
            return vi8.fused_swiglu_mlp_block_i8(
                x, blk["norm2"]["scale"], blk["norm2"]["bias"],
                ml["fc1_w"], ml["fc1_b"], ml["fc2_w"], ml["fc2_b"],
                blk.get("ls2"))
        return vi8.fused_mlp_block_i8(
            x, blk["norm2"]["scale"], blk["norm2"]["bias"], ml["fc1_w"],
            ml["fc1_b"], ml["fc2_w"], ml["fc2_b"], blk.get("ls2"),
            exact_gelu=(spec.gelu == "exact"))
    if attn_impl == "fused1" and not spec.swiglu:
        # whole block in ONE kernel: post-attention activations never
        # round-trip HBM between the halves
        from paths_tpu.kernels.vit_fused import fused_block

        return fused_block(x, blk, num_heads=spec.num_heads,
                           exact_gelu=(spec.gelu == "exact"))
    if attn_impl == "fused1":
        attn_impl = "fused"      # SwiGLU keeps the two-kernel fused path
    if attn_impl == "fused":
        # fully-fused Pallas block: activations stay in VMEM, weights
        # resident across the image grid (kernels/vit_fused.py)
        from paths_tpu.kernels.vit_fused import (
            fused_attn_block,
            fused_mlp_block,
            fused_swiglu_mlp_block,
        )

        w = lambda a: a.astype(cd)
        at, ml = blk["attn"], blk["mlp"]
        x = fused_attn_block(
            x, blk["norm1"]["scale"], blk["norm1"]["bias"], w(at["qkv_w"]),
            at["qkv_b"], w(at["proj_w"]), at["proj_b"],
            blk.get("ls1"), num_heads=spec.num_heads)
        if spec.swiglu:
            return fused_swiglu_mlp_block(
                x, blk["norm2"]["scale"], blk["norm2"]["bias"],
                w(ml["fc1_w"]), ml["fc1_b"], w(ml["fc2_w"]), ml["fc2_b"],
                blk.get("ls2"))
        return fused_mlp_block(
            x, blk["norm2"]["scale"], blk["norm2"]["bias"], w(ml["fc1_w"]),
            ml["fc1_b"], w(ml["fc2_w"]), ml["fc2_b"], blk.get("ls2"),
            exact_gelu=(spec.gelu == "exact"))
    a = _attn(blk["attn"], _ln(blk["norm1"], x), spec.num_heads, cd,
              impl=attn_impl)
    if spec.layer_scale:
        a = a * blk["ls1"].astype(cd)
    x = x + a
    m = _mlp(blk["mlp"], _ln(blk["norm2"], x), spec.swiglu, cd,
             gelu=spec.gelu)
    if spec.layer_scale:
        m = m * blk["ls2"].astype(cd)
    return x + m


def stack_vit_blocks(params: dict) -> dict:
    """Convert the per-block param list into ONE stacked pytree (leading
    depth axis) consumed via `lax.scan`. The scanned forward emits a
    program with a single block body instead of `depth` inlined copies —
    ~24x smaller HLO for ViT-L, which matters both for compile time and
    for this environment's size-limited remote compiler."""
    blocks = params["blocks"]
    if isinstance(blocks, dict):
        return params
    # numpy leaves stack on the host (vit_init's single-device_put
    # contract); device leaves stack on device (converted checkpoints)
    stacked = jax.tree_util.tree_map(
        lambda *xs: (np.stack(xs) if isinstance(xs[0], np.ndarray)
                     else jnp.stack(xs)), *blocks)
    return {**params, "blocks": stacked}


def vit_apply(params: dict, images: jnp.ndarray,
              compute_dtype=jnp.bfloat16,
              attn_impl: str = "xla") -> jnp.ndarray:
    """Encode images -> features.

    :param images: (B, H, W, 3) float, already preprocessed (resized /
        normalized — see `paths_tpu.preprocess.transforms`)
    :param attn_impl: "xla", "flash" (Pallas flash attention, TPU only),
        or "fused" (fully-fused Pallas block kernels, TPU only —
        kernels/vit_fused.py)
    :return: (B, out_dim) float32 — cls token (timm token pooling), or
        cls ‖ mean(patch tokens) for Virchow2 (register tokens dropped,
        reference `image_encoder.py:13-27`)
    """
    spec: ViTSpec = params["spec"].value
    cd = compute_dtype
    b, hh, ww, _ = images.shape
    p = spec.patch_size
    assert hh % p == 0 and ww % p == 0, (hh, ww, p)

    # patch embedding as reshape + matmul (MXU-friendly; equals the conv)
    x = images.reshape(b, hh // p, p, ww // p, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (hh // p) * (ww // p),
                                              p * p * 3)
    w = params["patch_embed"]["w"].reshape(p * p * 3, spec.embed_dim)
    x = (x.astype(cd) @ w.astype(cd)) + params["patch_embed"]["b"].astype(cd)

    n_prefix = 1 + spec.num_reg_tokens
    assert x.shape[1] == spec.num_patches, (
        f"got {x.shape[1]} patches, spec expects {spec.num_patches}; "
        "resize inputs to the spec's img_size")

    cls = jnp.broadcast_to(params["cls_token"].astype(cd)[None, None],
                           (b, 1, spec.embed_dim))
    reg = (jnp.broadcast_to(params["reg_tokens"].astype(cd)[None],
                            (b, spec.num_reg_tokens, spec.embed_dim))
           if spec.num_reg_tokens else None)

    # position-embedding layout is inferred from the table's row count
    # (timm supports all three: patches-only / cls+patches / all tokens)
    pe = params["pos_embed"].astype(cd)[None]
    npatch = spec.num_patches
    if pe.shape[1] == npatch:                      # no_embed_class (DINOv2)
        x = x + pe
        x = jnp.concatenate(([cls, reg, x] if reg is not None else [cls, x]),
                            axis=1)
    elif pe.shape[1] == npatch + 1:                # cls + patches
        x = jnp.concatenate([cls, x], axis=1) + pe
        if reg is not None:
            x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)
    else:                                          # every token
        assert pe.shape[1] == npatch + n_prefix, pe.shape
        x = jnp.concatenate(([cls, reg, x] if reg is not None else [cls, x]),
                            axis=1)
        x = x + pe

    blocks = params["blocks"]
    if isinstance(blocks, list):          # unrolled (parity tests)
        for blk in blocks:
            x = _block(blk, x, spec, cd, attn_impl)
    else:                                 # stacked -> scanned (production)
        def body(carry, blk):
            return _block(blk, carry, spec, cd, attn_impl), None

        x, _ = jax.lax.scan(body, x, blocks)

    x = _ln(params["norm"], x)
    cls_out = x[:, 0].astype(jnp.float32)
    if spec.pool == "token+mean":
        patch_mean = x[:, n_prefix:].mean(axis=1).astype(jnp.float32)
        return jnp.concatenate([cls_out, patch_mean], axis=-1)
    return cls_out
