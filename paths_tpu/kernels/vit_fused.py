"""Fused ViT encoder-block kernels (Pallas, TPU, forward-only).

The patch-encoder forward is where the preprocess throughput target lives
(reference hot loop `preprocess/preprocess.py:94-105`). XLA's lowering of
a ViT block materializes every intermediate in HBM: the (B, N, 3H·d) qkv
tensor, three (B, H, N, d) transposes, the (B, H, N, N) f32 score matrix,
and the (B, N, 4D) MLP hidden — ~4.5 GB of traffic per ViT-L block at
B=256, which measures ~35% MFU on v5e. These kernels keep one image's
activations (and the block's weights) resident in VMEM for the whole
block, so per-block HBM traffic drops to read-x + write-x + weights.

Two kernels per block, gridded over images with weights revisited (and
therefore DMA'd once, staying resident across grid steps):

  * `fused_attn`: LN -> qkv projection -> per-head softmax attention ->
    out-projection -> LayerScale -> residual
  * `fused_mlp`: LN -> fc1 -> GELU (exact erf, timm parity) -> fc2 ->
    LayerScale -> residual, with the hidden dim chunked across an inner
    grid axis so fc1/fc2 weight tiles fit the ~16MB VMEM budget

Forward-only by design: encoders are frozen in PATHS (reference
`model/image_encoder.py:30-86` sets eval/no-grad); training never
differentiates through them. `vit_apply(..., block_impl="fused")` selects
these; numerics match the XLA path to bf16 tolerance
(tests/test_encoders.py::test_fused_block_matches_xla).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# set True to run kernels in the Pallas interpreter (CPU tests)
INTERPRET = False


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7 — far
    below bf16 resolution). `lax.erf` has no Pallas TPU lowering."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _dot(lhs, rhs, dimension_numbers, preferred_element_type=jnp.float32):
    """dot_general with the contraction precision pinned BY OPERAND DTYPE
    (not inherited from the ambient config):

    - bf16 operands (the production path) use DEFAULT — the MXU's native
      bf16 pass; Mosaic rejects an fp32 contract on bf16 operands ("Bad
      lhs type"), so an ambient `jax_default_matmul_precision=highest`
      must not leak in. f32 accumulation via preferred_element_type.
    - f32 operands (the parity mode) use HIGHEST: on v5e, a DEFAULT f32
      contraction silently runs a single bf16 pass (~5e-4 rel error,
      measured on-chip) — invisible on LayerScale'd specs (UNI's 1e-5
      init shrinks each block's contribution) but exposed by Virchow2's
      un-scaled SwiGLU blocks in the BENCH kernel_parity block."""
    precision = (jax.lax.Precision.HIGHEST
                 if lhs.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        lhs, rhs, dimension_numbers,
        preferred_element_type=preferred_element_type,
        precision=precision)


def _layernorm(x, scale, bias, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _attn_kernel(x_ref, nsc_ref, nbi_ref, qkvw_ref, qkvb_ref, projw_ref,
                 projb_ref, ls_ref, o_ref, *, num_heads):
    g, n, d = x_ref.shape
    hd = d // num_heads
    cd = x_ref.dtype
    x = x_ref[...].reshape(g * n, d)

    y = _layernorm(x, nsc_ref[0], nbi_ref[0]).astype(cd)
    qkv = _dot(
        y, qkvw_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + qkvb_ref[0].astype(jnp.float32)).astype(cd)  # (g·n, 3d)
    qkv = qkv.reshape(g, n, 3 * d)

    sm_scale = 1.0 / math.sqrt(hd)
    ctx = []
    for h in range(num_heads):
        q = qkv[:, :, h * hd:(h + 1) * hd]                    # (g, n, hd)
        k = qkv[:, :, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, :, 2 * d + h * hd:2 * d + (h + 1) * hd]
        # per-image batched matmuls; images in a group share no attention
        s = _dot(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale                                      # (g, n, n)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        # defer the softmax normalization past the value matmul: one
        # divide over (n, hd) instead of (n, n) — less VPU traffic
        l = jnp.sum(p, axis=-1, keepdims=True)
        c_h = _dot(p.astype(cd), v, (((2,), (1,)), ((0,), (0,))),
                   preferred_element_type=jnp.float32)
        ctx.append((c_h / l).astype(cd))
    o = jnp.concatenate(ctx, axis=-1).reshape(g * n, d)       # (g·n, d)

    proj = _dot(o, projw_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    proj = proj + projb_ref[0].astype(jnp.float32)
    proj = proj * ls_ref[0].astype(jnp.float32)
    o_ref[...] = (x.astype(jnp.float32) + proj).astype(cd).reshape(g, n, d)


def _mlp_kernel(x_ref, nsc_ref, nbi_ref, fc1w_ref, fc1b_ref, fc2w_ref,
                fc2b_ref, ls_ref, o_ref, y_scr, acc_scr, *, num_chunks,
                exact_gelu):
    g, n, d = x_ref.shape
    cd = x_ref.dtype
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        x = x_ref[...].reshape(g * n, d)
        y_scr[...] = _layernorm(x, nsc_ref[0], nbi_ref[0]).astype(cd)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    h = _dot(y_scr[...], fc1w_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + fc1b_ref[0].astype(jnp.float32)
    if exact_gelu:
        h = 0.5 * h * (1.0 + _erf(h * (1.0 / math.sqrt(2.0))))
    else:
        h = jax.nn.gelu(h, approximate=True)
    acc_scr[...] += _dot(h.astype(cd), fc2w_ref[...],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    @pl.when(c == num_chunks - 1)
    def _finalize():
        x = x_ref[...].reshape(g * n, d).astype(jnp.float32)
        out = acc_scr[...] + fc2b_ref[0].astype(jnp.float32)
        out = x + out * ls_ref[0].astype(jnp.float32)
        o_ref[...] = out.astype(cd).reshape(g, n, d)


def _row(a):
    return a.reshape(1, -1)


def fused_attn_block(x, norm_scale, norm_bias, qkv_w, qkv_b, proj_w, proj_b,
                     ls, *, num_heads: int, group: int = 1):
    """x: (B, N, D) -> LN/qkv/attention/proj/LayerScale/residual, fused.
    `ls` may be None (no LayerScale): pass ones.

    `group` = images per grid step. Measured on v5e (ViT-L, B=256, bf16):
    group=1 runs ~7% faster than 4 and ~25% faster than 8 — the smaller
    working set pipelines better than the extra weight-DMA reuse saves."""
    b, n, d = x.shape
    g = math.gcd(group, b)
    if ls is None:
        ls = jnp.ones((d,), x.dtype)
    kernel = functools.partial(_attn_kernel, num_heads=num_heads)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, n, d), lambda i: (i, 0, 0)),
            wspec((1, d)), wspec((1, d)),
            wspec((d, 3 * d)), wspec((1, 3 * d)),
            wspec((d, d)), wspec((1, d)), wspec((1, d)),
        ],
        out_specs=pl.BlockSpec((g, n, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(x, _row(norm_scale), _row(norm_bias), qkv_w, _row(qkv_b), proj_w,
      _row(proj_b), _row(ls))


def fused_mlp_block(x, norm_scale, norm_bias, fc1_w, fc1_b, fc2_w, fc2_b,
                    ls, *, exact_gelu: bool = True, group: int = 1,
                    num_chunks: int = 1):
    """x: (B, N, D) -> LN/fc1/GELU/fc2/LayerScale/residual, fused. The
    hidden dim is chunked so each step's fc1/fc2 weight tiles are
    (D, H/nc)/(H/nc, D); chunk results accumulate in VMEM scratch.

    Defaults measured on v5e (ViT-L, B=256, bf16): group=1 with the whole
    16MB of bf16 MLP weights resident (num_chunks=1) is ~7% faster than
    (4, 4)-chunked. Raise num_chunks for models whose fc1+fc2 weight
    tiles at the compute dtype exceed ~1/3 of VMEM."""
    b, n, d = x.shape
    hidden = fc1_w.shape[1]
    g = math.gcd(group, b)
    if num_chunks < 1 or hidden % num_chunks:
        raise ValueError(
            f"num_chunks={num_chunks} must divide the MLP hidden dim "
            f"{hidden} (valid: divisors of {hidden}) — silently changing "
            "it would break the caller's VMEM budget")
    hc = hidden // num_chunks
    if ls is None:
        ls = jnp.ones((d,), x.dtype)
    kernel = functools.partial(_mlp_kernel, num_chunks=num_chunks,
                               exact_gelu=exact_gelu)
    wspec = lambda shape, im: pl.BlockSpec(shape, im)
    return pl.pallas_call(
        kernel,
        grid=(b // g, num_chunks),
        in_specs=[
            pl.BlockSpec((g, n, d), lambda i, c: (i, 0, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
            wspec((d, hc), lambda i, c: (0, c)),
            wspec((1, hc), lambda i, c: (0, c)),
            wspec((hc, d), lambda i, c: (c, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g, n, d), lambda i, c: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * n, d), x.dtype),      # ln(x), reused per chunk
            pltpu.VMEM((g * n, d), jnp.float32),  # fc2 accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(x, _row(norm_scale), _row(norm_bias), fc1_w, _row(fc1_b), fc2_w,
      _row(fc2_b), _row(ls))


def _swiglu_kernel(x_ref, nsc_ref, nbi_ref, gate_w_ref, gate_b_ref,
                   val_w_ref, val_b_ref, fc2w_ref, fc2b_ref, ls_ref, o_ref,
                   y_scr, acc_scr, *, num_chunks):
    g, n, d = x_ref.shape
    cd = x_ref.dtype
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        x = x_ref[...].reshape(g * n, d)
        y_scr[...] = _layernorm(x, nsc_ref[0], nbi_ref[0]).astype(cd)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    y = y_scr[...]
    gate = _dot(y, gate_w_ref[...], (((1,), (0,)), ((), ())))
    gate = gate + gate_b_ref[0].astype(jnp.float32)
    val = _dot(y, val_w_ref[...], (((1,), (0,)), ((), ())))
    val = val + val_b_ref[0].astype(jnp.float32)
    h = (gate * jax.lax.logistic(gate)) * val          # silu(gate) * value
    acc_scr[...] += _dot(h.astype(cd), fc2w_ref[...], (((1,), (0,)), ((), ())))

    @pl.when(c == num_chunks - 1)
    def _finalize():
        x = x_ref[...].reshape(g * n, d).astype(jnp.float32)
        out = acc_scr[...] + fc2b_ref[0].astype(jnp.float32)
        out = x + out * ls_ref[0].astype(jnp.float32)
        o_ref[...] = out.astype(cd).reshape(g, n, d)


def fused_swiglu_mlp_block(x, norm_scale, norm_bias, fc1_w, fc1_b, fc2_w,
                           fc2_b, ls, *, group: int = 1,
                           num_chunks: int = 1):
    """SwiGLUPacked variant (Virchow2): LN -> fc1 -> chunk-2 ->
    silu(gate) * value -> fc2 -> LayerScale -> residual, fused.

    `fc1_w` is the timm-packed (D, 2H) matrix, gate columns first
    (`timm SwiGLUPacked`); the kernel reads it through TWO BlockSpecs of
    the same array — one indexing the gate half, one the value half — so
    the packed layout is never materialized unpacked."""
    b, n, d = x.shape
    hidden = fc1_w.shape[1] // 2
    g = math.gcd(group, b)
    if num_chunks < 1 or hidden % num_chunks:
        raise ValueError(
            f"num_chunks={num_chunks} must divide the SwiGLU hidden dim "
            f"{hidden} (valid: divisors of {hidden}) — silently changing "
            "it would break the caller's VMEM budget")
    hc = hidden // num_chunks
    if ls is None:
        ls = jnp.ones((d,), x.dtype)
    kernel = functools.partial(_swiglu_kernel, num_chunks=num_chunks)
    wspec = lambda shape, im: pl.BlockSpec(shape, im)
    nc = num_chunks
    return pl.pallas_call(
        kernel,
        grid=(b // g, num_chunks),
        in_specs=[
            pl.BlockSpec((g, n, d), lambda i, c: (i, 0, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
            # the packed fc1 passed twice: gate tile c, value tile nc + c
            wspec((d, hc), lambda i, c: (0, c)),
            wspec((1, hc), lambda i, c: (0, c)),
            wspec((d, hc), lambda i, c, nc=nc: (0, nc + c)),
            wspec((1, hc), lambda i, c, nc=nc: (0, nc + c)),
            wspec((hc, d), lambda i, c: (c, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g, n, d), lambda i, c: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * n, d), x.dtype),      # ln(x), reused per chunk
            pltpu.VMEM((g * n, d), jnp.float32),  # fc2 accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(x, _row(norm_scale), _row(norm_bias), fc1_w, _row(fc1_b), fc1_w,
      _row(fc1_b), fc2_w, _row(fc2_b), _row(ls))


# ------------------------------------------------- single-kernel full block

def _block_kernel(x_ref, n1s_ref, n1b_ref, qkvw_ref, qkvb_ref, projw_ref,
                  projb_ref, ls1_ref, n2s_ref, n2b_ref, fc1w_ref, fc1b_ref,
                  fc2w_ref, fc2b_ref, ls2_ref, o_ref, x1_scr, acc_scr, *,
                  num_heads, num_chunks, exact_gelu):
    """Whole ViT block (attn + MLP) in ONE kernel: the post-attention
    activation never round-trips HBM between the halves (the two-kernel
    path pays read+write of x per half — ~40% of the per-block activation
    traffic). Attention runs at chunk 0 into VMEM scratch; MLP chunks
    accumulate over the inner grid axis as in `_mlp_kernel`."""
    g, n, d = x_ref.shape
    hd = d // num_heads
    cd = x_ref.dtype
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _attn():
        x = x_ref[...].reshape(g * n, d)
        y = _layernorm(x, n1s_ref[0], n1b_ref[0]).astype(cd)
        qkv = _dot(y, qkvw_ref[...], (((1,), (0,)), ((), ())))
        qkv = (qkv + qkvb_ref[0].astype(jnp.float32)).astype(cd)
        qkv = qkv.reshape(g, n, 3 * d)
        sm_scale = 1.0 / math.sqrt(hd)
        ctx = []
        for h in range(num_heads):
            q = qkv[:, :, h * hd:(h + 1) * hd]
            k = qkv[:, :, d + h * hd:d + (h + 1) * hd]
            v = qkv[:, :, 2 * d + h * hd:2 * d + (h + 1) * hd]
            s = _dot(q, k, (((2,), (2,)), ((0,), (0,)))) * sm_scale
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ctx.append(_dot(p.astype(cd), v,
                            (((2,), (1,)), ((0,), (0,)))).astype(cd))
        o = jnp.concatenate(ctx, axis=-1).reshape(g * n, d)
        proj = _dot(o, projw_ref[...], (((1,), (0,)), ((), ())))
        proj = proj + projb_ref[0].astype(jnp.float32)
        proj = proj * ls1_ref[0].astype(jnp.float32)
        x1 = x.astype(jnp.float32) + proj
        x1_scr[...] = x1.astype(cd)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    y2 = _layernorm(x1_scr[...], n2s_ref[0], n2b_ref[0]).astype(cd)
    h = _dot(y2, fc1w_ref[...], (((1,), (0,)), ((), ())))
    h = h + fc1b_ref[0].astype(jnp.float32)
    if exact_gelu:
        h = 0.5 * h * (1.0 + _erf(h * (1.0 / math.sqrt(2.0))))
    else:
        h = jax.nn.gelu(h, approximate=True)
    acc_scr[...] += _dot(h.astype(cd), fc2w_ref[...],
                         (((1,), (0,)), ((), ())))

    @pl.when(c == num_chunks - 1)
    def _finalize():
        x1 = x1_scr[...].astype(jnp.float32)
        out = acc_scr[...] + fc2b_ref[0].astype(jnp.float32)
        out = x1 + out * ls2_ref[0].astype(jnp.float32)
        o_ref[...] = out.astype(cd).reshape(g, n, d)


def fused_block(x, blk, *, num_heads: int, exact_gelu: bool = True,
                group: int = 1, num_chunks: int = 1):
    """One whole pre-norm ViT block (GELU MLP) as a single Pallas call.
    `blk` is the per-block param dict (norm1/attn/norm2/mlp[/ls1/ls2])."""
    b, n, d = x.shape
    hidden = blk["mlp"]["fc1_w"].shape[1]
    g = math.gcd(group, b)
    if num_chunks < 1 or hidden % num_chunks:
        raise ValueError(f"num_chunks={num_chunks} must divide {hidden}")
    hc = hidden // num_chunks
    ones = jnp.ones((d,), x.dtype)
    ls1 = blk.get("ls1", ones)
    ls2 = blk.get("ls2", ones)
    kernel = functools.partial(_block_kernel, num_heads=num_heads,
                               num_chunks=num_chunks,
                               exact_gelu=exact_gelu)
    w0 = lambda shape: pl.BlockSpec(shape, lambda i, c: (0,) * len(shape))
    at, ml = blk["attn"], blk["mlp"]
    return pl.pallas_call(
        kernel,
        grid=(b // g, num_chunks),
        in_specs=[
            pl.BlockSpec((g, n, d), lambda i, c: (i, 0, 0)),
            w0((1, d)), w0((1, d)),
            w0((d, 3 * d)), w0((1, 3 * d)),
            w0((d, d)), w0((1, d)), w0((1, d)),
            w0((1, d)), w0((1, d)),
            pl.BlockSpec((d, hc), lambda i, c: (0, c)),
            pl.BlockSpec((1, hc), lambda i, c: (0, c)),
            pl.BlockSpec((hc, d), lambda i, c: (c, 0)),
            w0((1, d)), w0((1, d)),
        ],
        out_specs=pl.BlockSpec((g, n, d), lambda i, c: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * n, d), x.dtype),      # x after attention
            pltpu.VMEM((g * n, d), jnp.float32),  # fc2 accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(x, _row(blk["norm1"]["scale"]), _row(blk["norm1"]["bias"]),
      at["qkv_w"], _row(at["qkv_b"]), at["proj_w"], _row(at["proj_b"]),
      _row(ls1), _row(blk["norm2"]["scale"]), _row(blk["norm2"]["bias"]),
      ml["fc1_w"], _row(ml["fc1_b"]), ml["fc2_w"], _row(ml["fc2_b"]),
      _row(ls2))
