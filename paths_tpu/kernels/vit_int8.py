"""Int8-quantized fused ViT block kernels (Pallas, TPU, forward-only).

The encoders are frozen (reference `model/image_encoder.py:30-86` sets
eval/no-grad), so the patch-encode hot loop
(`preprocess/preprocess.py:94-105`) can trade <=1e-2 relative feature
error for throughput with dynamic activation quantization. Measured
win: UNI 1.24x, Virchow2 1.49x over the fused bf16 kernels. The honest
mechanism: through Mosaic/XLA on v5e, int8 MXU dots run at the SAME
rate as bf16 (the advertised 2x int8 peak is not reachable from this
toolchain — standalone probe: 114 vs 103 TF-equiv) — the entire gain is
the HALVED weight-DMA bytes per block, which pipeline better; SwiGLU
gains more because its packed fc1 doubles the MLP weight bytes:

  * weights: per-output-channel symmetric int8, quantized ONCE at
    encoder construction (`quantize_vit_blocks`) — 2x less weight HBM
    traffic per block than bf16
  * activations: per-token (row) symmetric int8, quantized inside the
    kernel right after the (f32) LayerNorm — LN output is well-scaled,
    so an abs-max row scale loses little
  * projections (qkv, attn out, fc1, fc2) run int8 on the MXU with i32
    accumulation, rescaled in f32; softmax-attention itself and GELU/
    SiLU stay at the bf16/f32 path's precision (they are VPU work and
    per-head K=64 matmuls — quantization there buys little and costs
    accuracy)

Layout mirrors `vit_fused.py` (two kernels per block, gridded over
images, weights resident across grid steps; MLP hidden chunked for the
VMEM budget). Numerics are certified on-chip by bench.py's
`kernel_parity` block and downstream by the top-K selection-overlap
test (tests/test_int8_encoder.py).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from paths_tpu.kernels import vit_fused
from paths_tpu.kernels.vit_fused import _erf, _layernorm, _row

# tests flip this to run the kernels in the Pallas interpreter on CPU
INTERPRET = False


def _idot(lhs_q, rhs_q):
    """int8 x int8 -> int32 MXU contraction over lhs dim 1 / rhs dim 0."""
    return jax.lax.dot_general(
        lhs_q, rhs_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)


def _quant_rows(y):
    """f32 (m, d) -> (int8 values, f32 (m, 1) scales), symmetric per-row
    abs-max. Exact zero rows get scale 1 (quantize to zeros)."""
    s = jnp.max(jnp.abs(y), axis=-1, keepdims=True) * (1.0 / 127.0)
    s = jnp.where(s > 0, s, 1.0)
    q = jnp.clip(jnp.round(y / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def quantize_weight(w) -> dict:
    """Per-output-channel symmetric int8 for a (..., in, out) matrix
    (leading axes, e.g. the stacked depth axis, pass through). Numpy
    inputs quantize host-side in numpy — on a remote-tunneled device,
    jnp ops here would cost one round trip per tensor on the (host-built)
    random-init path; converted device weights keep the jnp path."""
    xp = np if isinstance(w, np.ndarray) else jnp
    w32 = xp.asarray(w, xp.float32)
    s = xp.max(xp.abs(w32), axis=-2, keepdims=True) * (1.0 / 127.0)
    s = xp.where(s > 0, s, 1.0)
    q = xp.clip(xp.round(w32 / s), -127.0, 127.0).astype(xp.int8)
    return {"q": q, "s": s[..., 0, :]}


def quantize_vit_blocks(params: dict) -> dict:
    """Quantize every block projection of a ViT param tree (list-of-blocks
    or stacked) for the `attn_impl="int8"` path. Norms, biases,
    LayerScale, embeddings stay f32."""

    def quant_block(blk: dict) -> dict:
        at, ml = blk["attn"], blk["mlp"]
        return {**blk,
                "attn": {**at,
                         "qkv_w": quantize_weight(at["qkv_w"]),
                         "proj_w": quantize_weight(at["proj_w"])},
                "mlp": {**ml,
                        "fc1_w": quantize_weight(ml["fc1_w"]),
                        "fc2_w": quantize_weight(ml["fc2_w"])}}

    blocks = params["blocks"]
    if isinstance(blocks, list):
        blocks = [quant_block(b) for b in blocks]
    else:
        blocks = quant_block(blocks)
    return {**params, "blocks": blocks}


def is_quantized(blk: dict) -> bool:
    return isinstance(blk["attn"]["qkv_w"], dict)


# ------------------------------------------------------------- attention

def _attn_kernel_i8(x_ref, nsc_ref, nbi_ref, qkvq_ref, qkvs_ref, qkvb_ref,
                    projq_ref, projs_ref, projb_ref, ls_ref, o_ref, *,
                    num_heads):
    g, n, d = x_ref.shape
    hd = d // num_heads
    cd = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[...].reshape(g * n, d)

    y = _layernorm(x, nsc_ref[0], nbi_ref[0])          # f32
    yq, ys = _quant_rows(y)
    qkv = _idot(yq, qkvq_ref[...]).astype(jnp.float32)
    qkv = qkv * ys * qkvs_ref[0] + qkvb_ref[0].astype(jnp.float32)
    qkv = qkv.astype(cd).reshape(g, n, 3 * d)

    sm_scale = 1.0 / math.sqrt(hd)
    ctx = []
    for h in range(num_heads):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, :, 2 * d + h * hd:2 * d + (h + 1) * hd]
        # dtype-pinned precision (vit_fused._dot): f32 operands must not
        # silently run a single bf16 MXU pass in the parity mode
        s = vit_fused._dot(q, k, (((2,), (2,)), ((0,), (0,)))) * sm_scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        c_h = vit_fused._dot(p.astype(cd), v, (((2,), (1,)), ((0,), (0,))))
        ctx.append(c_h / l)
    o = jnp.concatenate(ctx, axis=-1).reshape(g * n, d)  # f32

    oq, osc = _quant_rows(o)
    proj = _idot(oq, projq_ref[...]).astype(jnp.float32)
    proj = proj * osc * projs_ref[0] + projb_ref[0].astype(jnp.float32)
    proj = proj * ls_ref[0].astype(jnp.float32)
    o_ref[...] = (x.astype(jnp.float32) + proj).astype(x_ref.dtype) \
        .reshape(g, n, d)


def fused_attn_block_i8(x, norm_scale, norm_bias, qkv_wq, proj_wq, qkv_b,
                        proj_b, ls, *, num_heads: int, group: int = 1):
    b, n, d = x.shape
    g = math.gcd(group, b)
    if ls is None:
        ls = jnp.ones((d,), jnp.float32)
    kernel = functools.partial(_attn_kernel_i8, num_heads=num_heads)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, n, d), lambda i: (i, 0, 0)),
            wspec((1, d)), wspec((1, d)),
            wspec((d, 3 * d)), wspec((1, 3 * d)), wspec((1, 3 * d)),
            wspec((d, d)), wspec((1, d)), wspec((1, d)), wspec((1, d)),
        ],
        out_specs=pl.BlockSpec((g, n, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(x, _row(norm_scale), _row(norm_bias), qkv_wq["q"], _row(qkv_wq["s"]),
      _row(qkv_b), proj_wq["q"], _row(proj_wq["s"]), _row(proj_b), _row(ls))


# ------------------------------------------------------------------- MLP

def _mlp_kernel_i8(x_ref, nsc_ref, nbi_ref, fc1q_ref, fc1s_ref, fc1b_ref,
                   fc2q_ref, fc2s_ref, fc2b_ref, ls_ref, o_ref, yq_scr,
                   ys_scr, acc_scr, *, num_chunks, exact_gelu):
    g, n, d = x_ref.shape
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        x = x_ref[...].reshape(g * n, d)
        y = _layernorm(x, nsc_ref[0], nbi_ref[0])
        yq, ys = _quant_rows(y)
        yq_scr[...] = yq
        ys_scr[...] = ys
        acc_scr[...] = jnp.zeros_like(acc_scr)

    h = _idot(yq_scr[...], fc1q_ref[...]).astype(jnp.float32)
    h = h * ys_scr[...] * fc1s_ref[0] + fc1b_ref[0].astype(jnp.float32)
    if exact_gelu:
        h = 0.5 * h * (1.0 + _erf(h * (1.0 / math.sqrt(2.0))))
    else:
        h = jax.nn.gelu(h, approximate=True)
    hq, hs = _quant_rows(h)
    f2 = _idot(hq, fc2q_ref[...]).astype(jnp.float32)
    acc_scr[...] += f2 * hs * fc2s_ref[0]

    @pl.when(c == num_chunks - 1)
    def _finalize():
        x = x_ref[...].reshape(g * n, d).astype(jnp.float32)
        out = acc_scr[...] + fc2b_ref[0].astype(jnp.float32)
        out = x + out * ls_ref[0].astype(jnp.float32)
        o_ref[...] = out.astype(x_ref.dtype).reshape(g, n, d)


def fused_mlp_block_i8(x, norm_scale, norm_bias, fc1_wq, fc1_b, fc2_wq,
                       fc2_b, ls, *, exact_gelu: bool = True,
                       group: int = 1, num_chunks: int = 1):
    b, n, d = x.shape
    hidden = fc1_wq["q"].shape[1]
    g = math.gcd(group, b)
    if num_chunks < 1 or hidden % num_chunks:
        raise ValueError(f"num_chunks={num_chunks} must divide {hidden}")
    hc = hidden // num_chunks
    if ls is None:
        ls = jnp.ones((d,), jnp.float32)
    kernel = functools.partial(_mlp_kernel_i8, num_chunks=num_chunks,
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
            wspec((1, hc), lambda i, c: (0, c)),
            wspec((hc, d), lambda i, c: (c, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g, n, d), lambda i, c: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * n, d), jnp.int8),      # quantized ln(x)
            pltpu.VMEM((g * n, 1), jnp.float32),   # row scales
            pltpu.VMEM((g * n, d), jnp.float32),   # fc2 accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(x, _row(norm_scale), _row(norm_bias), fc1_wq["q"], _row(fc1_wq["s"]),
      _row(fc1_b), fc2_wq["q"], _row(fc2_wq["s"]), _row(fc2_b), _row(ls))


# ----------------------------------------------------------- SwiGLU MLP

def _swiglu_kernel_i8(x_ref, nsc_ref, nbi_ref, gq_ref, gs_ref, gb_ref,
                      vq_ref, vs_ref, vb_ref, fc2q_ref, fc2s_ref, fc2b_ref,
                      ls_ref, o_ref, yq_scr, ys_scr, acc_scr, *, num_chunks):
    g, n, d = x_ref.shape
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        x = x_ref[...].reshape(g * n, d)
        y = _layernorm(x, nsc_ref[0], nbi_ref[0])
        yq, ys = _quant_rows(y)
        yq_scr[...] = yq
        ys_scr[...] = ys
        acc_scr[...] = jnp.zeros_like(acc_scr)

    yq, ys = yq_scr[...], ys_scr[...]
    gate = _idot(yq, gq_ref[...]).astype(jnp.float32)
    gate = gate * ys * gs_ref[0] + gb_ref[0].astype(jnp.float32)
    val = _idot(yq, vq_ref[...]).astype(jnp.float32)
    val = val * ys * vs_ref[0] + vb_ref[0].astype(jnp.float32)
    h = (gate * jax.lax.logistic(gate)) * val
    hq, hs = _quant_rows(h)
    f2 = _idot(hq, fc2q_ref[...]).astype(jnp.float32)
    acc_scr[...] += f2 * hs * fc2s_ref[0]

    @pl.when(c == num_chunks - 1)
    def _finalize():
        x = x_ref[...].reshape(g * n, d).astype(jnp.float32)
        out = acc_scr[...] + fc2b_ref[0].astype(jnp.float32)
        out = x + out * ls_ref[0].astype(jnp.float32)
        o_ref[...] = out.astype(x_ref.dtype).reshape(g, n, d)


def fused_swiglu_mlp_block_i8(x, norm_scale, norm_bias, fc1_wq, fc1_b,
                              fc2_wq, fc2_b, ls, *, group: int = 1,
                              num_chunks: int = 1):
    """SwiGLUPacked (Virchow2): the packed int8 fc1 passes twice, gate
    tile c and value tile nc + c, exactly as the bf16 kernel does."""
    b, n, d = x.shape
    hidden = fc1_wq["q"].shape[1] // 2
    g = math.gcd(group, b)
    if num_chunks < 1 or hidden % num_chunks:
        raise ValueError(f"num_chunks={num_chunks} must divide {hidden}")
    hc = hidden // num_chunks
    if ls is None:
        ls = jnp.ones((d,), jnp.float32)
    kernel = functools.partial(_swiglu_kernel_i8, num_chunks=num_chunks)
    wspec = lambda shape, im: pl.BlockSpec(shape, im)
    nc = num_chunks
    return pl.pallas_call(
        kernel,
        grid=(b // g, num_chunks),
        in_specs=[
            pl.BlockSpec((g, n, d), lambda i, c: (i, 0, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
            wspec((d, hc), lambda i, c: (0, c)),
            wspec((1, hc), lambda i, c: (0, c)),
            wspec((1, hc), lambda i, c: (0, c)),
            wspec((d, hc), lambda i, c, nc=nc: (0, nc + c)),
            wspec((1, hc), lambda i, c, nc=nc: (0, nc + c)),
            wspec((1, hc), lambda i, c, nc=nc: (0, nc + c)),
            wspec((hc, d), lambda i, c: (c, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
            wspec((1, d), lambda i, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g, n, d), lambda i, c: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * n, d), jnp.int8),
            pltpu.VMEM((g * n, 1), jnp.float32),
            pltpu.VMEM((g * n, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(x, _row(norm_scale), _row(norm_bias),
      fc1_wq["q"], _row(fc1_wq["s"]), _row(fc1_b),
      fc1_wq["q"], _row(fc1_wq["s"]), _row(fc1_b),
      fc2_wq["q"], _row(fc2_wq["s"]), _row(fc2_b), _row(ls))


# ------------------------------------------------------------- reference

def int8_block_reference(blk: dict, x: jnp.ndarray, *, num_heads: int,
                         swiglu: bool = False, exact_gelu: bool = True,
                         num_chunks: int = 1) -> jnp.ndarray:
    """Pure-jnp mirror of the kernels' EXACT quantized math (same scales,
    same rounding, f32 attention). Kernel outputs must match this to f32
    tolerance; distance to the unquantized f32 block is the quantization
    error itself (bounded separately). `num_chunks` mirrors the kernels'
    per-hidden-chunk quantization of the MLP intermediate (the row scale
    is taken over each chunk's columns, which is FINER than whole-row —
    pass the kernel's num_chunks for exact-match testing)."""
    at, ml = blk["attn"], blk["mlp"]
    d = x.shape[-1]
    ones = jnp.ones((d,), jnp.float32)
    ls1 = blk.get("ls1", ones).astype(jnp.float32)
    ls2 = blk.get("ls2", ones).astype(jnp.float32)
    b, n, _ = x.shape
    hd = d // num_heads

    def ln(p, v):
        v32 = v.astype(jnp.float32)
        mu = v32.mean(-1, keepdims=True)
        var = v32.var(-1, keepdims=True)
        y = (v32 - mu) * jax.lax.rsqrt(var + 1e-6)
        return (y * p["scale"].astype(jnp.float32)
                + p["bias"].astype(jnp.float32))

    def qmatmul(y, wq, bias):
        yq, ys = _quant_rows(y)
        out = _idot(yq, wq["q"]).astype(jnp.float32)
        return out * ys * wq["s"] + bias.astype(jnp.float32)

    x2 = x.reshape(b * n, d)
    y = ln(blk["norm1"], x2)
    qkv = qmatmul(y, at["qkv_w"], at["qkv_b"]).reshape(b, n, 3, num_heads,
                                                       hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b * n, d)
    proj = qmatmul(o, at["proj_w"], at["proj_b"]) * ls1
    x1 = x2.astype(jnp.float32) + proj

    y2 = ln(blk["norm2"], x1)
    if swiglu:
        h = qmatmul(y2, ml["fc1_w"], ml["fc1_b"])
        gate, val = jnp.split(h, 2, axis=-1)
        h = jax.nn.silu(gate) * val
    else:
        h = qmatmul(y2, ml["fc1_w"], ml["fc1_b"])
        if exact_gelu:
            # the kernels' rational erf, NOT lax.erf: quantization is
            # discontinuous, so even a 1.5e-7 erf difference could flip
            # an int8 rounding decision and break exact-match testing
            h = 0.5 * h * (1.0 + _erf(h * (1.0 / math.sqrt(2.0))))
        else:
            h = jax.nn.gelu(h, approximate=True)
    hidden = h.shape[-1]
    assert hidden % num_chunks == 0, (hidden, num_chunks)
    hc = hidden // num_chunks
    out = jnp.zeros((b * n, d), jnp.float32)
    for c in range(num_chunks):   # per-chunk h quantization (see kernels)
        sl = slice(c * hc, (c + 1) * hc)
        hq, hs = _quant_rows(h[:, sl])
        out = out + (_idot(hq, ml["fc2_w"]["q"][sl]).astype(jnp.float32)
                     * hs * ml["fc2_w"]["s"])
    out = (out + ml["fc2_b"].astype(jnp.float32)) * ls2
    return (x1 + out).reshape(b, n, d).astype(x.dtype)
