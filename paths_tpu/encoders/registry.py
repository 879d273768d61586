"""Encoder factory — the reference's `image_encoder.from_name` contract
(`model/image_encoder.py:30-86`): name -> (encode_fn, dim, transform).

Weights: this framework has no network access at runtime; pass
`weights_path` (a torch state_dict file: timm ViT / torchvision resnet) or
get a randomly-initialized encoder of the right architecture (useful for
shape tests and throughput benchmarks; real runs need real weights).

    encode, dim, transform = from_name("UNI", weights_path="uni.pt")
    fts = encode(images_bhwc_01)   # (B, dim) float32
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from paths_tpu.encoders import transforms as T
from paths_tpu.encoders import vit
from paths_tpu.encoders.convert_vit import vit_from_torch_file
from paths_tpu.encoders.resnet import resnet_from_torchvision
from paths_tpu.encoders.transforms import TransformSpec
from paths_tpu.encoders.vit import stack_vit_blocks, vit_init

# Module-level jitted forwards taking params as ARGUMENTS. Never close
# params over a jitted function: the weights become embedded HLO constants
# (~1.2 GB for ViT-L), which this environment's size-limited remote
# compiler rejects and which defeats donation/sharding anywhere.


def _to_float01(images):
    """uint8 [0,255] or float [0,1] -> float32 [0,1] (dtype is static at
    trace time, so this branch is free)."""
    if jnp.issubdtype(images.dtype, jnp.integer):
        return images.astype(jnp.float32) / 255.0
    return images.astype(jnp.float32)


@partial(jax.jit, static_argnames=("tspec", "compute_dtype", "attn_impl"))
def _vit_encode(params, images, tspec, compute_dtype, attn_impl="xla"):
    from paths_tpu.encoders.transforms import apply_transform
    from paths_tpu.encoders.vit import vit_apply

    x = apply_transform(_to_float01(images), tspec)
    return vit_apply(params, x, compute_dtype=compute_dtype,
                     attn_impl=attn_impl)


def _resolve_block_impl(impl: str) -> str:
    """'auto' -> the fused Pallas block kernels on TPU (the 2.2x encoder
    path, kernels/vit_fused.py; vit.py routes SwiGLU MLPs to the
    packed-SwiGLU kernel variant), plain XLA elsewhere."""
    if impl != "auto":
        return impl
    try:
        on_tpu = jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:  # noqa: BLE001 — backend probing must never raise
        on_tpu = False
    return "fused" if on_tpu else "xla"


@partial(jax.jit, static_argnames=("tspec", "compute_dtype"))
def _resnet_encode(params, images, tspec, compute_dtype):
    from paths_tpu.encoders.resnet import resnet_apply
    from paths_tpu.encoders.transforms import apply_transform

    x = apply_transform(_to_float01(images), tspec)
    return resnet_apply(params, x, compute_dtype=compute_dtype)

_VIT_SPECS = {
    "uni": (vit.UNI, T.UNI_TRANSFORM),
    "virchow2": (vit.VIRCHOW2, T.VIRCHOW2_TRANSFORM),
    "kaiko-vits16": (vit.KAIKO_VITS16, T.KAIKO_TRANSFORM),
    "kaiko-vits8": (vit.KAIKO_VITS8, T.KAIKO_TRANSFORM),
    "kaiko-vitb16": (vit.KAIKO_VITB16, T.KAIKO_TRANSFORM),
    "kaiko-vitb8": (vit.KAIKO_VITB8, T.KAIKO_TRANSFORM),
    "kaiko-vitl14": (vit.KAIKO_VITL14, T.KAIKO_TRANSFORM),
}


def from_name(name: str, weights_path: Optional[str] = None,
              compute_dtype=jnp.bfloat16, seed: int = 0,
              fast_math: bool = False,
              block_impl: str = "auto") -> Tuple[Callable, int, TransformSpec]:
    """:return: (encode_fn taking (B,H,W,3) [0,1] or uint8 images ->
    (B, dim) float32 features, feature dim, transform spec).

    :param fast_math: tanh-GELU instead of timm's exact erf GELU
        (~20% faster on TPU, ~1e-3 relative feature error).
    :param block_impl: "auto" (fused Pallas block kernels on TPU, XLA
        otherwise), "fused", "flash", "xla", or "int8" (dynamic-
        activation int8 projections — measured 1.24x (UNI) / 1.49x
        (Virchow2) over the fused bf16 path on v5e via halved weight-DMA
        bytes, <=~1e-2 relative feature error; weights are quantized
        once here)."""
    name = name.lower()

    if name in _VIT_SPECS:
        spec, tspec = _VIT_SPECS[name]
        if fast_math:
            import dataclasses as _dc

            spec = _dc.replace(spec, gelu="tanh")
        if weights_path:
            params = vit_from_torch_file(weights_path, spec)
        else:
            params = vit_init(jax.random.PRNGKey(seed), spec)
        # scan-over-stacked-blocks layout: ~depth-times smaller programs
        params = stack_vit_blocks(params)
        impl = _resolve_block_impl(block_impl)
        if impl == "int8":
            from paths_tpu.kernels.vit_int8 import quantize_vit_blocks

            params = quantize_vit_blocks(params)  # once, host-side
        params = jax.device_put(params)  # resident once, passed as jit args

        def encode(images, params=params):
            return _vit_encode(params, images, tspec, compute_dtype,
                               attn_impl=impl)

        return encode, spec.out_dim, tspec

    if name in ("resnet50", "resnet18"):
        assert weights_path, (
            "resnet encoders require a torchvision state_dict file "
            "(random-init conv nets are not useful even for smoke tests "
            "that care about magnitudes)")
        params = jax.device_put(_load_resnet(weights_path, name))
        dim = 2048 if name == "resnet50" else 512

        def encode(images, params=params):
            return _resnet_encode(params, images, T.IDENTITY_TRANSFORM,
                                  compute_dtype)

        return encode, dim, T.IDENTITY_TRANSFORM

    raise ValueError(f"Invalid patch encoder '{name}'.")


def _load_resnet(path: str, arch: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return resnet_from_torchvision({k: v.numpy() for k, v in sd.items()}, arch)
