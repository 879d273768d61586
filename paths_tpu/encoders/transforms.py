"""Image preprocessing transforms for the encoder zoo.

Per-encoder parameters mirror the transforms the reference builds
(`model/image_encoder.py`): timm's `create_transform(resolve_data_config)`
for UNI/Virchow2 (resize-shorter-side by crop_pct, center crop, normalize),
torchvision v2 resize(224)+crop for Kaiko (mean/std 0.5), and identity for
the resnets (the reference passes raw [0,1] tensors, `image_encoder.py:83`).

Implemented as jittable JAX ops on (B, H, W, 3) float arrays in [0, 1].
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class TransformSpec:
    size: int = 224                 # final square side
    crop_pct: float = 0.875         # resize shorter side to size/crop_pct
    mean: Tuple[float, ...] = IMAGENET_MEAN
    std: Tuple[float, ...] = IMAGENET_STD
    method: str = "bicubic"
    identity: bool = False


UNI_TRANSFORM = TransformSpec(size=224, crop_pct=1.0)
VIRCHOW2_TRANSFORM = TransformSpec(size=224, crop_pct=1.0,
                                   mean=IMAGENET_MEAN, std=IMAGENET_STD)
KAIKO_TRANSFORM = TransformSpec(size=224, crop_pct=1.0,
                                mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                                method="bilinear")
IDENTITY_TRANSFORM = TransformSpec(identity=True)


@functools.lru_cache(maxsize=64)
def _resize_matrix(n_in: int, n_out: int, method: str) -> np.ndarray:
    """(n_out, n_in) linear map equal to `jax.image.resize` along one axis
    (including its antialiasing on downscale), extracted by resizing an
    identity matrix. Lets the resize run as two MXU matmuls — on TPU,
    `jax.image.resize`'s own bicubic lowering is ~25x slower than a
    matmul formulation."""
    eye = np.eye(n_in, dtype=np.float32)
    # ensure_compile_time_eval: this helper may be reached while tracing a
    # jitted encoder; the weight extraction must run eagerly on host
    with jax.ensure_compile_time_eval():
        m = jax.image.resize(jnp.asarray(eye), (n_out, n_in), method)
        return np.asarray(m)


def matmul_resize(images: jnp.ndarray, nh: int, nw: int,
                  method: str) -> jnp.ndarray:
    """(B, H, W, C) -> (B, nh, nw, C), numerically matching
    `jax.image.resize(images, (B, nh, nw, C), method)`."""
    b, h, w, c = images.shape
    out = images
    if nh != h:
        mh = jnp.asarray(_resize_matrix(h, nh, method), images.dtype)
        out = jnp.einsum("oh,bhwc->bowc", mh, out,
                         preferred_element_type=jnp.float32).astype(images.dtype)
    if nw != w:
        mw = jnp.asarray(_resize_matrix(w, nw, method), images.dtype)
        out = jnp.einsum("pw,bhwc->bhpc", mw, out,
                         preferred_element_type=jnp.float32).astype(images.dtype)
    return out


def apply_transform(images: jnp.ndarray, spec: TransformSpec) -> jnp.ndarray:
    """(B, H, W, 3) in [0,1] -> (B, size, size, 3) normalized."""
    if spec.identity:
        return images
    b, h, w, c = images.shape
    resize_to = int(round(spec.size / spec.crop_pct))
    # resize shorter side to resize_to, preserving aspect
    if h <= w:
        nh, nw = resize_to, max(int(round(w * resize_to / h)), resize_to)
    else:
        nw, nh = resize_to, max(int(round(h * resize_to / w)), resize_to)
    if (nh, nw) != (h, w):
        images = matmul_resize(images, nh, nw, spec.method)
    # center crop
    y0 = (images.shape[1] - spec.size) // 2
    x0 = (images.shape[2] - spec.size) // 2
    images = images[:, y0:y0 + spec.size, x0:x0 + spec.size]
    mean = jnp.asarray(spec.mean, images.dtype)
    std = jnp.asarray(spec.std, images.dtype)
    return (images - mean) / std
