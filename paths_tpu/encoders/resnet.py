"""Inference-mode ResNet-18/50 feature extractors in JAX (NHWC).

The reference offers torchvision resnets with the classifier removed as
baseline patch encoders (`model/image_encoder.py:74-83`). Encoders are
frozen at preprocess time, so BatchNorm is folded into an affine transform
from the running statistics (eval semantics). Conversion from torchvision
state_dicts: `resnet_from_torchvision`.
"""
from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from paths_tpu.nn.core import Static

RESNET18_LAYERS = (2, 2, 2, 2)      # BasicBlock
RESNET50_LAYERS = (3, 4, 6, 3)      # Bottleneck


def _conv(x, w, stride=1, cd=jnp.bfloat16):
    # w: HWIO. Torch-style symmetric padding (k-1)//2 — XLA's SAME pads
    # asymmetrically for stride-2 convs and would diverge from torchvision.
    p = (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x.astype(cd), w.astype(cd), (stride, stride), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(cd)


def _affine(x, p):
    # folded BN: y = x * scale + bias, computed in fp32
    return (x.astype(jnp.float32) * p["scale"] + p["bias"]).astype(x.dtype)


def _fold_bn(sd, prefix, eps=1e-5):
    g = lambda k: np.asarray(sd[f"{prefix}.{k}"])
    w, b = g("weight"), g("bias")
    mean, var = g("running_mean"), g("running_var")
    scale = w / np.sqrt(var + eps)
    return {"scale": jnp.asarray(scale), "bias": jnp.asarray(b - mean * scale)}


def _conv_w(sd, key):
    # torch OIHW -> HWIO
    return jnp.asarray(np.asarray(sd[key]).transpose(2, 3, 1, 0))


def resnet_from_torchvision(sd: Mapping[str, np.ndarray],
                            arch: str = "resnet50") -> dict:
    layers = RESNET50_LAYERS if arch == "resnet50" else RESNET18_LAYERS
    bottleneck = arch == "resnet50"
    params = {
        "arch": Static(arch),
        "stem": {"w": _conv_w(sd, "conv1.weight"), "bn": _fold_bn(sd, "bn1")},
        "stages": [],
    }
    for s, n in enumerate(layers, start=1):
        stage = []
        for b in range(n):
            p = f"layer{s}.{b}"
            blk = {}
            ks = ["conv1", "conv2", "conv3"] if bottleneck else ["conv1", "conv2"]
            for k in ks:
                blk[k] = {"w": _conv_w(sd, f"{p}.{k}.weight"),
                          "bn": _fold_bn(sd, f"{p}.bn{k[-1]}")}
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "w": _conv_w(sd, f"{p}.downsample.0.weight"),
                    "bn": _fold_bn(sd, f"{p}.downsample.1")}
            stage.append(blk)
        params["stages"].append(stage)
    return params


def _basic_block(x, blk, stride, cd):
    idn = x
    y = _affine(_conv(x, blk["conv1"]["w"], stride, cd), blk["conv1"]["bn"])
    y = jax.nn.relu(y)
    y = _affine(_conv(y, blk["conv2"]["w"], 1, cd), blk["conv2"]["bn"])
    if "downsample" in blk:
        idn = _affine(_conv(x, blk["downsample"]["w"], stride, cd),
                      blk["downsample"]["bn"])
    return jax.nn.relu(y + idn)


def _bottleneck_block(x, blk, stride, cd):
    idn = x
    y = jax.nn.relu(_affine(_conv(x, blk["conv1"]["w"], 1, cd), blk["conv1"]["bn"]))
    y = jax.nn.relu(_affine(_conv(y, blk["conv2"]["w"], stride, cd), blk["conv2"]["bn"]))
    y = _affine(_conv(y, blk["conv3"]["w"], 1, cd), blk["conv3"]["bn"])
    if "downsample" in blk:
        idn = _affine(_conv(x, blk["downsample"]["w"], stride, cd),
                      blk["downsample"]["bn"])
    return jax.nn.relu(y + idn)


def resnet_apply(params: dict, images: jnp.ndarray,
                 compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, 512|2048) global-average-pooled features."""
    cd = compute_dtype
    arch = params["arch"].value
    block = _bottleneck_block if arch == "resnet50" else _basic_block

    x = _affine(_conv(images, params["stem"]["w"], 2, cd), params["stem"]["bn"])
    x = jax.nn.relu(x)
    # 3x3/2 max pool, torch padding 1 on both sides
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    for s, stage in enumerate(params["stages"]):
        for b, blk in enumerate(stage):
            stride = 2 if (s > 0 and b == 0) else 1
            x = block(x, blk, stride, cd)
    return x.mean(axis=(1, 2)).astype(jnp.float32)
