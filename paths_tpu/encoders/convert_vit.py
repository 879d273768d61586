"""timm VisionTransformer state_dict -> paths_tpu ViT params.

Key map (timm `vision_transformer.py` naming, used by UNI, Virchow2 and
the Kaiko ViTs):

    patch_embed.proj.weight (D,3,P,P) -> patch_embed.w (P,P,3,D)
    cls_token (1,1,D)                 -> cls_token (D,)
    reg_token (1,R,D)                 -> reg_tokens (R,D)
    pos_embed (1,N,D)                 -> pos_embed (N,D)  [layout inferred]
    blocks.i.attn.qkv.weight (3D,D)   -> blocks[i].attn.qkv_w (D,3D)
    blocks.i.ls{1,2}.gamma            -> blocks[i].ls{1,2}
    blocks.i.mlp.fc{1,2}.*            -> blocks[i].mlp.fc{1,2}_{w,b}
    norm.{weight,bias}                -> norm.{scale,bias}
"""
from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from paths_tpu.encoders.vit import ViTSpec
from paths_tpu.nn.core import Static


def _convert_mlp(g, p: str, spec: ViTSpec) -> dict:
    """MLP weights, transposed to (in, out). SwiGLU hidden dims pad with
    zeros to spec.mlp_hidden_padded (lane-aligned for the fused kernel;
    numerically exact — see ViTSpec.mlp_hidden_padded). The packed fc1's
    gate and value halves pad independently."""
    fc1_w, fc1_b = g(f"{p}.mlp.fc1.weight").T, g(f"{p}.mlp.fc1.bias")
    fc2_w, fc2_b = g(f"{p}.mlp.fc2.weight").T, g(f"{p}.mlp.fc2.bias")
    h, hp = spec.mlp_hidden, spec.mlp_hidden_padded
    if spec.swiglu and hp != h:
        pad_w = np.zeros((fc1_w.shape[0], hp - h), fc1_w.dtype)
        pad_b = np.zeros((hp - h,), fc1_b.dtype)
        fc1_w = np.concatenate(
            [fc1_w[:, :h], pad_w, fc1_w[:, h:], pad_w], axis=1)
        fc1_b = np.concatenate([fc1_b[:h], pad_b, fc1_b[h:], pad_b])
        fc2_w = np.concatenate(
            [fc2_w, np.zeros((hp - h, fc2_w.shape[1]), fc2_w.dtype)], axis=0)
    return {"fc1_w": jnp.asarray(fc1_w), "fc1_b": jnp.asarray(fc1_b),
            "fc2_w": jnp.asarray(fc2_w), "fc2_b": jnp.asarray(fc2_b)}


def vit_from_timm(sd: Mapping[str, np.ndarray], spec: ViTSpec) -> dict:
    g = lambda k: np.asarray(sd[k])
    params = {
        "spec": Static(spec),
        "patch_embed": {
            "w": jnp.asarray(g("patch_embed.proj.weight").transpose(2, 3, 1, 0)),
            "b": jnp.asarray(g("patch_embed.proj.bias")),
        },
        "cls_token": jnp.asarray(g("cls_token").reshape(-1)),
        "pos_embed": jnp.asarray(g("pos_embed")[0]),
        "norm": {"scale": jnp.asarray(g("norm.weight")),
                 "bias": jnp.asarray(g("norm.bias"))},
        "blocks": [],
    }
    if spec.num_reg_tokens:
        params["reg_tokens"] = jnp.asarray(g("reg_token")[0])

    for i in range(spec.depth):
        p = f"blocks.{i}"
        blk = {
            "norm1": {"scale": jnp.asarray(g(f"{p}.norm1.weight")),
                      "bias": jnp.asarray(g(f"{p}.norm1.bias"))},
            "attn": {
                "qkv_w": jnp.asarray(g(f"{p}.attn.qkv.weight").T),
                "qkv_b": jnp.asarray(g(f"{p}.attn.qkv.bias")),
                "proj_w": jnp.asarray(g(f"{p}.attn.proj.weight").T),
                "proj_b": jnp.asarray(g(f"{p}.attn.proj.bias")),
            },
            "norm2": {"scale": jnp.asarray(g(f"{p}.norm2.weight")),
                      "bias": jnp.asarray(g(f"{p}.norm2.bias"))},
            "mlp": _convert_mlp(g, p, spec),
        }
        if spec.layer_scale:
            blk["ls1"] = jnp.asarray(g(f"{p}.ls1.gamma"))
            blk["ls2"] = jnp.asarray(g(f"{p}.ls2.gamma"))
        params["blocks"].append(blk)
    return params


def vit_from_torch_file(path: str, spec: ViTSpec) -> dict:
    """Load a timm checkpoint (`model.state_dict()` saved with torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return vit_from_timm({k: v.numpy() for k, v in sd.items()}, spec)
