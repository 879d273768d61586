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
    gate and value halves pad independently. Leaves stay NUMPY; the
    caller ships the whole tree with one batched device_put (per-array
    puts cost ~40 ms EACH of fixed dispatch overhead — 16 s of the old
    30 s Virchow2 conversion). Padding writes into preallocated zeros
    instead of concatenating strided views."""
    fc1_w, fc1_b = g(f"{p}.mlp.fc1.weight").T, g(f"{p}.mlp.fc1.bias")
    fc2_w, fc2_b = g(f"{p}.mlp.fc2.weight").T, g(f"{p}.mlp.fc2.bias")
    h, hp = spec.mlp_hidden, spec.mlp_hidden_padded
    if spec.swiglu and hp != h:
        w1 = np.zeros((fc1_w.shape[0], 2 * hp), fc1_w.dtype)
        w1[:, :h], w1[:, hp:hp + h] = fc1_w[:, :h], fc1_w[:, h:]
        b1 = np.zeros((2 * hp,), fc1_b.dtype)
        b1[:h], b1[hp:hp + h] = fc1_b[:h], fc1_b[h:]
        w2 = np.zeros((hp, fc2_w.shape[1]), fc2_w.dtype)
        w2[:h] = fc2_w
        fc1_w, fc1_b, fc2_w = w1, b1, w2
    return {"fc1_w": fc1_w, "fc1_b": fc1_b, "fc2_w": fc2_w, "fc2_b": fc2_b}


def vit_from_timm(sd: Mapping[str, np.ndarray], spec: ViTSpec) -> dict:
    import jax

    g = lambda k: np.asarray(sd[k])
    params = {
        "spec": Static(spec),
        "patch_embed": {
            "w": g("patch_embed.proj.weight").transpose(2, 3, 1, 0),
            "b": g("patch_embed.proj.bias"),
        },
        "cls_token": g("cls_token").reshape(-1),
        "pos_embed": g("pos_embed")[0],
        "norm": {"scale": g("norm.weight"), "bias": g("norm.bias")},
        "blocks": [],
    }
    if spec.num_reg_tokens:
        params["reg_tokens"] = g("reg_token")[0]

    for i in range(spec.depth):
        p = f"blocks.{i}"
        blk = {
            "norm1": {"scale": g(f"{p}.norm1.weight"),
                      "bias": g(f"{p}.norm1.bias")},
            "attn": {
                "qkv_w": g(f"{p}.attn.qkv.weight").T,
                "qkv_b": g(f"{p}.attn.qkv.bias"),
                "proj_w": g(f"{p}.attn.proj.weight").T,
                "proj_b": g(f"{p}.attn.proj.bias"),
            },
            "norm2": {"scale": g(f"{p}.norm2.weight"),
                      "bias": g(f"{p}.norm2.bias")},
            "mlp": _convert_mlp(g, p, spec),
        }
        if spec.layer_scale:
            blk["ls1"] = g(f"{p}.ls1.gamma")
            blk["ls2"] = g(f"{p}.ls2.gamma")
        params["blocks"].append(blk)
    # ONE batched transfer for the ~400 leaves: per-array device_put pays
    # a fixed ~40 ms dispatch cost each (measured: 16 s of a 30 s ViT-H
    # conversion); Static(spec) has no pytree children so it rides along
    return jax.device_put(params)


def vit_from_torch_file(path: str, spec: ViTSpec) -> dict:
    """Load a timm checkpoint (`model.state_dict()` saved with torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return vit_from_timm({k: v.numpy() for k, v in sd.items()}, spec)
