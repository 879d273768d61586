"""Certify a dropped-in torch encoder checkpoint before preprocessing a
cohort: convert it, and prove forward parity against the torch oracle.

No real pretrained weights can be downloaded in this environment, so this
is the day-one-with-weights harness: a user with a real UNI / Virchow2 /
Kaiko / resnet state_dict runs

    python -m paths_tpu.cli.verify_conversion --model UNI --weights uni.pt

and gets (1) a strict state_dict load into a torch mirror with timm /
torchvision key layout — any key or shape mismatch fails loudly — and
(2) the max-abs / max-rel error between the torch forward and the
converted JAX forward on N random images, checked against a tolerance.
Both sides consume identical pre-transformed tensors, so the number
isolates WEIGHT-CONVERSION error (the resize/normalize transform has its
own parity tests, tests/test_encoders.py).

Covers every timm pos-embed layout (inferred from the checkpoint's
`pos_embed` row count — `encoders/vit.py::vit_apply`) and the Virchow2
SwiGLU hidden-padding (`encoders/convert_vit.py::_convert_mlp`).
Reference encoder zoo: `model/image_encoder.py:30-86`.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _vit_pos_layout(sd, spec) -> str:
    rows = sd["pos_embed"].shape[1]
    n = spec.num_patches
    if rows == n:
        return "patch"
    if rows == n + 1:
        return "cls"
    if rows == n + 1 + spec.num_reg_tokens:
        return "all"
    raise ValueError(
        f"pos_embed has {rows} rows; expected {n} (no_embed_class), "
        f"{n + 1} (cls+patches) or {n + 1 + spec.num_reg_tokens} "
        f"(all tokens) for {spec}")


def verify_vit(name: str, sd: dict, images: np.ndarray,
               compute_dtype="float32", spec=None) -> dict:
    """Returns {"max_abs", "max_rel", "pos_layout", "out_torch",
    "out_jax"}; raises on key/shape mismatch. `spec` overrides the
    registry lookup (tests exercise custom layouts on small specs)."""
    import jax.numpy as jnp
    import torch

    from paths_tpu.encoders.convert_vit import vit_from_timm
    from paths_tpu.encoders.registry import _VIT_SPECS
    from paths_tpu.encoders.torch_mirror import timm_vit_mirror
    from paths_tpu.encoders.vit import vit_apply

    if spec is None:
        spec, _ = _VIT_SPECS[name]
    layout = _vit_pos_layout(sd, spec)

    mirror = timm_vit_mirror(spec, pos_layout=layout).eval()
    missing, unexpected = mirror.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    if missing or unexpected:
        raise ValueError(
            f"state_dict does not match the {name} architecture: "
            f"missing={sorted(missing)} unexpected={sorted(unexpected)}")

    with torch.no_grad():
        out_t = mirror(
            torch.as_tensor(images.transpose(0, 3, 1, 2))).numpy()

    params = vit_from_timm({k: np.asarray(v) for k, v in sd.items()}, spec)
    out_j = np.asarray(vit_apply(params, jnp.asarray(images),
                                 compute_dtype=jnp.dtype(compute_dtype)))
    return _errors(out_t, out_j) | {"pos_layout": layout}


def verify_resnet(name: str, sd: dict, images: np.ndarray,
                  compute_dtype="float32") -> dict:
    import jax.numpy as jnp
    import torch

    from paths_tpu.encoders.resnet import resnet_apply, resnet_from_torchvision
    from paths_tpu.encoders.torch_mirror import TorchResNet18, TorchResNet50

    mirror = (TorchResNet50() if name == "resnet50" else TorchResNet18()).eval()
    # torchvision checkpoints carry fc.* (the reference replaces fc with
    # Identity, `image_encoder.py:74-79`) and num_batches_tracked
    sd_t = {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()
            if not k.startswith("fc.")}
    missing, unexpected = mirror.load_state_dict(sd_t, strict=False)
    missing = [k for k in missing if "num_batches_tracked" not in k]
    if missing or unexpected:
        raise ValueError(
            f"state_dict does not match the {name} architecture: "
            f"missing={sorted(missing)} unexpected={sorted(unexpected)}")

    with torch.no_grad():
        out_t = mirror(torch.as_tensor(images.transpose(0, 3, 1, 2))).numpy()
    params = resnet_from_torchvision({k: np.asarray(v) for k, v in sd.items()},
                                     name)
    out_j = np.asarray(resnet_apply(params, jnp.asarray(images),
                                    compute_dtype=jnp.dtype(compute_dtype)))
    return _errors(out_t, out_j)


def _errors(out_t: np.ndarray, out_j: np.ndarray) -> dict:
    abs_err = np.abs(out_j - out_t)
    denom = np.maximum(np.abs(out_t), 1e-6)
    return {"max_abs": float(abs_err.max()),
            "max_rel": float((abs_err / denom).max()),
            "out_torch": out_t, "out_jax": out_j}


def run(model: str, weights: str, n_images: int = 4, seed: int = 0,
        tol: float = 1e-3, compute_dtype: str = "float32") -> dict:
    """Load, convert, compare; returns the error dict (CLI-independent so
    tests drive it directly)."""
    import torch

    from paths_tpu.encoders.registry import _VIT_SPECS

    name = model.lower()
    sd = torch.load(weights, map_location="cpu", weights_only=True)
    if "model" in sd and isinstance(sd.get("model"), dict):
        sd = sd["model"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    rng = np.random.default_rng(seed)
    if name in _VIT_SPECS:
        spec, _ = _VIT_SPECS[name]
        images = rng.uniform(-1.5, 1.5, (n_images, spec.img_size,
                                         spec.img_size, 3)).astype(np.float32)
        res = verify_vit(name, sd, images, compute_dtype)
    elif name in ("resnet50", "resnet18"):
        images = rng.uniform(-1.5, 1.5, (n_images, 224, 224, 3)).astype(
            np.float32)
        res = verify_resnet(name, sd, images, compute_dtype)
    else:
        raise ValueError(f"Unknown encoder '{model}'")
    res["ok"] = res["max_abs"] <= tol
    return res


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--model", required=True,
                        help="UNI / Virchow2 / kaiko-vits16 / ... / resnet50")
    parser.add_argument("--weights", required=True,
                        help="torch state_dict file (timm ViT or "
                             "torchvision resnet layout)")
    parser.add_argument("--images", type=int, default=4,
                        help="number of random probe images")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tol", type=float, default=1e-3,
                        help="max-abs forward error to certify (f32)")
    args = parser.parse_args(argv)

    import jax

    # parity-grade numerics: f32 everywhere, no bf16 matmul passes —
    # scoped so callers chaining other stages (e.g. the demo) keep their
    # own precision defaults
    with jax.default_matmul_precision("highest"):
        res = run(args.model, args.weights, n_images=args.images,
                  seed=args.seed, tol=args.tol)
    layout = res.get("pos_layout", "-")
    print(f"{args.model}: pos_layout={layout} "
          f"max_abs_err={res['max_abs']:.3e} max_rel_err={res['max_rel']:.3e} "
          f"over {args.images} images -> "
          f"{'OK' if res['ok'] else f'FAIL (tol {args.tol})'}")
    if not res["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
