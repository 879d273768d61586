"""On-disk store of preprocessed per-level feature grids.

Output contract matches the reference preprocessor
(`preprocess/preprocess.py:172-175`, `preprocess/loader.py:14-18`): one
array per (slide, magnification) named `{slide_id}_{power:.3f}`, shape
H x W x D, with all-zero rows marking background.

Native format is `.npy` (zero-copy memory-mappable — the TPU data path
streams rows straight out of the page cache). Reference `.pt` files are
read transparently when torch is importable, so a user can point the
framework at an existing PATHS preprocess directory — and a store
created with `save_format="pt"` writes grids the reference's own loader
(`preprocess/loader.py:14-18` `torch.load`) consumes directly, so a
paths_tpu-preprocessed store can feed the reference's training script
(interop both ways; the checkpoint counterpart is
`convert.save_torch_checkpoint`).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from paths_tpu.config import power_str


class FeatureStore:
    def __init__(self, root: str, create: bool = False,
                 save_format: str = "npy"):
        if create:
            os.makedirs(root, exist_ok=True)
        assert os.path.isdir(root), (
            f"Preprocessing root directory '{root}' not found!")
        assert save_format in ("npy", "pt"), save_format
        self.root = root
        self.save_format = save_format

    def _base(self, slide_id: str, power: float) -> str:
        return os.path.join(self.root, f"{slide_id}_{power_str(power)}")

    def path(self, slide_id: str, power: float) -> Optional[str]:
        base = self._base(slide_id, power)
        for ext in (".npy", ".pt"):
            if os.path.isfile(base + ext):
                return base + ext
        return None

    def exists(self, slide_id: str, power: float) -> bool:
        return self.path(slide_id, power) is not None

    def dtype(self, slide_id: str, power: float) -> Optional[np.dtype]:
        """Stored dtype of an existing grid, read from the .npy header
        (no data load). None when absent or `.pt` (reference grids are
        always f32; probing one would deserialize the tensor)."""
        p = self.path(slide_id, power)
        if p is None or not p.endswith(".npy"):
            return None
        return np.load(p, mmap_mode="r").dtype

    def save(self, slide_id: str, power: float, grid: np.ndarray) -> str:
        assert grid.ndim == 3, f"grid must be H x W x D, got {grid.shape}"
        if self.save_format == "pt":
            # reference-consumable grids: a plain float32 tensor, the
            # exact object `preprocess/preprocess.py:141` torch.saves and
            # `preprocess/loader.py:14-18` torch.loads (f16 grids are
            # upcast — the reference's model math expects f32 features)
            import torch

            p = self._base(slide_id, power) + ".pt"
            torch.save(torch.from_numpy(
                np.ascontiguousarray(grid, dtype=np.float32)), p)
            return p
        p = self._base(slide_id, power) + ".npy"
        np.save(p, grid)
        return p

    def load(self, slide_id: str, power: float, mmap: bool = True) -> np.ndarray:
        p = self.path(slide_id, power)
        assert p is not None, (
            f"Pre-process load: '{self._base(slide_id, power)}.npy' not found!")
        if p.endswith(".npy"):
            return np.load(p, mmap_mode="r" if mmap else None)
        # reference-format torch tensor
        import torch

        return torch.load(p, map_location="cpu", weights_only=True).numpy()
