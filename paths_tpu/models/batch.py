"""PatchBag — the statically-shaped batch abstraction.

The reference's `PatchBatch` (`data_utils/patch_batch.py:14-70`) pads
variable-length bags to the batch max and derives `valid_inds` from
`num_ims`. A `PatchBag` makes the mask primary and every shape static, so
a whole hierarchy level is one jitted program:

  fts         (B, N, D)        patch features; padding rows are zeros
  locs        (B, N, 2)        pixel coords at the current magnification
  mask        (B, N)  bool     True = real patch
  parent_inds (B, N)  int32    index into the previous level's bag
  ctx_slide   (B, depth, Ds)   slide-level context stack (F^1..F^depth)
  ctx_patch   (B, N, depth, Dp) per-patch hierarchical context
                               (LSTM state when lstm=True)

`depth` varies per level but is static within each level's trace.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PatchBag:
    fts: jnp.ndarray
    locs: jnp.ndarray
    mask: jnp.ndarray
    parent_inds: jnp.ndarray
    ctx_slide: jnp.ndarray
    ctx_patch: jnp.ndarray

    @property
    def batch_size(self) -> int:
        return self.fts.shape[0]

    @property
    def max_patches(self) -> int:
        return self.fts.shape[1]

    @property
    def ctx_depth(self) -> int:
        return self.ctx_slide.shape[1]

    def num_ims(self) -> jnp.ndarray:
        """(B,) count of valid patches (reference `num_ims`)."""
        return jnp.sum(self.mask, axis=1).astype(jnp.int32)

    def check(self) -> None:
        """Shape sanity checks (reference `patch_batch.py:43-54`)."""
        b, n, _ = self.fts.shape
        k = self.ctx_slide.shape[1]
        assert self.locs.shape == (b, n, 2), self.locs.shape
        assert self.mask.shape == (b, n), self.mask.shape
        assert self.parent_inds.shape == (b, n), self.parent_inds.shape
        assert self.ctx_patch.shape[:3] == (b, n, k), self.ctx_patch.shape


def pad_bag(bag: PatchBag, width: int) -> PatchBag:
    """Zero-pad the patch axis to `width` (mask False on padding).

    Masks are primary and padded rows are inert through every processor
    op (tests/test_model_parity.py padding-invariance), so this changes
    shapes only — callers pad to pow-2 buckets to bound the number of
    compiled programs when bag widths vary per slide (heatmap recursion,
    serving)."""
    n = bag.max_patches
    if width <= n:
        return bag
    pad = width - n

    def z(x, axis=1):
        w = [(0, 0)] * x.ndim
        w[axis] = (0, pad)
        return jnp.pad(x, w)

    return dataclasses.replace(
        bag, fts=z(bag.fts), locs=z(bag.locs), mask=z(bag.mask),
        parent_inds=z(bag.parent_inds), ctx_patch=z(bag.ctx_patch))


def initial_bag(fts, locs, mask, ctx_dim, *, parent_inds=None) -> PatchBag:
    """Level-0 bag: empty context stacks, parents default to identity."""
    b, n, _ = fts.shape
    ds, dp = ctx_dim
    if parent_inds is None:
        parent_inds = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    return PatchBag(
        fts=jnp.asarray(fts),
        locs=jnp.asarray(locs, jnp.int32),
        mask=jnp.asarray(mask, bool),
        parent_inds=jnp.asarray(parent_inds, jnp.int32),
        ctx_slide=jnp.zeros((b, 0, ds), fts.dtype),
        ctx_patch=jnp.zeros((b, n, 0, dp), fts.dtype),
    )
