"""Randomized parity fuzz: fused engine vs the torch reference loop over
random shapes, K values, background fractions, and model variants.

Selection comparisons skip the two DOCUMENTED deviations (PARITY.md):
  * exactly tied importances anywhere in the top-(K+1) window —
    membership ties at the cutoff AND order ties within the kept set
    are both implementation-defined in torch.topk (a 300-seed soak
    caught seed 2278: three all-zero background cells tied WITHIN the
    kept set, torch permuted them, and 1d positional encoding made the
    order visible in the logits)
  * the all-background fallback rebuilding a bag WIDER than the static
    4K child slots — ours caps at 4K, the reference takes every
    non-background cell (zero-tissue-selection pathology only)
"""
import numpy as np
import torch

from test_hierarchy import make_grids, ref_visited, run_both, visited_locs
from test_model_parity import small_config


def cutoff_tied(importance, mask, k):
    """True when any two importances in the top-(K+1) window tie: a tie
    at the cutoff makes MEMBERSHIP arbitrary, a tie within the kept set
    makes kept ORDER arbitrary (torch.topk's tie order is
    implementation-defined; ours is deterministic lowest-index) — and
    order feeds 1d positional encodings and child enumeration."""
    vals = np.sort(importance[mask])[::-1]
    window = vals[: min(k + 1, len(vals))]
    if len(window) < 2:
        return False
    return bool((np.abs(np.diff(window)) <= 1e-7).any())


def oversize_fallback(ref_batches, top_k, num_levels):
    """True when the reference's bag at some level holds more patches
    than the static 4K child slots — only the all-background fallback
    can do that, and ours caps at 4K (documented deviation)."""
    for lvl in range(1, num_levels):
        num = ref_batches[lvl]["num_ims"].numpy()
        if (num > 4 * top_k[lvl - 1]).any():
            return True
    return False


def test_fuzz_parity_vs_torch_reference():
    checked = 0
    for seed in range(8):
        rng = np.random.default_rng(1000 + seed)
        cfg = small_config(pos_encoding_mode=["1d", "2d"][seed % 2],
                           lstm=bool(seed % 3 != 0))
        cfg.top_k_patches = [int(rng.integers(1, 4)), int(rng.integers(1, 4))]
        d = cfg.model_config.patch_embed_dim
        h, w = int(rng.integers(2, 5)), int(rng.integers(2, 5))
        dims = [(h * 2**l - int(rng.integers(0, 2)),
                 w * 2**l - int(rng.integers(0, 2))) for l in range(3)]
        grids = [make_grids(rng, dims, d,
                            bg_fraction=float(rng.uniform(0, 0.8)))
                 for _ in range(int(rng.integers(1, 4)))]

        ref_logits, ref_batches, outs = run_both(grids, cfg, seed=seed)
        p = cfg.model_config.patch_size

        # per-slide tie detection at every selection cutoff
        tied = False
        for lvl in range(cfg.num_levels - 1):
            imp = np.asarray(outs[lvl]["importance"])
            mask = np.asarray(outs[lvl]["bag"].mask)
            k = cfg.top_k_patches[lvl]
            for j in range(imp.shape[0]):
                if cutoff_tied(imp[j], mask[j], k):
                    tied = True
        if tied or oversize_fallback(ref_batches, cfg.top_k_patches,
                                     cfg.num_levels):
            continue  # documented deviation territory

        for lvl in range(cfg.num_levels):
            assert visited_locs(outs[lvl]["bag"], p) == \
                ref_visited(ref_batches[lvl], p), f"seed {seed} level {lvl}"
        np.testing.assert_allclose(np.asarray(outs[-1]["logits"]),
                                   ref_logits, atol=5e-5,
                                   err_msg=f"seed {seed}")
        checked += 1
    assert checked >= 4, f"only {checked} tie-free seeds; fuzz too weak"
