"""Survival NLL / cross-entropy vs independent torch computations."""
import numpy as np
import torch

from paths_tpu.ops.losses import cross_entropy_loss, nll_survival_loss, survival_risk


def torch_nll(hazards, y, c, alpha=0.4, eps=1e-7):
    hazards = torch.tensor(hazards)
    y = torch.tensor(y)
    c = torch.tensor(c, dtype=hazards.dtype)
    b = hazards.shape[0]
    surv = torch.cumprod(1 - hazards, dim=1)
    surv_pad = torch.cat([torch.ones(b, 1), surv], dim=1)
    r = torch.arange(b)
    unc = -(1 - c) * (torch.log(surv_pad[r, y].clamp(min=eps))
                      + torch.log(hazards[r, y].clamp(min=eps)))
    cen = -c * torch.log(surv_pad[r, y + 1].clamp(min=eps))
    return ((1 - alpha) * (cen + unc) + alpha * unc).mean().item()


def test_nll_matches_torch():
    rng = np.random.default_rng(1)
    for _ in range(5):
        b, nbins = 6, 4
        hazards = rng.uniform(0.01, 0.99, (b, nbins)).astype(np.float32)
        y = rng.integers(0, nbins, b)
        c = rng.integers(0, 2, b)
        ours = float(nll_survival_loss(hazards, y, c))
        ref = torch_nll(hazards, y, c)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_nll_extreme_hazards_clipped():
    hazards = np.array([[0.0, 1.0, 0.0, 1.0]], np.float32)
    y = np.array([1])
    c = np.array([0])
    val = float(nll_survival_loss(hazards, y, c))
    assert np.isfinite(val)


def test_survival_risk():
    hazards = np.array([[0.5, 0.5], [0.1, 0.2]], np.float32)
    risk = np.asarray(survival_risk(hazards))
    surv = np.cumprod(1 - hazards, axis=1)
    np.testing.assert_allclose(risk, -surv.sum(axis=1), rtol=1e-6)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(5, 3)).astype(np.float32)
    labels = rng.integers(0, 3, 5)
    ours = float(cross_entropy_loss(logits, labels))
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(labels)).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
