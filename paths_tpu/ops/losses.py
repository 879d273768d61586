"""Loss functions.

`nll_survival_loss` is the MCAT-style discrete survival negative
log-likelihood used by the reference (`utils.py:283-305`):
hazards h(t) are per-bin death probabilities; survival S(t) is the
cumulative product of (1 - h); censored patients contribute only
-c*log(S_padded[y+1]); uncensored contribute
-(1-c)*(log(S_padded[y]) + log(h[y])); the total is
(1-alpha)*neg_l + alpha*uncensored, averaged over the batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _weighted_mean(x: jnp.ndarray, weights) -> jnp.ndarray:
    if weights is None:
        return jnp.mean(x)
    w = jnp.asarray(weights, x.dtype)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1e-8)


def nll_survival_loss(hazards: jnp.ndarray, y: jnp.ndarray, c: jnp.ndarray,
                      alpha: float = 0.4, eps: float = 1e-7,
                      weights=None) -> jnp.ndarray:
    """Discrete survival NLL.

    :param hazards: (B, nbins) hazard probabilities in [0, 1] (post-sigmoid)
    :param y: (B,) int ground-truth survival bin
    :param c: (B,) censorship status (1 = censored)
    :param alpha: 1 ignores censored data, 0 weights it equally
    :param weights: optional (B,) sample weights (used to null out padded
        duplicates when a batch is padded to the mesh size); None = mean
    :return: scalar mean loss
    """
    hazards = jnp.asarray(hazards)
    y = jnp.asarray(y, jnp.int32)
    c = jnp.asarray(c, hazards.dtype)
    b = hazards.shape[0]

    survival = jnp.cumprod(1.0 - hazards, axis=1)
    survival_padded = jnp.concatenate(
        [jnp.ones((b, 1), hazards.dtype), survival], axis=1)

    r = jnp.arange(b)
    s_prev = jnp.clip(survival_padded[r, y], min=eps)
    h_this = jnp.clip(hazards[r, y], min=eps)
    s_this = jnp.clip(survival_padded[r, y + 1], min=eps)

    uncensored = -(1.0 - c) * (jnp.log(s_prev) + jnp.log(h_this))
    censored = -c * jnp.log(s_this)
    neg_l = censored + uncensored
    loss = (1.0 - alpha) * neg_l + alpha * uncensored
    return _weighted_mean(loss, weights)


def survival_risk(hazards: jnp.ndarray) -> jnp.ndarray:
    """Risk score from hazards: -sum_t S(t) (reference `eval.py:59-64`)."""
    survival = jnp.cumprod(1.0 - hazards, axis=1)
    return -jnp.sum(survival, axis=1)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       weights=None) -> jnp.ndarray:
    """Mean softmax cross-entropy over int labels (torch `F.cross_entropy`)."""
    logits = jnp.asarray(logits)
    labels = jnp.asarray(labels, jnp.int32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return _weighted_mean(logz - ll, weights)
