"""Host-side metrics: censored concordance index and binary AUROC.

The reference delegates to `sksurv.metrics.concordance_index_censored`
(`eval.py:3,66-77`) and `torcheval.metrics.BinaryAUROC` (`eval.py:87-117`);
neither ships native here, so both are implemented from their definitions:

* c-index (Harrell): comparable pairs are (i, j) with event_i and
  (t_j > t_i, or t_j == t_i with j censored); a pair is concordant when
  the earlier event carries the higher risk estimate; tied estimates
  count 0.5. Matches sksurv's `_estimate_concordance_index` semantics.
* AUROC: tie-averaged Mann-Whitney rank statistic, equal to the
  trapezoidal ROC integral torcheval computes.
"""
from __future__ import annotations

import numpy as np


class NoComparablePairs(ValueError):
    pass


def concordance_index_censored(event_indicator: np.ndarray,
                               event_time: np.ndarray,
                               estimate: np.ndarray):
    """Censored concordance index.

    :param event_indicator: (n,) bool — True when the event occurred
        (note: the reference passes `1 - censorship`, `eval.py:70`)
    :param event_time: (n,) observed times
    :param estimate: (n,) risk scores (higher = shorter expected survival)
    :return: (cindex, concordant, discordant, tied_risk, tied_time)
    """
    e = np.asarray(event_indicator, bool)
    t = np.asarray(event_time, np.float64)
    s = np.asarray(estimate, np.float64)
    assert e.shape == t.shape == s.shape and e.ndim == 1

    ti, tj = t[:, None], t[None, :]
    comp = e[:, None] & ((tj > ti) | ((tj == ti) & ~e[None, :]))
    np.fill_diagonal(comp, False)

    comparable = int(comp.sum())
    if comparable == 0:
        raise NoComparablePairs("Data has no comparable pairs")

    si, sj = s[:, None], s[None, :]
    concordant = int((comp & (sj < si)).sum())
    tied_risk = int((comp & (sj == si)).sum())
    discordant = comparable - concordant - tied_risk
    tied_time = int(((ti == tj) & e[:, None] & e[None, :]).sum() // 2)

    cindex = (concordant + 0.5 * tied_risk) / comparable
    return cindex, concordant, discordant, tied_risk, tied_time


def binary_auroc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Tie-averaged binary AUROC. Returns 0.0 for degenerate inputs with a
    single class (torcheval returns nan-ish values there; the reference
    only hits this when a subtype is absent from a split)."""
    s = np.asarray(scores, np.float64)
    y = np.asarray(labels).astype(bool)
    npos = int(y.sum())
    nneg = y.size - npos
    if npos == 0 or nneg == 0:
        return 0.0

    order = np.argsort(s, kind="mergesort")
    ranks = np.empty_like(s)
    ranks[order] = np.arange(1, s.size + 1)
    # average ranks over ties
    sorted_s = s[order]
    uniq, start_idx, counts = np.unique(sorted_s, return_index=True,
                                        return_counts=True)
    avg = start_idx + (counts + 1) / 2.0  # 1-based average rank per value
    value_rank = dict(zip(uniq.tolist(), avg.tolist()))
    ranks = np.array([value_rank[v] for v in s.tolist()])

    auc = (ranks[y].sum() - npos * (npos + 1) / 2.0) / (npos * nneg)
    return float(auc)
