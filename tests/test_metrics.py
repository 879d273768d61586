"""Metric implementations vs sklearn (AUC) and hand-derived c-index cases
(sksurv is unavailable; semantics documented in paths_tpu/train/metrics.py)."""
import numpy as np
import pytest
from sklearn.metrics import roc_auc_score

from paths_tpu.train.evaluators import (
    SubtypeClassificationEvaluator,
    SurvivalEvaluator,
)
from paths_tpu.train.metrics import (
    NoComparablePairs,
    binary_auroc,
    concordance_index_censored,
)


def test_auroc_matches_sklearn():
    rng = np.random.default_rng(0)
    for _ in range(10):
        n = 50
        scores = rng.normal(size=n)
        labels = rng.integers(0, 2, n)
        if labels.sum() in (0, n):
            continue
        np.testing.assert_allclose(binary_auroc(scores, labels),
                                   roc_auc_score(labels, scores), atol=1e-10)


def test_auroc_with_ties():
    scores = np.array([0.5, 0.5, 0.5, 0.2, 0.8])
    labels = np.array([1, 0, 1, 0, 1])
    np.testing.assert_allclose(binary_auroc(scores, labels),
                               roc_auc_score(labels, scores), atol=1e-10)


def test_auroc_degenerate():
    assert binary_auroc(np.array([0.1, 0.9]), np.array([1, 1])) == 0.0


def test_cindex_perfect_and_reversed():
    # events at times 1..4, risks perfectly anti-ordered with time
    t = np.array([1.0, 2.0, 3.0, 4.0])
    e = np.array([True, True, True, True])
    risk = np.array([4.0, 3.0, 2.0, 1.0])
    c, con, dis, tr, tt = concordance_index_censored(e, t, risk)
    assert c == 1.0 and con == 6 and dis == 0
    c2 = concordance_index_censored(e, t, -risk)[0]
    assert c2 == 0.0


def test_cindex_censoring_rules():
    # censored sample only comparable as the LATER member of a pair
    t = np.array([2.0, 1.0, 3.0])
    e = np.array([False, True, True])  # sample 0 censored at t=2
    risk = np.array([1.0, 5.0, 0.0])
    # comparable: (1,0): t0>t1, event1 -> risk1>risk0 concordant
    #             (1,2): t2>t1 -> risk1>risk2 concordant
    #             (2,?): t=3 is the max -> nothing later
    c, con, dis, tr, tt = concordance_index_censored(e, t, risk)
    assert (con, dis, tr) == (2, 0, 0) and c == 1.0


def test_cindex_tied_times_and_risks():
    # event and censored at the same time ARE comparable; two events at the
    # same time are NOT
    t = np.array([1.0, 1.0, 1.0, 2.0])
    e = np.array([True, True, False, True])
    risk = np.array([3.0, 3.0, 3.0, 1.0])
    c, con, dis, tr, tt = concordance_index_censored(e, t, risk)
    # pairs: (0,2) tied risk, (1,2) tied risk, (0,3) con, (1,3) con
    assert (con, tr) == (2, 2)
    np.testing.assert_allclose(c, (2 + 0.5 * 2) / 4)


def test_cindex_no_comparable_raises():
    with pytest.raises(NoComparablePairs):
        concordance_index_censored(np.array([False, False]),
                                   np.array([1.0, 2.0]), np.array([0.5, 0.2]))


def test_survival_evaluator_end_to_end():
    ev = SurvivalEvaluator("val")
    hazards = np.array([[0.9, 0.9], [0.1, 0.1]])  # slide 0 = high risk
    batch = {"censored": np.array([0, 0]), "survival": np.array([1.0, 10.0])}
    ev.register(batch, hazards, 0.7)
    out = ev.calculate()
    assert out["val_c-index"] == 1.0
    assert abs(out["val_loss"] - 0.7) < 1e-9

    stats = {"val_c-index": {}, "val_loss": {}}
    ev.calculate(stats, epoch=3)
    assert stats["val_c-index"][3] == 1.0


def test_survival_evaluator_all_censored_guard():
    ev = SurvivalEvaluator("val")
    hazards = np.array([[0.5, 0.5], [0.5, 0.5]])
    batch = {"censored": np.array([1, 1]), "survival": np.array([1.0, 2.0])}
    ev.register(batch, hazards, 1.0)
    assert ev.calculate()["val_c-index"] == 0.5


def test_subtype_evaluator():
    ev = SubtypeClassificationEvaluator("test", 2)
    logits = np.array([[2.0, -1.0], [-1.0, 3.0], [1.5, 0.0]])
    batch = {"subtype": np.array([0, 1, 0])}
    ev.register(batch, logits, 0.3)
    out = ev.calculate()
    assert out["test_AUC"] == 1.0
