"""Epoch-level evaluators accumulating per-batch statistics.

Mirrors the reference's `Evaluator` hierarchy (`eval.py:9-120`):
`SurvivalEvaluator` accumulates censorship / event time / risk (risk =
-sum of cumulative survival, `eval.py:59-64`) and reports the censored
concordance index with the all-censored guard (`eval.py:66-77`);
`SubtypeClassificationEvaluator` reports mean one-vs-rest AUROC.
Both emit `{split}_loss` plus their metric and can write into a
`train_stats` history dict keyed by epoch.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, Optional

import numpy as np

from paths_tpu.train.metrics import (
    NoComparablePairs,
    binary_auroc,
    concordance_index_censored,
)


class Evaluator(ABC):
    def __init__(self, split: str):
        self.split = split
        self.losses = []

    @abstractmethod
    def reset(self) -> None: ...

    @abstractmethod
    def register(self, batch: Dict, pred, loss) -> None: ...

    @abstractmethod
    def calculate(self, train_stats: Optional[dict] = None,
                  epoch: Optional[int] = None) -> Dict: ...

    def _add_to_train_stats(self, epoch, out, train_stats) -> None:
        if train_stats is None:
            return
        for key, val in out.items():
            if key in train_stats:
                if epoch is None:
                    train_stats[key] = val
                else:
                    train_stats[key][epoch] = val


class SurvivalEvaluator(Evaluator):
    def __init__(self, split: str):
        super().__init__(split)
        self.all_censorships = []
        self.all_event_times = []
        self.all_risk_scores = []

    def reset(self):
        self.losses.clear()
        self.all_censorships.clear()
        self.all_event_times.clear()
        self.all_risk_scores.clear()

    def register(self, batch: Dict, hazards, loss):
        """:param batch: dict with "censored" (1 = censored) and "survival"
        (event/censoring time in months)
        :param hazards: (B, nbins) post-sigmoid hazards"""
        self.losses.append(float(loss))
        hazards = np.asarray(hazards)
        survival = np.cumprod(1.0 - hazards, axis=1)
        risk = -survival.sum(axis=1)
        self.all_censorships.append(np.asarray(batch["censored"]))
        self.all_event_times.append(np.asarray(batch["survival"]))
        self.all_risk_scores.append(risk)

    def calculate(self, train_stats=None, epoch=None):
        events = (1 - np.concatenate(self.all_censorships)).astype(bool)
        times = np.concatenate(self.all_event_times)
        risks = np.concatenate(self.all_risk_scores)

        if events.sum() <= 1:
            # all-censored guard (`eval.py:72-74`)
            c_index = 0.5
        else:
            try:
                c_index = concordance_index_censored(events, times, risks)[0]
            except NoComparablePairs:
                c_index = 0.5

        out = {
            f"{self.split}_loss": float(np.mean(self.losses)),
            f"{self.split}_c-index": float(c_index),
        }
        self._add_to_train_stats(epoch, out, train_stats)
        return out


class SubtypeClassificationEvaluator(Evaluator):
    def __init__(self, split: str, nclasses: int):
        super().__init__(split)
        self.nclasses = nclasses
        self.all_preds = []
        self.all_subtypes = []

    def reset(self):
        self.losses.clear()
        self.all_preds.clear()
        self.all_subtypes.clear()

    def register(self, batch: Dict, logits, loss):
        self.losses.append(float(loss))
        logits = np.asarray(logits, np.float64)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        self.all_preds.append(e / e.sum(axis=-1, keepdims=True))
        self.all_subtypes.append(np.asarray(batch["subtype"]))

    def calculate(self, train_stats=None, epoch=None):
        preds = np.concatenate(self.all_preds)
        subtypes = np.concatenate(self.all_subtypes)
        aucs = [binary_auroc(preds[:, i], subtypes == i)
                for i in range(self.nclasses)]
        out = {
            f"{self.split}_loss": float(np.mean(self.losses)),
            f"{self.split}_AUC": float(np.mean(aucs)),
        }
        self._add_to_train_stats(epoch, out, train_stats)
        return out


def make_evaluator(config, split: str) -> Evaluator:
    """Reference `train.py:32-36`."""
    if config.task == "subtype_classification":
        return SubtypeClassificationEvaluator(split, len(config.filter_to_subtypes))
    return SurvivalEvaluator(split)
