from paths_tpu.train.metrics import binary_auroc, concordance_index_censored  # noqa: F401
from paths_tpu.train.evaluators import (  # noqa: F401
    Evaluator,
    SubtypeClassificationEvaluator,
    SurvivalEvaluator,
)
