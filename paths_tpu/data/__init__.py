from paths_tpu.data.feature_store import FeatureStore  # noqa: F401
from paths_tpu.data.slide import SlidePyramid  # noqa: F401
from paths_tpu.data.dataset import (  # noqa: F401
    SlideDataset,
    collate_batch,
    load_metadata,
    load_splits,
)
