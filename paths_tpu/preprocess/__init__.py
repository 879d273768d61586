from paths_tpu.preprocess.pipeline import process_slide, process_level  # noqa: F401
from paths_tpu.preprocess.wsi import open_wsi  # noqa: F401
