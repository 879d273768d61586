from paths_tpu.models.batch import PatchBag  # noqa: F401
from paths_tpu.models.recursive import recursive_init, recursive_apply  # noqa: F401
