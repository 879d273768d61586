from paths_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    pad_batch_indices,
    replicate,
    shard_batch,
)
