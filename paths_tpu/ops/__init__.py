from paths_tpu.ops.pos_encoding import (  # noqa: F401
    positional_encoding_1d,
    positional_encoding_2d_from_pos,
    positional_encoding_2d_grid,
)
from paths_tpu.ops.losses import nll_survival_loss, cross_entropy_loss  # noqa: F401
from paths_tpu.ops.masking import length_mask, masked_topk  # noqa: F401
