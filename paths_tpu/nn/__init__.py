from paths_tpu.nn.core import (  # noqa: F401
    linear_init,
    linear_apply,
    mlp_init,
    mlp_apply,
    layer_norm_init,
    layer_norm_apply,
    dropout,
)
from paths_tpu.nn.attention import mha_init, mha_apply  # noqa: F401
from paths_tpu.nn.lstm import lstm_cell_init, lstm_cell_apply  # noqa: F401
