from paths_tpu.engine.tables import LevelTable, build_level_table, stack_tables  # noqa: F401
from paths_tpu.engine.hierarchy import (  # noqa: F401
    hierarchy_step,
    end2end_forward,
    end2end_loss,
)
