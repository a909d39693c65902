from kin_data_pipeline_spark.operators.relational import (  # noqa: F401
    anti_join,
    argmax_rows,
    semi_join,
    top_k_per_group,
    union_dedup,
    unpivot_roles,
)
from kin_data_pipeline_spark.operators.rangejoin import (  # noqa: F401
    asof_join,
    forward_inactivity_anti,
    trailing_distinct_count,
    trailing_window_agg,
)
