from kin_data_pipeline_spark.functions.compat import (  # noqa: F401
    bucketize,
    date_trunc_day,
    date_trunc_month,
    date_trunc_week,
    dateadd,
    ifnull,
    normalize_sentinel,
    to_timestamp_seconds,
)
