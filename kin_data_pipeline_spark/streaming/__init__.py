from kin_data_pipeline_spark.streaming.cdf_source import (  # noqa: F401
    CatalogChangesDataSource,
    read_table_changes,
    stream_table_changes,
)
from kin_data_pipeline_spark.streaming.ingest import (  # noqa: F401
    ingest_changelog_to_catalog,
    ingest_to_catalog,
    last_committed_batch,
    stream_corpus_increments,
)
from kin_data_pipeline_spark.streaming.rollup import (  # noqa: F401
    daily_rollup_stream,
    purchase_view_join_stream,
    purchase_view_left_join_stream,
    running_balance_stream,
    sessionize_stream,
    stream_events_from_parquet,
)
