"""kin_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query & data-processing capabilities of
the reference warehouse (``tmas-crypto/kin-data-pipeline``): the relational
operator surface its ~40 SQL models use, the model-materialization lifecycle
(incremental high-watermark loads, full refresh, clones, date-keyed cleanup),
plus first-class large-scale training-data operators (dedup, similarity
search, multimodal columns, text analysis).

Everything is expressed with the Spark DataFrame API so Catalyst/Tungsten/AQE
own physical planning; there are no RDDs and no row-at-a-time Python UDFs in
any hot path.
"""

__version__ = "0.1.0"

from kin_data_pipeline_spark.session import get_spark  # noqa: F401
