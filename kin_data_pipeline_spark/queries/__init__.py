"""Query registry: every implemented operator exposed as a (Spark, oracle-SQL)
pair over the driver testdata tables.

Each entry maps a SURVEY.md §2 operator (or a beyond-reference LLM-pipeline
operator) to:
- a callable ``(spark, sf_dir) -> DataFrame`` built on the engine's
  operator/function modules, and
- an ANSI-SQL oracle string DuckDB runs on the same parquet tables.

Column names and final types are aligned on both sides (the driver's compare
sorts columns by name and value-hashes them). Aggregates over doubles are
cast to DECIMAL before summing so results are exact and order-independent
under Spark's parallel aggregation.
"""

from __future__ import annotations

from kin_data_pipeline_spark.queries.registry import QUERIES, QuerySpec, register  # noqa: F401
import kin_data_pipeline_spark.queries.relational  # noqa: F401,E402
import kin_data_pipeline_spark.queries.llmops  # noqa: F401,E402
import kin_data_pipeline_spark.queries.kin_models  # noqa: F401,E402
import kin_data_pipeline_spark.queries.extended  # noqa: F401,E402

def queries():
    return {name: spec.fn for name, spec in QUERIES.items()}

def oracle_sql():
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
