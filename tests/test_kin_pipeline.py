"""End-to-end Kin DAG run through the materialization engine: incremental
equals full refresh across the whole model chain (SURVEY.md §5 layer 3)."""

from __future__ import annotations

import datetime

from kin_data_pipeline_spark.models.pipeline import build_kin_models
from kin_data_pipeline_spark.plans.engine import Catalog, Runner

FINAL = datetime.date(2024, 1, 31)

def _snap(cat, name):
    return sorted(tuple(str(v) for v in r) for r in cat.table(name).collect())

def test_kin_dag_incremental_equals_full(spark, sf_dir, tmp_path):
    models = build_kin_models(sf_dir)

    cat_full = Catalog(spark, str(tmp_path / "full"))
    Runner(spark, cat_full).run(models, FINAL, "full_refresh")

    cat_inc = Catalog(spark, str(tmp_path / "inc"))
    runner = Runner(spark, cat_inc)
    for d in (datetime.date(2024, 1, 12), datetime.date(2024, 1, 23), FINAL):
        runner.run(models, d, "incremental")

    for name in (
        "fact_kin_transaction",
        "daily_kin_transactions",
        "weekly_kin_transactions",
        "export_daily_summary",
    ):
        assert _snap(cat_inc, name) == _snap(cat_full, name), name

    # Clone resolves to its source's current contents.
    assert _snap(cat_full, "daily_kin_transactions_clone") == _snap(
        cat_full, "daily_kin_transactions"
    )
