"""Every registered query must hash-match its DuckDB oracle — the same gate
the driver applies (CORRECTNESS_r{N}.json), run locally at sf0.001."""

from __future__ import annotations

import pytest

from kin_data_pipeline_spark.queries import QUERIES
from tests.oracle import assert_no_decimal_terminals, compare_query

@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    if spec.oracle is None:
        df = spec.fn(spark, sf_dir)
        assert_no_decimal_terminals(df)
        assert df.count() >= 0
    else:
        compare_query(spark, sf_dir, spec.fn, spec.oracle)
