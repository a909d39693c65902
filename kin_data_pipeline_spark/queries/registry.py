"""Registry plumbing for the query inventory."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""

QUERIES: dict[str, QuerySpec] = {}

def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a query implementation with its oracle SQL."""

    def wrap(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap
