"""Declarative data-quality checks over catalog tables — the dbt-style
test layer warehouse pipelines attach to their models (the reference relies
on Snowflake constraints plus manual dashboard eyeballing; here checks are
explicit, runnable, and cheap).

Every check compiles to ONE aggregate over the table — a violation COUNT,
not a violation list — so a check on a 100 TB table is a single scan with
partial aggregation, no shuffle beyond the final reduce, and several checks
on one table fuse into a single pass via ``run_checks``'s combined
aggregation. Violation rows can be fetched separately for debugging
(``violations`` returns the filtered frame lazily).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

@dataclass(frozen=True)
class Check:
    """One named predicate that every row (or group) must satisfy."""

    name: str
    # count of violating rows, as an aggregate expression
    agg: Column
    # filter producing the violating rows (debugging path)
    predicate: Column | None = None

def not_null(*cols: str) -> Check:
    cond = None
    for c in cols:
        cc = F.col(c).isNull()
        cond = cc if cond is None else (cond | cc)
    return Check(
        name=f"not_null({', '.join(cols)})",
        agg=F.sum(cond.cast("long")),
        predicate=cond,
    )

def unique(*cols: str) -> Check:
    # duplicates = non-null-keyed rows beyond the first per key. NULL-key
    # rows are ignored (count_distinct drops them, so the base count must
    # too — otherwise one legitimately-nullable key row reads as a
    # duplicate); pair with not_null to forbid NULL keys. Fuses into
    # run_checks' single aggregation like every other check.
    nn = None
    for c in cols:
        cc = F.col(c).isNotNull()
        nn = cc if nn is None else (nn & cc)
    return Check(
        name=f"unique({', '.join(cols)})",
        agg=(F.sum(nn.cast("long")) - F.count_distinct(*[F.col(c) for c in cols])),
        predicate=None,
    )

def accepted_values(col: str, values: Sequence) -> Check:
    # NULLs are always ignored (dbt semantics — pair with not_null to forbid
    # them), and None is stripped from the list: a NULL inside isin() turns
    # the whole predicate NULL under three-valued logic, which would make
    # the check vacuously pass on ANY value.
    vals = [v for v in values if v is not None]
    cond = F.col(col).isNotNull() & ~F.col(col).isin(vals)
    # Parameter values are part of the name: two accepted_values() on the
    # same column with different lists are DIFFERENT checks, and run_checks
    # keys its result dict by name.
    return Check(
        name=f"accepted_values({col}, {vals!r})",
        agg=F.sum(cond.cast("long")),
        predicate=cond,
    )

def non_negative(*cols: str) -> Check:
    cond = None
    for c in cols:
        cc = F.col(c) < 0
        cond = cc if cond is None else (cond | cc)
    return Check(
        name=f"non_negative({', '.join(cols)})",
        agg=F.sum(cond.cast("long")),
        predicate=cond,
    )

def in_range(col: str, lo, hi) -> Check:
    cond = (F.col(col) < lo) | (F.col(col) > hi)
    return Check(
        name=f"in_range({col}, {lo}, {hi})",
        agg=F.sum(cond.cast("long")),
        predicate=cond,
    )

def run_checks(df: DataFrame, checks: Sequence[Check]) -> dict[str, int]:
    """Evaluate all checks; returns {check_name: violation_count}.

    Row-predicate checks fuse into ONE aggregation pass over the table;
    uniqueness checks (which need distinct counting) are evaluated in the
    same single job as additional aggregate expressions — still one scan.
    """
    if not checks:
        return {}
    names = [c.name for c in checks]
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        # A name collision would silently keep only the last count — a
        # violated earlier check could be masked in assert_checks.
        raise ValueError(f"duplicate check names: {dupes}")
    aggs = [F.coalesce(c.agg, F.lit(0)).cast("long").alias(str(i)) for i, c in enumerate(checks)]
    row = df.agg(*aggs).collect()[0]
    return {c.name: int(row[str(i)]) for i, c in enumerate(checks)}

def violations(df: DataFrame, check: Check) -> DataFrame:
    """The violating rows for a row-predicate check (lazy; for debugging)."""
    if check.predicate is None:
        raise ValueError(f"{check.name} has no row-level predicate form")
    return df.filter(check.predicate)

def assert_checks(df: DataFrame, checks: Sequence[Check], table: str = "") -> None:
    """Raise with a per-check report if any check is violated."""
    results = run_checks(df, checks)
    bad = {k: v for k, v in results.items() if v > 0}
    if bad:
        detail = ", ".join(f"{k}: {v} rows" for k, v in bad.items())
        raise AssertionError(f"data-quality failures on {table or 'frame'}: {detail}")
