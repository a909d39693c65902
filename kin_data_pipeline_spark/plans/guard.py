"""Production plan guardrails.

The local test suite pins the executed plans of every registered QUERY
(tests/test_plans.py), but a warehouse run materializes MODELS whose
builders evolve independently — the guard gives the Runner the same
protection at materialization time: a plan that degenerated into a
cartesian product (an accidental cross join is the classic 100 TB outage:
a dropped join key turns a linear model into an N² one) or an undeclared
broadcast nested-loop join aborts BEFORE any write or shuffle runs,
costing one Catalyst compile instead of a cluster-day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

class PlanGuardError(RuntimeError):
    """A model's compiled plan contains a shape that cannot scale."""

def assert_scalable_plan(
    df: DataFrame, name: str = "", allow_nested_loop: bool = False
) -> None:
    """Raise ``PlanGuardError`` if the compiled physical plan contains a
    ``CartesianProduct`` (never acceptable) or a
    ``BroadcastNestedLoopJoin`` (acceptable only when explicitly declared —
    the linear scan-against-tiny-broadcast shapes like IVF centroid
    assignment)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    label = f" in model '{name}'" if name else ""
    if "CartesianProduct" in plan:
        raise PlanGuardError(
            f"CartesianProduct{label}: a join lost its keys — this plan is "
            "quadratic in the input and must not be materialized."
        )
    if "BroadcastNestedLoopJoin" in plan and not allow_nested_loop:
        raise PlanGuardError(
            f"BroadcastNestedLoopJoin{label}: either a join predicate is "
            "non-equi by accident, or this model intends a broadcast "
            "small-side scan — declare allow_nested_loop=True to accept it."
        )

# Logical-plan operators an IVM row_transform must not introduce: the
# transform is applied to base rows and to CDF change rows alike, which is
# only sound for operations that commute with the multiset diff the feed
# carries. Per-row column math (Project), row predicates (Filter), and
# per-row fan-out (Generate) all do — they are multiset homomorphisms.
# Aggregation, joins, windows, sorts, limits, dedup, sampling, and
# set-combining do not: applied to a change slice they compute something
# other than "the same mart derivation restricted to the changed rows",
# which would silently corrupt the maintained aggregate.
_NON_ROW_LOCAL = {
    "Aggregate",
    "Join",
    "Window",
    "Sort",
    "GlobalLimit",
    "LocalLimit",
    "Deduplicate",
    "Distinct",
    "Union",
    "Intersect",
    "Except",
    "Sample",
}

def assert_row_local(df: DataFrame, name: str = "") -> None:
    """Raise ``PlanGuardError`` if ``df``'s analyzed logical plan contains
    an operator that does not commute with a multiset diff — the
    soundness gate for ``Model.ivm.row_transform`` (see ``_NON_ROW_LOCAL``
    for the rationale). Node names are matched at line heads of the plan
    tree, so expression text (``sort_array(...)``, a column literally
    named 'Join') cannot false-positive."""
    import re

    plan = df._jdf.queryExecution().analyzed().toString()
    label = f" in model '{name}'" if name else ""
    for line in plan.splitlines():
        m = re.match(r"^[\s:+\-*(0-9)]*([A-Za-z]+)", line)
        if m and m.group(1) in _NON_ROW_LOCAL:
            raise PlanGuardError(
                f"{m.group(1)}{label}: an IVM row_transform must be "
                "row-local (per-row column math, filters, per-row "
                "fan-out) — this operator does not commute with the "
                "change feed's multiset diff, so maintaining through it "
                "would corrupt the aggregate. Use a builder model with "
                "full/watermark refresh for this shape."
            )
