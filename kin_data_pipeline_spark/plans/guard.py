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
