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

# Logical-plan operators an IVM row_transform MAY introduce: the
# transform is applied to base rows and to CDF change rows alike, which is
# only sound for operations that commute with the multiset diff the feed
# carries — multiset homomorphisms h with h(A ⊎ B) = h(A) ⊎ h(B). Per-row
# column math (Project), row predicates (Filter), per-row fan-out
# (Generate), pure renames/markers (SubqueryAlias, hints), leaf relations,
# and physical-only redistribution (Repartition) all qualify. EVERYTHING
# ELSE is rejected — the gate is an allowlist (VERDICT r9 advice), because
# the failure mode of a missed operator is silent mart corruption:
# aggregation, joins, windows, sorts, limits/offsets, dedup, sampling,
# set-combining, grouped-map/co-grouped Pandas (FlatMapGroupsInPandas,
# MapGroups, CoGroup), arbitrary per-batch Python (MapInPandas — a batch
# function can aggregate or drop rows across the batch), and
# Expand (cube/rollup) all compute something other than "the same
# derivation restricted to the changed rows" when applied to a change
# slice.
_ROW_LOCAL = {
    # per-row operators (multiset homomorphisms)
    "Project",
    "Filter",
    "Generate",
    # pure markers / renames
    "SubqueryAlias",
    "ResolvedHint",
    "UnresolvedHint",
    "Hint",
    # leaf relations the probe/source can appear as
    "LocalRelation",
    "LogicalRDD",
    "Relation",
    "View",
    # physical-only redistribution: same multiset, different placement
    "Repartition",
    "RepartitionByExpression",
    "RepartitionOperation",
}

def assert_row_local(df: DataFrame, name: str = "") -> None:
    """Raise ``PlanGuardError`` if ``df``'s analyzed logical plan contains
    an operator outside the ``_ROW_LOCAL`` allowlist — the soundness gate
    for ``Model.ivm.row_transform``. Allowlist, not denylist: an operator
    the gate has never seen (a new Spark node, a grouped-map Pandas
    transform, Expand from cube/rollup) is rejected by default, because a
    non-homomorphic transform that slips through silently corrupts the
    maintained mart. Node names are matched at line heads of the plan
    tree, so expression text (``sort_array(...)``, a column literally
    named 'Join') cannot false-positive."""
    import re

    plan = df._jdf.queryExecution().analyzed().toString()
    label = f" in model '{name}'" if name else ""
    for line in plan.splitlines():
        m = re.match(r"^[\s:+\-*(0-9)]*([A-Za-z]+)", line)
        if m and m.group(1) not in _ROW_LOCAL:
            raise PlanGuardError(
                f"{m.group(1)}{label}: an IVM row_transform must be "
                "row-local (per-row column math, filters, per-row "
                "fan-out) — this operator is not on the gate's "
                "multiset-homomorphism allowlist, so maintaining through "
                "it could corrupt the aggregate. Use a builder model "
                "with full/watermark refresh for this shape."
            )
