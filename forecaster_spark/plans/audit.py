"""Structural plan-shape checks — the audit primitives behind
``tools/plan_audit.py``.

The r4 audit exempted BroadcastNestedLoopJoin by QUERY NAME with a
hand-audit comment; a refactor that changed a whitelisted query's join
shape would have kept its exemption. r5 makes the exemption structural:
a BNLJ is acceptable only when the side being BROADCAST is provably a
single row at any corpus scale — i.e. its plan subtree ends in a GLOBAL
aggregate (grouping keys empty). Anything else (a table broadcast, a
grouped aggregate, a raw scan) is the unbounded-broadcast shape that
dies at 10^12 rows, whatever the query is called.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_AGG_EXECS = ("HashAggregateExec", "SortAggregateExec", "ObjectHashAggregateExec")

# Row-count-preserving-or-reducing single-child wrappers that may sit
# between the BNLJ's build side and the global aggregate that bounds it.
# Anything NOT in this list (a join, a scan, a generate/explode, a union)
# means the broadcast root is not provably 1 row — reject.
_PASSTHROUGH = (
    "BroadcastExchangeExec",
    "ShuffleExchangeExec",
    "ProjectExec",
    "FilterExec",
    "WholeStageCodegenExec",
    "InputAdapter",
    "AQEShuffleReadExec",
    "SortExec",
    "CoalesceExec",
    "AdaptiveSparkPlanExec",
)


def _walk(jplan):
    """Depth-first nodes of a JVM SparkPlan tree (py4j traversal)."""
    yield jplan
    children = jplan.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def _has_global_agg(jplan) -> bool:
    """True iff the broadcast subtree's ROOT is bounded by a global
    aggregate: descend only through single-child row-preserving wrappers
    until the first aggregate, which must have NO grouping keys (output
    exactly one row at any input cardinality). Merely CONTAINING a global
    aggregate somewhere below a join/scan is not enough — that was the
    r5-review hole where `big_table JOIN (1-row count)` would have passed."""
    node = jplan
    while True:
        name = node.getClass().getSimpleName()
        if name in _AGG_EXECS:
            return bool(node.groupingExpressions().isEmpty())
        if name not in _PASSTHROUGH or node.children().size() != 1:
            return False
        node = node.children().apply(0)


def bnlj_report(df: DataFrame) -> list[tuple[str, bool]]:
    """For every BroadcastNestedLoopJoin in the pre-AQE physical plan,
    report ``(build_side, broadcast_is_scalar)`` — scalar meaning the
    broadcast subtree is a 1-row global aggregate. Empty list = no BNLJ."""
    plan = df._jdf.queryExecution().sparkPlan()
    out: list[tuple[str, bool]] = []
    for node in _walk(plan):
        if node.getClass().getSimpleName() != "BroadcastNestedLoopJoinExec":
            continue
        side = node.buildSide().toString()
        child_idx = 1 if side == "BuildRight" else 0
        build = node.children().apply(child_idx)
        out.append((side, _has_global_agg(build)))
    return out


def bnlj_all_scalar(df: DataFrame) -> bool:
    """True iff the tree-walk FOUND at least one BNLJ and every one of
    them broadcasts a 1-row global aggregate (see :func:`bnlj_report`).

    Deliberately NOT vacuously true: the caller (tools/plan_audit.py)
    invokes this only after the explain string showed a BNLJ — if the
    py4j walk then can't reach it (e.g. it hides inside a scalar-subquery
    plan children() doesn't traverse), returning True would exempt an
    unverified join. An unreachable BNLJ stays flagged."""
    rep = bnlj_report(df)
    return bool(rep) and all(ok for _side, ok in rep)
