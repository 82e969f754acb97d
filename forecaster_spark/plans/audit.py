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


def _walk(jplan):
    """Depth-first nodes of a JVM SparkPlan tree (py4j traversal)."""
    yield jplan
    children = jplan.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def _has_global_agg(jplan) -> bool:
    """True iff the subtree contains an aggregate with NO grouping keys —
    a global aggregate, whose output is exactly one row regardless of
    input cardinality (the only broadcast that stays constant-size at
    any scale)."""
    for node in _walk(jplan):
        if node.getClass().getSimpleName() in _AGG_EXECS and node.groupingExpressions().isEmpty():
            return True
    return False


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
    """True iff the plan has no BNLJ, or every BNLJ broadcasts a 1-row
    global aggregate (see :func:`bnlj_report`)."""
    return all(ok for _side, ok in bnlj_report(df))
