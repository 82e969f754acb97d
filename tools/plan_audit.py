"""Physical-plan audit across the driver contract: the 100-TB lens, automated.

For every ``queries()`` entry this builds the DataFrame (analysis only — no
execution for lazy queries) and inspects the formatted physical plan for the
shapes that decide whether a plan survives a 1000-executor scale-up:

- hard flags (always wrong at scale): ``CartesianProduct``,
  ``BroadcastNestedLoopJoin`` — an all-pairs or unbounded-broadcast join
  snuck in.
- counted (reviewed, not flagged): ``Exchange`` (shuffles — each must be on
  a keyed, skew-safe column), ``SortAggregate`` (usually means a struct
  min/max defeated hash aggregation — see rollup.py's min_by fast path),
  ``ArrowEvalPython`` / ``FlatMapGroupsInPandas`` / ``MapInPandas``
  (vectorized Python — fine, but every one should be a measured-win kernel),
  ``WholeStageCodegen`` spans (wider is better; NOTE under AQE the
  pre-execution plan often hides codegen markers inside AdaptiveSparkPlan,
  so this column UNDERREPORTS for multi-stage plans — 0 there means
  "not visible yet", not "interpreted").

Queries that EXECUTE on construction (the streaming stream≡batch proofs and
checkpoint_resume, which drive real jobs inside the query function) are run
at the smoke SF so the audit stays cheap; pass a bigger sf_dir to audit those
too, or filter them out with a name substring.

Usage: python tools/plan_audit.py [sf_dir] [name_substring ...]
Exit status 1 if any hard flag fires.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from forecaster_spark.plans.audit import bnlj_all_scalar  # noqa: E402
from forecaster_spark.session import get_spark  # noqa: E402

HARD = ("CartesianProduct", "BroadcastNestedLoopJoin")

# r5: the BNLJ exemption is STRUCTURAL — plans/audit.py walks each BNLJ's
# broadcast subtree and accepts it only if it is a 1-row GLOBAL aggregate
# (constant-size broadcast at any corpus scale). A refactor that turns a
# scalar broadcast into a table broadcast now hard-flags automatically,
# whatever the query is called. Name-keyed entries remain ONLY for joins
# whose non-scalar shape IS the operator's documented semantics:
BNLJ_SEMANTIC_OK = {
    "cosine_topk_brute_embeddings": "brute-force baseline — broadcast cross join IS the operator (labeled non-scale path; LSH/IVF are the scale paths)",
    "dtw_pairs_events_1h": "pair generation over the per-SOURCE array table (one row per series, series-count-bounded like spearman/pearson pair queries) — the a.source < b.source inequality join is the operator's documented semantics; the DP runs downstream in the kernel",
}
COUNTED = (
    ("exch", r"\bExchange\b"),
    ("sortagg", r"\bSortAggregate\b"),
    ("objagg", r"\bObjectHashAggregate\b"),
    ("arrow", r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|FlatMapGroupsInPandasWithState"),
)


def plan_string(df, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filters = sys.argv[2:]
    spark = get_spark("plan_audit", cpus=8)
    qs = entrymod.queries()
    if name_filters:
        qs = {n: f for n, f in qs.items() if any(s in n for s in name_filters)}
    failures: list[str] = []
    print(f"{'query':42s} {'exch':>4s} {'sortagg':>7s} {'objagg':>6s} {'arrow':>5s} {'codegen':>7s}  flags")
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            plan = plan_string(df)
            # codegen span count comes from simple mode's *(n) markers —
            # formatted mode doesn't annotate codegen
            spans = len(set(re.findall(r"\*\((\d+)\)", plan_string(df, "simple"))))
        except Exception as e:  # noqa: BLE001 — report, keep auditing
            failures.append(f"{name}: build error {type(e).__name__}: {e}")
            print(f"{name:42s}  BUILD ERROR: {type(e).__name__}")
            continue
        counts = {k: len(re.findall(p, plan)) for k, p in COUNTED}
        counts["codegen"] = spans
        hard = [h for h in HARD if h in plan]
        if hard == ["BroadcastNestedLoopJoin"]:
            if name in BNLJ_SEMANTIC_OK:
                hard = []  # documented-semantics join (see whitelist comment)
            elif bnlj_all_scalar(df):
                hard = []  # every BNLJ broadcasts a 1-row global aggregate
        if hard:
            failures.append(f"{name}: {hard}")
        print(
            f"{name:42s} {counts['exch']:4d} {counts['sortagg']:7d} "
            f"{counts['objagg']:6d} {counts['arrow']:5d} {counts['codegen']:7d}  "
            f"{','.join(hard) if hard else ''}"
        )
    spark.stop()
    if failures:
        print("\nHARD FLAGS / ERRORS:")
        for f in failures:
            print(" ", f)
        return 1
    print(
        f"\n{len(qs)} plans audited; no CartesianProduct anywhere, every "
        "BroadcastNestedLoopJoin structurally verified to broadcast a 1-row "
        "global aggregate (or documented-semantics whitelisted)."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
