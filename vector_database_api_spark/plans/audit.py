"""Physical-plan audit helpers.

The reference has no optimizer (SURVEY §4); our engine's performance
posture comes from Catalyst producing the *right* physical plan.  These
helpers make the plan checkable in tests and tooling, so regressions like
"the dimension stopped broadcasting" or "top-k became a global sort" fail
loudly instead of silently costing a shuffle at 100 TB:

- ``TakeOrderedAndProject``: distributed partial top-k (per-partition heap
  + driver merge) — what every ``ORDER BY ... LIMIT k`` query must plan to.
- ``BroadcastHashJoin``: small side shipped to every task — what every
  dim-to-fact and query-vector join must plan to (no shuffle of the big
  side).
- ``PushedFilters``: predicates reaching the parquet scan.
- ``WholeStageCodegen`` spans: expressions compiled to JVM bytecode.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def audit_plan(df: DataFrame) -> dict[str, bool | int]:
    """Summarize scale-critical physical plan features."""
    plan = explain_str(df)
    return {
        "take_ordered_topk": "TakeOrderedAndProject" in plan,
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "shuffles": plan.count("Exchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "codegen_stages": plan.count("WholeStageCodegen"),
        "row_python_udfs": plan.count("BatchEvalPython"),
        "python_udfs": len(
            set(re.findall(r"\((\d+)\) (?:Batch|Arrow)EvalPython", plan))
            # simple-mode plans have no numbered nodes; fall back to raw count
            or re.findall(r"(?:Batch|Arrow)EvalPython \[", plan)
        ),
        "python_udf_names": set(
            re.findall(
                r"(?:Batch|Arrow)EvalPython(?: \[| \(\d+\)\n(?:.*\n)*?"
                r"Arguments: \[)(\w+)\(",
                plan,
            )
        ),
        "window_partition_keys": window_partition_keys(plan),
        # Arrow grouped-map seams (applyInPandas / cogroup / mapInPandas /
        # applyInPandasWithState): batch-level Python, allowed by design
        # (one NumPy/BLAS call per group or batch) but must stay VISIBLE
        # in the audit — these nodes carry no EvalPython marker.
        "pandas_grouped_nodes": {
            kind: plan.count(f"{kind} (") + plan.count(f"{kind} [")
            for kind in (
                "FlatMapGroupsInPandas",
                "FlatMapCoGroupsInPandas",
                "MapInPandas",
                "FlatMapGroupsInPandasWithState",
            )
            if kind in plan
        },
    }


def window_partition_keys(plan: str) -> set[str]:
    """Base column names every Window node in ``plan`` partitions by.

    Why this is audited: a window partition is processed by a SINGLE
    task and AQE never skew-splits windows (it splits skewed joins and
    aggregations only), so ``Window.partitionBy`` over an
    unbounded-cardinality content key (a text fingerprint, a span, a
    chunk body) serializes the hottest key's whole row set onto one
    executor at scale.  Bounded keys (a query id, a user id, a dim
    attribute) are fine — per-key row counts don't grow with corpus
    size.  tools/plan_report.py keeps the allowlist of bounded keys;
    anything else appearing here is a regression (round-4 verdict: the
    span doc-frequency window).  An empty partition spec (a GLOBAL
    window — one task for the whole input) is reported as ``<global>``."""
    keys: set[str] = set()
    for m in re.finditer(
        r"\(\d+\) Window\n(?:.*\n)*?Arguments: \[.*?\](.*)", plan
    ):
        # Arguments prints [exprs] then only the NON-EMPTY specs:
        # [exprs], [part], [order] / [exprs], [part] (no order) /
        # [exprs], [order] (GLOBAL window).  A partition list never
        # carries sort direction, so ASC/DESC identifies an order spec.
        rest = m.group(1)
        lists = re.findall(r"\[(.*?)\]", rest)
        part = None
        if lists:
            first = lists[0]
            if not re.search(r"\b(?:ASC|DESC)\b", first):
                part = first
        if part is None:
            keys.add("<global>")
            continue
        for tok in part.split(","):
            name = tok.strip().split("#")[0]
            if name:
                keys.add(name)
    return keys
