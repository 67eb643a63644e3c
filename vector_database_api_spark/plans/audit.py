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

import contextlib
import itertools
import re

from pyspark.sql import DataFrame

_HINT_GATE_IDS = itertools.count()


@contextlib.contextmanager
def capture_hint_errors(spark):
    """Capture every ``HintErrorLogger`` warning Spark emits while plans
    are built inside the block; yields the list the messages land in at
    block exit.

    Why this gate exists: a join-strategy hint the planner cannot honor
    is SILENTLY dropped by the DataFrame API — Spark logs one WARN
    through ``org.apache.spark.sql.catalyst.analysis.HintErrorLogger``
    and falls back to whatever strategy it picks on its own.  The r6
    verdict found exactly that class shipped: ``F.broadcast`` on the
    row-preserving LEFT side of a left outer join (an unsupported build
    side), correct-but-lucky at bench scale and a full shuffle of the
    big side at 100 TB.  Reading stderr is not a gate; this is — a
    log4j2 ``WriterAppender`` is attached to the HintErrorLogger logger
    for the duration of the block (tools/plan_report.py wraps every
    bench query's plan build in one and fails on any capture).

    The warnings fire during physical planning, so the block must
    actually materialize ``queryExecution().executedPlan`` — building
    the DataFrame alone is not enough; call :func:`explain_str` (or
    execute the frame) inside the block."""
    jvm = spark._jvm
    writer = jvm.java.io.StringWriter()
    layout = (
        jvm.org.apache.logging.log4j.core.layout.PatternLayout
        .createDefaultLayout()
    )
    appender = (
        jvm.org.apache.logging.log4j.core.appender.WriterAppender
        .createAppender(
            layout, None, writer,
            f"hint-error-gate-{next(_HINT_GATE_IDS)}", False, True,
        )
    )
    appender.start()
    logger = jvm.org.apache.logging.log4j.LogManager.getLogger(
        "org.apache.spark.sql.catalyst.analysis.HintErrorLogger"
    )
    logger.addAppender(appender)
    messages: list[str] = []
    try:
        yield messages
    finally:
        logger.removeAppender(appender)
        appender.stop()
        messages.extend(
            line for line in writer.toString().splitlines() if line.strip()
        )


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
        "window_partition_specs": window_partition_specs(plan),
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
    """Union of :func:`window_partition_specs` — kept for display (the
    PLANS_AUDIT windowkeys column) and for single-window callers.  The
    GATE must use the per-window specs, not this union: the r10 co-key
    rule (a spec containing a bounded entity key is bounded) is only
    sound PER SPEC — on the union, a bounded key from one window would
    mask an unbounded key from a DIFFERENT window in the same plan
    (pinned by tests/test_plans.py)."""
    keys: set[str] = set()
    for spec in window_partition_specs(plan):
        keys.update(spec)
    return keys


def window_partition_specs(plan: str) -> list[tuple[str, ...]]:
    """Per-Window-node partition key names: one sorted tuple per Window
    node in ``plan``.

    Why this is audited: a window partition is processed by a SINGLE
    task and AQE never skew-splits windows (it splits skewed joins and
    aggregations only), so ``Window.partitionBy`` over an
    unbounded-cardinality content key (a text fingerprint, a span, a
    chunk body) serializes the hottest key's whole row set onto one
    executor at scale.  tools/plan_report.py keeps the allowlist of
    bounded keys and the per-spec gate; anything else appearing here is
    a regression (round-4 verdict: the span doc-frequency window).  An
    empty partition spec (a GLOBAL window — one task for the whole
    input) is reported as ``("<global>",)``."""
    specs: list[tuple[str, ...]] = []
    for m in re.finditer(r"\(\d+\) Window\n(?:.*\n)*?Arguments: (.*)", plan):
        # Arguments prints [exprs] then only the NON-EMPTY specs:
        # [exprs], [part], [order] / [exprs], [part] (no order) /
        # [exprs], [order] (GLOBAL window).  Bracket groups are parsed
        # with a DEPTH COUNTER, not a non-greedy regex: window-function
        # expressions legitimately contain literal ']' (array indexing,
        # lambda/HOF expressions) that would truncate a `\[.*?\]` match
        # and shift every downstream group (r5 ADVICE).
        groups = _bracket_groups(m.group(1))
        part = None
        if len(groups) >= 3:
            part = groups[1]
        elif len(groups) == 2:
            # two groups is either [exprs],[part] or [exprs],[order]:
            # an order spec's top-level items ALL end in the canonical
            # "ASC|DESC NULLS FIRST|LAST" tail (a partition expression
            # merely containing the substring ASC/DESC does not)
            items = _split_top_level(groups[1])
            is_order = items and all(
                re.search(r"\b(?:ASC|DESC) NULLS (?:FIRST|LAST)\s*$", it)
                for it in items
            )
            if not is_order:
                part = groups[1]
        if part is None:
            specs.append(("<global>",))
            continue
        names = [
            tok.strip().split("#")[0]
            for tok in _split_top_level(part)
            if tok.strip()
        ]
        # A partition spec of (co-key(s), ``_salt``) is sharded BY
        # CONSTRUCTION (operators/skew.py::grouped_topk): per-task work
        # is group_size/shards regardless of the co-keys' cardinality,
        # which is precisely the mitigation this audit demands of hot
        # keys.  Report the ``_salt`` marker alone (allowlisted in
        # tools/plan_report.py) so the salted phase passes while the
        # same keys WITHOUT the salt still fail.  A BARE {_salt} spec
        # does NOT qualify (r7 ADVICE): with no co-key, each task holds
        # corpus/shards rows — still linear in data — and blessing by
        # column name alone would also bless any query that happens to
        # name a column `_salt`.  Obligation documented at the gate:
        # `shards` must be sized so hottest_group/shards fits one task
        # (grouped_topk's default shards=16 assumes groups up to ~16x a
        # task-sized row budget; hotter data needs a larger shards).
        if "_salt" in names and len(names) >= 2:
            specs.append(("_salt",))
            continue
        if names == ["_salt"]:
            specs.append(("<bare-salt>",))
            continue
        specs.append(tuple(sorted(set(names))))
    return specs


def _bracket_groups(line: str) -> list[str]:
    """Top-level ``[...]`` group contents of ``line``, nested brackets
    kept intact (depth-counted, so literal brackets inside window
    expressions cannot truncate a group)."""
    groups: list[str] = []
    depth = 0
    start = -1
    for i, ch in enumerate(line):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]" and depth > 0:
            depth -= 1
            if depth == 0:
                groups.append(line[start:i])
    return groups


def _split_top_level(s: str) -> list[str]:
    """Split ``s`` on commas not nested inside (), [] or {}."""
    items: list[str] = []
    depth = 0
    buf: list[str] = []
    for ch in s:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        items.append(tail)
    return items
