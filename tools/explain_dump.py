"""Dump .explain("formatted") for headline queries to plans/<round>/.

Usage::

    python tools/explain_dump.py <suffix> [query ...]

Writes ``plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt`` (suffix =
before/after; round defaults to r11) for the named queries, or every
bench HEADLINE query when none are named.  Plans are dumped at build
time against $SPARK_GRAFT_SF_DIR — the same posture as
tools/plan_report.py — so the files reflect what the driver's bench run
would execute (modulo AQE runtime re-planning, which explain() cannot
show pre-execution).  Note that "build time" is not job-free: serving-
artifact builders and the eager localCheckpoints some queries take
(winnow_passage_lookup's per-invocation passage pin, every _artifact
materialization) RUN Spark jobs while the plan is being constructed;
only the dumped query itself is left unexecuted.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from vector_database_api_spark import queries as q
from vector_database_api_spark.plans.audit import explain_str
from vector_database_api_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-dump")
    registry = {**q.spark_queries(), **q.demo_queries()}
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = explain_str(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
