"""Dump .explain("formatted") for headline queries to plans/r10/.

Usage::

    python tools/explain_dump.py <suffix> [query ...]

Writes ``plans/r10/<query>_<suffix>.txt`` (suffix = before/after) for the
named queries, or every bench HEADLINE query when none are named.  Plans
are built (not executed) against $SPARK_GRAFT_SF_DIR — the same
plan-build-only posture as tools/plan_report.py, so the files reflect
exactly what the driver's bench run would execute (modulo AQE runtime
re-planning, which explain() cannot show pre-execution).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

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
        "r10",
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
