"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf directory, then compares row count, column names,
and order-insensitive values.  Usage::

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from vector_database_api_spark.plans.audit import capture_hint_errors
from vector_database_api_spark.session import get_spark
from vector_database_api_spark.sources.tables import DRIVER_TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # make list/array cells hashable + comparable
        if df[c].map(lambda v: isinstance(v, (list, tuple))).any() or str(
            df[c].dtype
        ).startswith("object"):
            df[c] = df[c].map(
                lambda v: tuple(v.tolist())
                if hasattr(v, "tolist")
                else (tuple(v) if isinstance(v, (list, tuple)) else v)
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # bit-exactness is the goal; report drift loudly
    return a == b


def dtype_kind(dtype) -> str:
    """Canonical dtype family for parity checks: integer widths are
    interchangeable (repr is identical) but int-vs-float is NOT — DuckDB
    HUGEINT sums materialize as float64 in pandas and the driver's
    value-hash distinguishes ``500`` from ``500.0`` (round-2 failure
    class).  'u' folds into 'i'."""
    k = dtype.kind
    return "i" if k == "u" else k


def dtype_problems(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    out = []
    for c in spark_df.columns:
        sk, dk = dtype_kind(spark_df[c].dtype), dtype_kind(duck_df[c].dtype)
        if sk != dk:
            out.append(
                f"dtype mismatch col {c}: spark={spark_df[c].dtype} "
                f"duck={duck_df[c].dtype} (driver hash distinguishes these)"
            )
    return out


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
        )
        return problems
    problems.extend(dtype_problems(spark_df, duck_df))
    if len(spark_df) != len(duck_df):
        problems.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    s, d = normalize(spark_df), normalize(duck_df)
    n_bad = 0
    for i in range(len(s)):
        for c in s.columns:
            if not values_equal(s.iloc[i][c], d.iloc[i][c]):
                n_bad += 1
                if n_bad <= 3:
                    problems.append(
                        f"value mismatch row {i} col {c}: spark={s.iloc[i][c]!r} duck={d.iloc[i][c]!r}"
                    )
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatching cells total")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # hint gate (plans/audit.py): a silently dropped join hint
            # during build or execution planning is a hard failure here
            # too, so the 15 registry queries outside the bench HEADLINE
            # get the same coverage as tools/plan_report.py
            with capture_hint_errors(spark) as hint_errors:
                sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if hint_errors:
            failures.append(name)
            print(f"FAIL {name}: dropped join hint: {hint_errors}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures.append(name)
            print(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"   {p}")
        else:
            print(f"OK   {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
