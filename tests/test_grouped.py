"""applyInPandas grouped-map kernel == JVM regr_* aggregates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_api_spark.operators.grouped import ols_per_group
from vector_database_api_spark.sources.tables import load_table


def test_applyinpandas_ols_matches_sql_regression(spark, sf_dir):
    """The Python grouped-map path must produce the same coefficients as
    the single-pass regr_* SQL aggregates (numpy two-pass vs streaming
    moments agree far beyond the rounding used here)."""
    events = load_table(spark, sf_dir, "events")
    x = (
        F.unix_timestamp("ts")
        - F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
    ).cast("double")
    ev = events.select("event_type", x.alias("x"), "value")

    py = {
        r.event_type: (round(r.slope, 8), round(r.intercept, 4), round(r.r2, 6), r.n)
        for r in ols_per_group(ev).collect()
    }
    sql = {
        r.event_type: (r.slope, r.intercept, r.r2, r.n)
        for r in ev.groupBy("event_type")
        .agg(
            F.round(F.regr_slope("value", "x"), 8).alias("slope"),
            F.round(F.regr_intercept("value", "x"), 4).alias("intercept"),
            F.round(F.regr_r2("value", "x"), 6).alias("r2"),
            F.regr_count("value", "x").alias("n"),
        )
        .collect()
    }
    assert set(py) == set(sql)
    for k in sql:
        assert py[k][3] == sql[k][3]
        for a, b in zip(py[k][:3], sql[k][:3]):
            assert a == pytest.approx(b, abs=2e-4), (k, py[k], sql[k])


def test_ols_degenerate_groups_match_regr_null_semantics(spark):
    """Constant-x groups (sxx=0, e.g. single-row) and constant-y groups
    (syy=0) must mirror the JVM regr_* NULL/1 semantics instead of
    raising ZeroDivisionError."""
    rows = [
        # constant x, varying y -> slope/intercept/r2 NULL
        ("const_x", 1.0, 10.0),
        ("const_x", 1.0, 20.0),
        # single row -> sxx = 0 -> all NULL
        ("single", 5.0, 7.0),
        # constant y, varying x -> slope 0, r2 = 1
        ("const_y", 1.0, 3.0),
        ("const_y", 2.0, 3.0),
    ]
    ev = spark.createDataFrame(rows, "event_type string, x double, value double")

    py = {r.event_type: r for r in ols_per_group(ev).collect()}
    sql = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.regr_slope("value", "x").alias("slope"),
            F.regr_intercept("value", "x").alias("intercept"),
            F.regr_r2("value", "x").alias("r2"),
        )
        .collect()
    }
    for k in py:
        assert (py[k].slope is None) == (sql[k].slope is None), k
        assert (py[k].intercept is None) == (sql[k].intercept is None), k
        assert (py[k].r2 is None) == (sql[k].r2 is None), k
        if py[k].r2 is not None:
            assert py[k].slope == pytest.approx(sql[k].slope)
            assert py[k].r2 == pytest.approx(sql[k].r2)
