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
