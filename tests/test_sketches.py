"""Sketch aggregates: HLL distinct estimates and exact bitmap distinct.

The 100 TB rationale: COUNT(DISTINCT) over raw ids shuffles every id;
bitmap/HLL aggregates shuffle a fixed-size mergeable state per group.
These tests pin (a) estimate accuracy, (b) sketch mergeability (union of
per-day sketches == sketch of the union — what makes pre-aggregation
valid), (c) bitmap exactness against count_distinct.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vector_database_api_spark import queries as q
from vector_database_api_spark.sources.tables import load_table


def test_hll_daily_estimates_close_to_exact(spark, sf_dir):
    rows = q.hll_distinct_users_daily(spark, sf_dir).collect()
    assert rows, "expected at least one day"
    events = load_table(spark, sf_dir, "events")
    exact = {
        r.day: r.d
        for r in events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    for r in rows:
        # DataSketches HLL at default lgConfigK=12: ~1.6% relative std err.
        assert r.est_users == pytest.approx(exact[r.day], rel=0.05), r


def test_hll_union_of_daily_equals_whole(spark, sf_dir):
    """Merging per-day sketches must equal sketching the whole column —
    the invariant that makes stored daily sketches re-aggregable."""
    events = load_table(spark, sf_dir, "events")
    merged = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    whole = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    assert merged == whole


def test_bitmap_distinct_is_exact(spark, sf_dir):
    got = {
        r.event_type: r.distinct_users
        for r in q.bitmap_distinct_users(spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.d
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert got == exact


def test_theta_set_ops_match_exact_at_small_cardinality(spark, sf_dir):
    """Theta sketches are exact below their nominal-entries threshold:
    union/intersection/difference estimates must equal true set-op sizes
    on the sf test data."""
    row = q.theta_sketch_set_ops(spark, sf_dir).collect()[0]
    events = load_table(spark, sf_dir, "events")
    click = {
        r.user_id
        for r in events.filter(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
        .collect()
    }
    purchase = {
        r.user_id
        for r in events.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .collect()
    }
    assert round(row.est_union) == len(click | purchase)
    assert round(row.est_intersection) == len(click & purchase)
    assert round(row.est_click_only) == len(click - purchase)
