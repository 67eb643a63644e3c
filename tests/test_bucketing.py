"""Bucketed co-located joins — the zero-shuffle join layout for 100 TB.

At scale, the fact-fact joins (orders x lineitem on orderkey, chunks x
index on id) dominate shuffle volume.  Writing both sides bucketed by
the join key (`DataFrameWriter.bucketBy` + `saveAsTable`) pre-partitions
the data ON DISK so the sort-merge join reads co-located buckets and the
Exchange disappears from the plan entirely — the join cost becomes a
local merge per bucket, reusable across every downstream query of the
same key.  This is the storage-layout twin of the Z-order demo
(`zorder_addresses`): Z-order prunes scans, bucketing deletes shuffles.

These tests pin the contract mechanically: the same join goes from
2 Exchanges (plain parquet) to 0 (bucketed tables), with identical
results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_api_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    """orders + lineitem written as bucketed managed tables (8 buckets
    on the join key), dropped after the module."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    for name in ("bkt_orders", "bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("bkt_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("bkt_lineitem")
    )
    yield orders, lineitem
    for name in ("bkt_orders", "bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange"
    )


def test_bucketed_join_eliminates_exchanges(spark, bucketed):
    """The bucketed sort-merge join plans ZERO Exchanges; the identical
    plain-parquet join needs one per side."""
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "false",
    }
    old = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        orders, lineitem = bucketed
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        bkt = spark.table("bkt_orders").join(
            spark.table("bkt_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert _exchanges(plain) >= 2
        assert _exchanges(bkt) == 0
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_bucketed_join_results_match_plain(spark, bucketed):
    """Layout changes plans, never answers: the bucketed join's rollup
    equals the plain join's."""
    orders, lineitem = bucketed
    plain = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
        .collect()[0]
    )
    bkt = (
        spark.table("bkt_orders")
        .join(
            spark.table("bkt_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
        .collect()[0]
    )
    assert plain["n"] == bkt["n"]
    assert plain["rev"] == bkt["rev"]


def test_bucketed_aggregation_also_shuffle_free(spark, bucketed):
    """A groupBy on the bucket key reuses the bucketing too — the
    build-once/aggregate-many layout for per-order rollups."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        agg = spark.table("bkt_lineitem").groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("qty")
        )
        assert _exchanges(agg) == 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
