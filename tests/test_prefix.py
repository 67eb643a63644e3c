"""Two-phase prefix scans (operators/prefix.py) vs the plain window —
row-for-row equality under forced block seams.

The operators exist so enumerable-dim windows (per-key input N/|dim|,
the r9 verdict's weak class) can be computed without clustering one
key's corpus share onto one task.  Equality must hold for ANY block
layout, so every test pins ``partitions`` small enough that each key
spans multiple range blocks (seams exercised) and also runs the
degenerate single-block case.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_database_api_spark.operators.prefix import (
    ntile_from_rank,
    partitioned_order_stats,
    partitioned_running_sum,
)


def _events(spark, n=500, n_keys=3, seed=11):
    rng = np.random.default_rng(seed)
    rows = [
        (
            f"src{int(rng.integers(n_keys))}",
            int(i),
            int(rng.integers(1, 400)),
            float(rng.normal()),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "key string, seq int, tokens int, val double"
    )


@pytest.mark.parametrize("partitions", [1, 4, 13])
def test_running_sum_matches_window(spark, partitions):
    df = _events(spark)
    w = (
        Window.partitionBy("key")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("run", F.sum("tokens").over(w))
    got = partitioned_running_sum(
        df, "key", [F.asc("seq")], "tokens", out_col="run",
        partitions=partitions,
    )
    assert sorted(got.columns) == sorted(want.columns)
    w_rows = sorted(map(tuple, want.collect()))
    g_rows = sorted(map(tuple, got.collect()))
    assert g_rows == w_rows


@pytest.mark.parametrize("partitions", [1, 4, 13])
def test_order_stats_match_window_functions(spark, partitions):
    """_rn/_n/_prev/_next reproduce row_number, count, lag, lead under
    a DESC+tiebreak total order — and the derived rank functions
    (the ranking_window_profile formulas) match Spark's own window
    implementations bit-for-bit."""
    df = _events(spark)
    stats = partitioned_order_stats(
        df,
        "key",
        [F.desc("val"), F.asc("seq")],
        "val",
        partitions=partitions,
    )
    rn, n = F.col("_rn"), F.col("_n")
    got = stats.select(
        "key",
        "seq",
        rn.cast("int").alias("rn"),
        rn.cast("int").alias("drank"),
        ntile_from_rank(rn, n, 4).alias("q4"),
        ntile_from_rank(rn, n, 7).alias("q7"),
        F.when(n == 1, F.lit(0.0)).otherwise((rn - 1) / (n - 1)).alias("pr"),
        (rn / n).alias("cd"),
        F.col("_prev").alias("prev"),
        F.col("_next").alias("next"),
    )
    w = Window.partitionBy("key").orderBy(F.desc("val"), F.asc("seq"))
    want = df.select(
        "key",
        "seq",
        F.row_number().over(w).alias("rn"),
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("q4"),
        F.ntile(7).over(w).alias("q7"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.lag("val", 1).over(w).alias("prev"),
        F.lead("val", 1).over(w).alias("next"),
    )
    g_rows = sorted(map(tuple, got.collect()))
    w_rows = sorted(map(tuple, want.collect()))
    assert g_rows == w_rows


def test_order_stats_tiny_groups(spark):
    """ntile/percent_rank edges: groups smaller than the tile count
    (ntile buckets of size 1) and singleton groups (percent_rank 0,
    NULL lag/lead both sides)."""
    rows = [("a", 1, 5.0), ("a", 2, 3.0), ("a", 3, 3.5), ("b", 9, 1.0)]
    df = spark.createDataFrame(rows, "key string, seq int, val double")
    stats = partitioned_order_stats(
        df, "key", [F.desc("val"), F.asc("seq")], "val", partitions=3
    )
    rn, n = F.col("_rn"), F.col("_n")
    got = {
        (r["key"], r["seq"]): r
        for r in stats.select(
            "key",
            "seq",
            rn.alias("rn"),
            n.alias("n"),
            ntile_from_rank(rn, n, 4).alias("q4"),
            F.when(n == 1, F.lit(0.0))
            .otherwise((rn - 1) / (n - 1))
            .alias("pr"),
            "_prev",
            "_next",
        ).collect()
    }
    assert (got[("a", 1)]["rn"], got[("a", 1)]["q4"]) == (1, 1)
    assert (got[("a", 3)]["rn"], got[("a", 3)]["q4"]) == (2, 2)
    assert (got[("a", 2)]["rn"], got[("a", 2)]["q4"]) == (3, 3)
    assert got[("a", 2)]["_next"] is None
    assert got[("a", 1)]["_prev"] is None
    assert got[("a", 3)]["_prev"] == 5.0
    b = got[("b", 9)]
    assert (b["rn"], b["n"], b["q4"], b["pr"]) == (1, 1, 1, 0.0)
    assert b["_prev"] is None and b["_next"] is None


def test_running_sum_never_windows_on_bare_key_over_data(spark):
    """Plan shape: the corpus-sized scan windows on (_pid, key); the
    only bare-`key` window input is the per-block totals frame.  The
    audit must therefore see both keys — and the lineage must
    range-partition before the local window (the range exchange sits
    inside the persisted block frame, so it shows in the full
    plan-with-cached-data string, not the top-level executed plan)."""
    from vector_database_api_spark.plans.audit import audit_plan

    df = _events(spark)
    out = partitioned_running_sum(
        df, "key", [F.asc("seq")], "tokens", partitions=8
    )
    a = audit_plan(out)
    assert a["window_partition_keys"] == {"_pid", "key"}
    qe = out._jdf.queryExecution()
    full = qe.executedPlan().toString() + qe.optimizedPlan().toString()
    assert "inmemory" in full.lower()  # the pinned block frame
    from vector_database_api_spark.operators.prefix import _range_blocks

    blocks = _range_blocks(df, "key", [F.asc("seq")], 8)
    bplan = blocks._jdf.queryExecution().analyzed().toString()
    assert "repartitionbyexpression" in bplan.lower().replace(" ", "") or (
        "rangepartitioning" in bplan.lower()
    )


def test_running_sum_block_offsets_consistent_at_scale(spark):
    """Regression pin for the r10 bring-up bug: an UNPERSISTED range
    exchange is instantiated once per reference with freshly sampled
    boundaries (seeded by the instantiated RDD), so the offsets branch
    and the local-rank branch silently disagreed on block membership —
    32/32 blocks differed at 50k rows, +4511 drift in the running sums
    (tiny uniform data never exposed it: all samples land on identical
    boundaries).  _range_blocks persists the stamped frame to pin one
    boundary draw; this test replays the exposing shape: 50k rows,
    90% of them in one hot key."""
    n = 50_000
    df = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
            .alias("key"),
            F.col("id").alias("seq"),
            ((F.col("id") % 400) + 1).alias("tokens"),
        )
        .repartition(16)
    )
    got = partitioned_running_sum(
        df, "key", [F.asc("seq")], "tokens", out_col="run", partitions=16
    )
    w = (
        Window.partitionBy("key")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("run", F.sum("tokens").over(w))

    def _chk(frame):
        r = frame.agg(
            F.sum(F.col("run") * (F.col("seq") % 9973)).alias("chk"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return (r["chk"], r["n"])

    assert _chk(got) == _chk(want)
