"""Two-phase distributed order statistics over enumerable-dim keys.

A window partitioned by a DIM key (``source``, ``c_mktsegment``, a
nation, a language) clusters each key's ENTIRE corpus share onto one
task: per-key input is N/|dim| — linear in corpus size, and *worse*
than a per-query key because the partitions are fewer and bigger (5
segments => 5 tasks each sorting 20% of the table).  AQE never
skew-splits window partitions, so the plain window form is a scale
ceiling no cluster size fixes (the r9 verdict's enumerable-dim weak
class).

The classic fix is the two-phase distributed prefix scan:

1. ``repartitionByRange(P, key, *order)`` lays the rows out in the
   window's total order across P partitions and
   ``spark_partition_id()`` captures each row's range slot ``_pid``.
2. Partition-LOCAL window aggregates over ``(_pid, key)``: every
   window partition is now one range slot's share of one key — ~N/P
   rows by the partitioner's sizing, regardless of |dim|, and P is the
   knob that scales with the data (spark.sql.shuffle.partitions).
3. One tiny row per ``(_pid, key)`` block (a combinable groupBy) is
   scanned for exclusive per-block offsets — P*|dim| rows of METADATA,
   driver-scale, the only place a window still partitions by the bare
   key — and broadcast back onto the local results.

Results are row-identical to the plain window for any TOTAL order
(pinned by tests/test_prefix.py equality-vs-window tests and by the
unchanged DuckDB oracle hashes of ``sequence_packing_bins`` /
``ranking_window_profile``).  Contract: the order expressions must be
a total order within each key (the usual (sort_col, unique_id) shape)
— with duplicate full sort keys the range partitioner may split a tie
group across slots and local ranks would be boundary-dependent.

No reference analogue (the reference never aggregates,
``app/services/search_service.py`` tops out at per-request top-k);
this is 100 TB posture for the extended analytic surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _range_blocks(
    df: DataFrame,
    part_col: str,
    order_exprs: list[Column],
    partitions: int | None,
) -> DataFrame:
    """Range-partition ``df`` by (``part_col``, *order) and stamp each
    row's range slot as ``_pid``.  ``_pid`` is computed in the map
    stage that reads the range exchange (it must materialize before
    any later shuffle keys on it), so every row's slot reflects the
    global order even though downstream windows re-shuffle by
    ``(_pid, part_col)``.

    The stamped frame is PERSISTED, and that is load-bearing for
    correctness, not a performance tweak: both callers reference it
    twice (the row-level local scan AND the block-totals branch), and
    an unpersisted range exchange is instantiated once PER REFERENCE
    with freshly sampled boundaries (the RangePartitioner sample seed
    derives from the instantiated RDD, and exchange reuse does not
    dedupe the two subtrees) — measured during r10 bring-up: 32/32
    blocks differed between the two references in one plan, silently
    mis-joining offsets onto ranks.  The persisted frame pins ONE
    boundary draw; both branches read the same materialized blocks.
    The cache entry is the narrow projected input (callers project
    first) and is deduped across repeat builds of the same plan by the
    cache manager; eviction is LRU like every staged artifact in this
    engine."""
    p = partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    rep = df.repartitionByRange(p, F.col(part_col), *order_exprs)
    return rep.withColumn("_pid", F.spark_partition_id()).persist()


def partitioned_running_sum(
    df: DataFrame,
    part_col: str,
    order_exprs: list[Column],
    value_col: str,
    out_col: str = "running_sum",
    partitions: int | None = None,
) -> DataFrame:
    """Inclusive running sum of ``value_col`` per ``part_col`` in
    ``order_exprs`` order — identical to
    ``sum(value).over(partitionBy(part).orderBy(*order).rowsBetween(
    unboundedPreceding, currentRow))`` but never clustering one key's
    corpus share onto one task (module docstring).  Output: the input
    columns plus ``out_col``."""
    local_w = (
        Window.partitionBy("_pid", part_col)
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = _range_blocks(df, part_col, order_exprs, partitions).withColumn(
        "_local", F.sum(value_col).over(local_w)
    )
    totals = local.groupBy("_pid", part_col).agg(
        F.sum(value_col).alias("_tot")
    )
    # exclusive cumulative block offsets: the ONLY bare-key window, over
    # the <=P-rows-per-key totals frame (metadata, not corpus rows)
    off_w = (
        Window.partitionBy(part_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "_pid",
        part_col,
        (F.sum("_tot").over(off_w) - F.col("_tot")).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), ["_pid", part_col])
        .withColumn(out_col, F.col("_off") + F.col("_local"))
        .drop("_pid", "_local", "_off")
    )


def partitioned_order_stats(
    df: DataFrame,
    part_col: str,
    order_exprs: list[Column],
    boundary_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Global order statistics per ``part_col`` under the
    ``order_exprs`` total order, two-phase (module docstring).  Adds:

    - ``_rn``    — global ``row_number()`` within the key (bigint);
    - ``_n``     — the key's total row count (bigint);
    - ``_prev`` / ``_next`` — ``boundary_col`` of the adjacent rows in
      the global order (NULL at the key's edges), i.e. ``lag/lead(
      boundary_col, 1)``.

    Because the order is total, every rank function derives from
    (``_rn``, ``_n``) without another pass: rank = dense_rank = _rn
    (all peer groups are singletons), percent_rank = (_rn-1)/(_n-1),
    cume_dist = _rn/_n, and ntile(k) from the first-(n%k)-buckets-
    get-one-extra rule."""
    local_w = Window.partitionBy("_pid", part_col).orderBy(*order_exprs)
    local = (
        _range_blocks(df, part_col, order_exprs, partitions)
        .withColumn("_lrn", F.row_number().over(local_w))
        .withColumn("_lprev", F.lag(boundary_col, 1).over(local_w))
        .withColumn("_lnext", F.lead(boundary_col, 1).over(local_w))
    )
    blocks = local.groupBy("_pid", part_col).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.min_by(boundary_col, "_lrn").alias("_first"),
        F.max_by(boundary_col, "_lrn").alias("_last"),
    )
    # block-level scan (<=P rows per key): exclusive row-count offsets,
    # per-key totals, and the boundary values the edge rows of each
    # block need for lag/lead across block seams
    meta_w = Window.partitionBy(part_col).orderBy("_pid")
    meta = blocks.select(
        "_pid",
        part_col,
        "_cnt",
        (
            F.sum("_cnt").over(
                meta_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("_cnt")
        ).alias("_off"),
        F.sum("_cnt").over(Window.partitionBy(part_col)).alias("_n"),
        F.lag("_last", 1).over(meta_w).alias("_prev_last"),
        F.lead("_first", 1).over(meta_w).alias("_next_first"),
    )
    return (
        local.join(F.broadcast(meta), ["_pid", part_col])
        .withColumn("_rn", F.col("_off") + F.col("_lrn"))
        # the local lag/lead is NULL exactly on a block's edge rows —
        # splice in the neighbouring block's boundary value there (NULL
        # again at the key's true edges, where no neighbour block
        # exists); the _lrn==1/_lrn==_cnt conditions (not coalesce)
        # keep a legitimately-NULL boundary_col from being overwritten
        .withColumn(
            "_prev",
            F.when(F.col("_lrn") == 1, F.col("_prev_last")).otherwise(
                F.col("_lprev")
            ),
        )
        .withColumn(
            "_next",
            F.when(F.col("_lrn") == F.col("_cnt"), F.col("_next_first")).otherwise(
                F.col("_lnext")
            ),
        )
        .drop(
            "_pid",
            "_lrn",
            "_lprev",
            "_lnext",
            "_cnt",
            "_off",
            "_prev_last",
            "_next_first",
        )
    )


def ntile_from_rank(rn: Column, n: Column, tiles: int) -> Column:
    """``ntile(tiles)`` derived from a global row_number ``rn`` and
    partition count ``n``: the first ``n % tiles`` buckets take
    ``floor(n/tiles)+1`` rows, the rest ``floor(n/tiles)`` (the SQL
    standard rule, identical in Spark and DuckDB).  Integer-exact via
    floor on doubles (ranks < 2^53).  Returns int, matching Spark's
    ``ntile`` output type."""
    base = F.floor(n / tiles)
    rem = n % tiles
    big = rem * (base + 1)  # rows covered by the size-(base+1) buckets
    return (
        F.when(rn <= big, F.floor((rn - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((rn - big - 1) / base) + 1)
        .cast("int")
    )
