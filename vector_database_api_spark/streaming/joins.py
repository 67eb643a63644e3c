"""Stream-stream joins (extended streaming surface).

The reference has no streaming at all (SURVEY §2.9 — its "streaming" is
synchronous index maintenance); this module extends the engine to the
stream-stream join shape a live event pipeline needs: correlate two event
streams on a key within a bounded time gap.

Scale posture: both sides are watermarked and the join condition carries
explicit event-time range bounds in BOTH directions, so Spark's state
store evicts buffered rows once they age past watermark + gap — state
stays O(key-rate x window), never unbounded.  The batch twin
(`operators.joins.range_join`) states the identical predicate, and the
equivalence test drains this join with availableNow and asserts equality
against the batch result on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    max_gap_seconds: int = 600,
    watermark: str = "30 minutes",
    left_id: str = "event_id",
    right_id: str = "event_id",
) -> DataFrame:
    """Pairs (a, b) sharing ``on`` with |ts_a - ts_b| <= gap and
    id_a < id_b — the streaming twin of ``range_join``.

    The two inequality bounds (not ``abs()``) are what lets the streaming
    planner derive state-cleanup predicates for both sides.
    """
    a = left.withWatermark(ts_col, watermark).select(
        F.col(on).alias("key_a"),
        F.col(left_id).alias("id_a"),
        F.col(ts_col).alias("ts_a"),
    )
    b = right.withWatermark(ts_col, watermark).select(
        F.col(on).alias("key_b"),
        F.col(right_id).alias("id_b"),
        F.col(ts_col).alias("ts_b"),
    )
    gap = f"INTERVAL {max_gap_seconds} SECONDS"
    joined = a.join(
        b,
        (F.col("key_a") == F.col("key_b"))
        & (F.col("id_a") < F.col("id_b"))
        & (F.col("ts_b") >= F.expr(f"ts_a - {gap}"))
        & (F.col("ts_b") <= F.expr(f"ts_a + {gap}")),
    )
    return joined.select(F.col("key_a").alias(on), "id_a", "id_b")
