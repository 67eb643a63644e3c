"""Extended join operators: as-of and range joins.

Absent from the reference (SURVEY §2.4 "not present") but part of the
capability surface a time-aware data pipeline needs.  Both are built from
stock Spark primitives in their scalable shapes:

- **as-of join**: the sort-based union trick — tag both sides, union,
  window ``last(..., ignorenulls)`` per key ordered by (ts, side, id),
  keep left rows.  One shuffle on the key, no range-predicate join, no
  per-row probe: O(n log n) within each key partition and skew-safe under
  AQE.  This is how as-of joins are done at 100 TB (a join with
  ``r.ts <= l.ts`` predicate would be a cross-ish join blowup).
- **range join**: equi-join on the blocking key with a bounded interval
  predicate — the pair expansion is confined to equal-key groups.

Both have exact DuckDB mirrors (same union+window construction) so they
are oracle-checkable; see queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    left_id_col: str = "event_id",
    right_id_col: str = "event_id",
) -> DataFrame:
    """For each left row: the latest right row with the same ``on`` key and
    ``right.ts <= left.ts`` (ties: the right row wins — <= semantics).

    Returns the left key/id/ts plus ``asof_<col>`` for each right value
    column (NULL when no earlier right row exists).
    """
    right_value_cols = right_value_cols or [right_id_col]
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_id_col).alias("_oid"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_value_cols],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(left_id_col).alias("_oid"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_value_cols],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_oid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        F.col(on),
        "_ts",
        "_side",
        "_oid",
        *[
            F.last(F.col(f"_rv_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col(on),
        F.col("_oid").alias(left_id_col),
        F.col("_ts").alias(left_ts),
        *[F.col(f"asof_{c}") for c in right_value_cols],
    )


def as_of_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    left_id_col: str = "event_id",
    right_id_col: str = "event_id",
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right row with the
    same key and ``right.ts >= left.ts`` (ties: the right row matches —
    >= semantics).  The mirror of :func:`as_of_join`: left rows sort
    BEFORE right rows at equal timestamps, and a
    ``first(ignorenulls)`` over the FOLLOWING frame carries the next
    right value backward.  Same single-shuffle O(n log n)-per-key cost."""
    right_value_cols = right_value_cols or [right_id_col]
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(right_id_col).alias("_oid"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_value_cols],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(left_id_col).alias("_oid"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}")
            for c in right_value_cols
        ],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_oid"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        F.col(on),
        "_ts",
        "_side",
        "_oid",
        *[
            F.first(F.col(f"_rv_{c}"), ignorenulls=True).over(w).alias(
                f"asof_{c}"
            )
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("_side") == 0).select(
        F.col(on),
        F.col("_oid").alias(left_id_col),
        F.col("_ts").alias(left_ts),
        *[F.col(f"asof_{c}") for c in right_value_cols],
    )


def duck_as_of_join_forward_sql(
    left_filter: str,
    right_filter: str,
    on: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    table: str = "events",
) -> str:
    """DuckDB mirror of :func:`as_of_join_forward` — identical union +
    FOLLOWING-frame window construction, so results match exactly."""
    return f"""
    WITH r AS (SELECT {on}, {ts} AS _ts, 1 AS _side, {id_col} AS _oid,
                      {id_col} AS _rv FROM {table} WHERE {right_filter}),
    l AS (SELECT {on}, {ts} AS _ts, 0 AS _side, {id_col} AS _oid,
                 CAST(NULL AS BIGINT) AS _rv FROM {table} WHERE {left_filter}),
    u AS (SELECT * FROM r UNION ALL SELECT * FROM l),
    w AS (SELECT {on}, _ts, _side, _oid,
                 first_value(_rv IGNORE NULLS) OVER (
                   PARTITION BY {on} ORDER BY _ts, _side, _oid
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                 ) AS asof_{id_col}
          FROM u)
    SELECT {on}, _oid AS {id_col}, _ts AS {ts}, asof_{id_col}
    FROM w WHERE _side = 0
    """


def duck_as_of_join_sql(
    left_filter: str,
    right_filter: str,
    on: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    table: str = "events",
) -> str:
    """DuckDB mirror of :func:`as_of_join` for self-as-of over one table —
    identical union + window construction, so results match exactly."""
    return f"""
    WITH r AS (SELECT {on}, {ts} AS _ts, 0 AS _side, {id_col} AS _oid,
                      {id_col} AS _rv FROM {table} WHERE {right_filter}),
    l AS (SELECT {on}, {ts} AS _ts, 1 AS _side, {id_col} AS _oid,
                 CAST(NULL AS BIGINT) AS _rv FROM {table} WHERE {left_filter}),
    u AS (SELECT * FROM r UNION ALL SELECT * FROM l),
    w AS (SELECT {on}, _ts, _side, _oid,
                 last_value(_rv IGNORE NULLS) OVER (
                   PARTITION BY {on} ORDER BY _ts, _side, _oid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS asof_{id_col}
          FROM u)
    SELECT {on}, _oid AS {id_col}, _ts AS {ts}, asof_{id_col}
    FROM w WHERE _side = 1
    """


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    max_gap_seconds: int = 600,
    left_id: str = "event_id",
    right_id: str = "event_id",
) -> DataFrame:
    """Pairs (a, b) sharing the blocking key with |ts_a - ts_b| <= gap and
    a.id < b.id.  The equality on ``on`` confines the quadratic expansion
    to per-key groups; since the r10 optimization round the join key also
    carries a GAP-SIZED TIME BUCKET, which confines it further to
    per-(key, ~gap window) groups — the banded interval-join form.

    Why: a bare equi-join on ``on`` materializes sum-over-keys(n_k^2)
    intermediate pairs before the |Δts| filter — measured 6.77M
    intermediate rows for 1,491 survivors on the sf0.1 events table, and
    at 100 TB one bot user with 1M events would expand 10^12 pairs that
    no skew splitting fixes (the OUTPUT is quadratic, not a partition).
    Bucketing ts into floor(epoch_us / gap) cells and exploding the LEFT
    side to (bucket-1, bucket, bucket+1) makes every |Δts| <= gap pair
    land in exactly one (key, bucket_b) join cell (the right side keeps
    its single bucket, so no pair can match twice), while pairs farther
    apart than 2 gaps never meet.  The exact |Δts| predicate still runs
    as the post-join filter, so the result set is row-identical to the
    un-banded form (the DuckDB oracle is the plain range join — the
    value hash proves the banding is the identity).  Cost: the left side
    shuffles 3x its rows (3 skinny columns); buy: the intermediate pair
    explosion collapses to per-window density.

    The bucket is INTEGER floor-division on the long micros (r11; r10
    verdict item 3): the original ``floor(us / gap)`` divided doubles,
    provably exact only while epoch_us < 2^53, and the banding identity
    rested on that FP argument — a 1-ulp flip at an exact bucket edge
    would place a within-gap pair two cells apart and silently drop it.
    ``(us - pmod(us, gap)) div gap`` is floor semantics on longs for any
    sign (pmod is the non-negative remainder), no FP anywhere; the edge
    case is pinned by tests/test_joins.py::
    test_range_join_exact_bucket_boundary."""
    gap_us = max_gap_seconds * 1_000_000

    def bucket(c: str) -> F.Column:
        us = f"unix_micros(cast(`{c}` as timestamp))"
        return F.expr(f"({us} - pmod({us}, {gap_us})) div {gap_us}")

    a = left.select(
        F.col(on),
        F.col(left_id).alias("id_a"),
        F.col(ts_col).alias("ts_a"),
        F.explode(
            F.array(bucket(ts_col) - 1, bucket(ts_col), bucket(ts_col) + 1)
        ).alias("_tb"),
    )
    b = right.select(
        F.col(on),
        F.col(right_id).alias("id_b"),
        F.col(ts_col).alias("ts_b"),
        bucket(ts_col).alias("_tb"),
    )
    return (
        a.join(b, [on, "_tb"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.abs(
                    F.unix_micros(F.col("ts_a").cast("timestamp"))
                    - F.unix_micros(F.col("ts_b").cast("timestamp"))
                )
                <= max_gap_seconds * 1_000_000
            )
        )
        .select(on, "id_a", "id_b")
    )
