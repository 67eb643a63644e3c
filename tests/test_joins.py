"""As-of and range join semantics vs constructed ground truth."""

from __future__ import annotations

import datetime as dt

from vector_database_api_spark.operators import joins as J

SCHEMA = "user_id bigint, event_id bigint, ts timestamp, event_type string"


def _t(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


def _events(spark):
    rows = [
        (1, 100, _t(0), "click"),
        (1, 101, _t(10), "error"),   # asof -> click 100
        (1, 102, _t(20), "click"),
        (1, 103, _t(20), "error"),   # tie: click at same ts counts (<=)
        (1, 104, _t(50), "error"),   # asof -> click 102
        (2, 200, _t(5), "error"),    # no earlier click -> NULL
        (2, 201, _t(6), "click"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_as_of_join_semantics(spark):
    ev = _events(spark)
    out = J.as_of_join(
        ev.filter("event_type = 'error'"),
        ev.filter("event_type = 'click'"),
        on="user_id",
    ).collect()
    got = {r["event_id"]: r["asof_event_id"] for r in out}
    assert got == {101: 100, 103: 102, 104: 102, 200: None}


def test_range_join_within_gap(spark):
    ev = _events(spark)
    out = J.range_join(ev, ev, on="user_id", max_gap_seconds=600).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    # within 10 min, same user, id_a < id_b
    assert got == {(100, 101), (101, 102), (101, 103), (102, 103), (200, 201)}


def test_range_join_exact_bucket_boundary(spark):
    """Pairs exactly ``gap`` apart ON bucket edges must survive the
    banding (r10 verdict item 3: the double-division bucket made this
    an FP argument; the integer ``div`` form makes it exact).  With
    gap = 600 s the bucket edges are epoch multiples of 600 s; place
    events AT edges, gap-apart across edges, 1 us inside and 1 us
    beyond, and check against the brute-force un-banded definition."""
    base = dt.datetime(2024, 1, 1, 10, 0)  # epoch multiple of 600 s

    def us(micro):
        return base + dt.timedelta(microseconds=micro)

    gap_us = 600 * 1_000_000
    rows = [
        # exactly ON an edge, and exactly gap apart spanning 2 edges
        (1, 300, us(0), "e"),
        (1, 301, us(gap_us), "e"),          # |dt| == gap: kept (<=)
        (1, 302, us(2 * gap_us), "e"),      # pairs with 301, not 300
        # 1 us inside / beyond the gap, straddling an edge
        (2, 400, us(gap_us - 1), "e"),
        (2, 401, us(2 * gap_us - 1), "e"),  # 400<->401: exactly gap: kept
        (2, 402, us(2 * gap_us), "e"),      # 400<->402: gap+1 us: dropped
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    out = J.range_join(ev, ev, on="user_id", max_gap_seconds=600).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    # brute-force un-banded ground truth
    want = {
        (a_id, b_id)
        for ua, a_id, a_ts, _ in rows
        for ub, b_id, b_ts, _ in rows
        if ua == ub and a_id < b_id and abs((a_ts - b_ts).total_seconds())
        * 1_000_000 <= gap_us
    }
    assert got == want
    assert (300, 301) in got and (401, 402) in got
    assert (300, 302) not in got and (400, 402) not in got


def test_as_of_join_forward_matches_brute_force(spark):
    """Forward as-of == per-left-row min over right rows with
    right.ts >= left.ts, inclusive ties."""
    import pandas as pd

    from vector_database_api_spark.operators.joins import as_of_join_forward

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 2, 3],
                "ts": pd.to_datetime(
                    ["2024-01-01 10:00", "2024-01-01 12:00",
                     "2024-01-01 09:00", "2024-01-01 09:00"]
                ),
                "event_id": [10, 11, 20, 30],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 2],
                "ts": pd.to_datetime(
                    # 100 ties user1's first left row exactly (inclusive);
                    # user 2's click is BEFORE its error (no match);
                    # user 3 has no right rows at all
                    ["2024-01-01 10:00", "2024-01-01 13:00",
                     "2024-01-01 08:00"]
                ),
                "event_id": [100, 101, 200],
            }
        )
    )
    got = {
        r["event_id"]: r["asof_event_id"]
        for r in as_of_join_forward(left, right, on="user_id").collect()
    }
    assert got == {10: 100, 11: 101, 20: None, 30: None}
