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
