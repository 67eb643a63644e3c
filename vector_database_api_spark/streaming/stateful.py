"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming state at all (SURVEY §2.9); this is the
extended-surface pattern for operators Spark's built-in windowed
aggregations can't express: arbitrary per-key state evolved batch by batch
(running profiles, anomaly baselines, dedup caches).

Example operator: per-user running activity profile — event count, value
sum, and last-seen timestamp — maintained across micro-batches in the
state store and emitted (update mode) whenever a key sees new data.  The
same shape extends to, e.g., per-library incremental index statistics or
streaming near-dup caches keyed by band bucket.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [last_ts],
        }
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """Streaming per-user running profile.  Requires columns
    (user_id, ts, value); emits one updated row per user per batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
