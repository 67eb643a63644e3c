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
    StringType,
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


DEDUP_STATE_SCHEMA = StructType([StructField("n_seen", LongType())])

DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("fingerprint", LongType()),
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def _emit_first_seen(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (fingerprint,) = key
    seen = state.get[0] if state.exists else 0
    chunks = [pdf for pdf in pdfs if len(pdf) > 0]
    n_new = sum(len(c) for c in chunks)
    if seen == 0 and n_new > 0:
        batch = pd.concat(chunks, ignore_index=True)
        first = batch.sort_values("doc_id").iloc[0]
        yield pd.DataFrame(
            {
                "fingerprint": [fingerprint],
                "doc_id": [int(first["doc_id"])],
                "text": [str(first["text"])],
            }
        )
    state.update((seen + n_new,))


def streaming_exact_dedup(docs: DataFrame, fingerprint_col: str = "fingerprint") -> DataFrame:
    """Streaming exact dedup with a persistent cross-batch cache: the first
    document per fingerprint is emitted, every later arrival (same batch or
    any future batch, across restarts via the checkpointed state store) is
    suppressed.  The streaming twin of ``dedup.exact_dedup`` — the shape a
    continuous ingest pipeline needs so re-crawled duplicates never reach
    the corpus.  Requires columns (fingerprint, doc_id, text)."""
    return docs.groupBy(fingerprint_col).applyInPandasWithState(
        _emit_first_seen,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
