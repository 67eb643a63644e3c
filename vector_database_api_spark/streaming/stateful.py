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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 state API v2): typed state variables
# (ValueState / MapState), per-state TTL, and timers — the successor to
# applyInPandasWithState above.  Same operator semantics as
# running_user_profile plus a per-event-type breakdown held in MapState,
# which the old API could only fake by packing maps into one row.
#
# Runtime dependency: the v2 state protocol speaks protobuf to the state
# server, so executing this operator requires the ``protobuf`` package
# (and the RocksDB state store provider).  This container lacks protobuf,
# so the restart test self-skips; the applyInPandasWithState twin above
# covers the same semantics in CI.
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

PROFILE_V2_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("n_types", LongType()),
        StructField("top_type", StringType()),
    ]
)


class UserProfileProcessor(StatefulProcessor):
    """Per-user running profile with per-event-type counts.

    ValueState holds (n_events, total_value); MapState keyed by event_type
    holds per-type counts.  State store layout is per-key-per-variable, so
    a 100 TB keyspace shards across executors exactly like any keyed
    aggregation; RocksDB state backend + changelog checkpointing keep
    snapshots incremental at scale.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n_events bigint, total_value double"
        )
        self._by_type = handle.getMapState(
            "by_type", "event_type string", "cnt bigint"
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            for etype, cnt in pdf["event_type"].value_counts().items():
                prev = (
                    self._by_type.getValue((etype,))[0]
                    if self._by_type.containsKey((etype,))
                    else 0
                )
                self._by_type.updateValue((etype,), (prev + int(cnt),))
        self._totals.update((n, total))
        counts = sorted(
            ((k[0], v[0]) for k, v in self._by_type.iterator()),
            # deterministic top type: highest count, then lexicographic
            key=lambda kv: (-kv[1], kv[0]),
        )
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "n_types": [len(counts)],
                "top_type": [counts[0][0]],
            }
        )

    def close(self) -> None:
        pass


def running_user_profile_v2(events: DataFrame) -> DataFrame:
    """Streaming per-user profile on the Spark 4 typed-state API.
    Requires columns (user_id, ts, value, event_type); emits one updated
    row per user per micro-batch (update mode)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=PROFILE_V2_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )
