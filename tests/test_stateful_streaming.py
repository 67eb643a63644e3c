"""applyInPandasWithState: per-key state persists across micro-batches and
across stream restarts (checkpoint recovery)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vector_database_api_spark.streaming import maintenance as M
from vector_database_api_spark.streaming.stateful import running_user_profile


def _events_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": [r[1] for r in rows],
                "value": [r[2] for r in rows],
            }
        )
    )


def _drain(spark, src, out_dir, ckpt):
    """memory sink cannot resume from a checkpoint, so batches land in a
    parquet dir via foreachBatch; each drain reads only its own batches.
    availableNow may split the backlog into several micro-batches (update
    mode emits one row per touched key per batch), so keep each user's row
    from the LAST batch that touched it."""
    stream = M.read_event_stream(
        spark, src, "user_id bigint, ts timestamp, value double"
    )

    def sink(batch, batch_id):
        batch.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        running_user_profile(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {}
    for r in sorted(
        spark.read.parquet(out_dir).collect(), key=lambda r: r["batch_id"]
    ):
        out[r["user_id"]] = (r["n_events"], r["total_value"])
    return out


def test_state_accumulates_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 1, 1, 9, 0)

    _events_df(spark, [(1, t, 2.0), (1, t, 3.0), (2, t, 10.0)]).write.mode(
        "append"
    ).parquet(src)
    got1 = _drain(spark, src, str(tmp_path / "out1"), ckpt)
    assert got1 == {1: (2, 5.0), 2: (1, 10.0)}

    # second batch, new query instance, same checkpoint: state recovered
    _events_df(spark, [(1, t, 4.0), (3, t, 7.0)]).write.mode("append").parquet(src)
    got2 = _drain(spark, src, str(tmp_path / "out2"), ckpt)
    # update mode emits only touched keys; user 1 continued from state
    assert got2[1] == (3, 9.0)
    assert got2[3] == (1, 7.0)
    assert 2 not in got2


def _docs_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "fingerprint": [r[0] for r in rows],
                "doc_id": [r[1] for r in rows],
                "text": [r[2] for r in rows],
            }
        )
    )


def _drain_dedup(spark, src, out_dir, ckpt):
    from vector_database_api_spark.streaming.stateful import streaming_exact_dedup

    stream = M.read_event_stream(
        spark, src, "fingerprint bigint, doc_id bigint, text string"
    )

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(out_dir)

    q = (
        streaming_exact_dedup(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(
        (r["fingerprint"], r["doc_id"]) for r in spark.read.parquet(out_dir).collect()
    )


def test_streaming_dedup_suppresses_across_restarts(spark, tmp_path):
    """First doc per fingerprint is emitted once; duplicates in the same
    batch, later batches, and after a stream restart are all suppressed by
    the checkpointed state cache."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    # single file per append => one micro-batch per drain (the file source
    # may otherwise split part-files across batches)
    _docs_df(
        spark, [(100, 7, "alpha"), (100, 3, "alpha dup"), (200, 5, "beta")]
    ).repartition(1).write.mode("append").parquet(src)
    got1 = _drain_dedup(spark, src, str(tmp_path / "out1"), ckpt)
    # in-batch dedup: lowest doc_id wins per fingerprint
    assert got1 == [(100, 3), (200, 5)]

    # restart with new data: old fingerprints suppressed, new ones emitted
    _docs_df(
        spark, [(100, 9, "alpha again"), (300, 1, "gamma")]
    ).repartition(1).write.mode("append").parquet(src)
    got2 = _drain_dedup(spark, src, str(tmp_path / "out2"), ckpt)
    assert got2 == [(300, 1)]


def _events4_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": [r[1] for r in rows],
                "value": [r[2] for r in rows],
                "event_type": [r[3] for r in rows],
            }
        )
    )


def _drain_v2(spark, src, out_dir, ckpt):
    from vector_database_api_spark.streaming.stateful import running_user_profile_v2

    stream = M.read_event_stream(
        spark, src, "user_id bigint, ts timestamp, value double, event_type string"
    )

    def sink(batch, batch_id):
        batch.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    q = (
        running_user_profile_v2(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {}
    for r in sorted(
        spark.read.parquet(out_dir).collect(), key=lambda r: r["batch_id"]
    ):
        out[r["user_id"]] = (
            r["n_events"],
            r["total_value"],
            r["n_types"],
            r["top_type"],
        )
    return out


def test_transform_with_state_v2_accumulates_across_restarts(spark, tmp_path):
    """Spark 4 typed-state processor: ValueState totals and MapState
    per-type counts survive micro-batch boundaries AND a full stream
    restart from checkpoint.  The v2 state protocol requires protobuf
    (not shipped in this container) — skip, not fail, when absent; the
    applyInPandasWithState tests above cover the same semantics."""
    pytest.importorskip("google.protobuf")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 1, 1, 9, 0)

    _events4_df(
        spark,
        [(1, t, 2.0, "click"), (1, t, 3.0, "view"), (2, t, 10.0, "click")],
    ).write.mode("append").parquet(src)
    got1 = _drain_v2(spark, src, str(tmp_path / "o1"), ckpt)
    # ties (click=1, view=1) break lexicographically -> "click"
    assert got1 == {1: (2, 5.0, 2, "click"), 2: (1, 10.0, 1, "click")}

    _events4_df(
        spark, [(1, t, 4.0, "view"), (3, t, 7.0, "purchase")]
    ).write.mode("append").parquet(src)
    got2 = _drain_v2(spark, src, str(tmp_path / "o2"), ckpt)
    assert got2[1] == (3, 9.0, 2, "view")  # view=2 beats click=1 after restart
    assert got2[3] == (1, 7.0, 1, "purchase")
    assert 2 not in got2
