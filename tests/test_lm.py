"""Bigram-LM quality operators (operators/lm.py) and the streaming LM
admission gate (streaming/maintenance.py).

Invariants: the operator composition reproduces the oracle-checked
registered query's per-source rollup; the streaming gate admits exactly
the batch-scored at-or-under-threshold set, quarantines the rest
(including unscorable short docs), and replays are idempotent.
"""

from __future__ import annotations

import json
import pathlib

from pyspark.sql import functions as F

from vector_database_api_spark import queries as q
from vector_database_api_spark.operators import lm as LM
from vector_database_api_spark.sources.tables import load_table
from vector_database_api_spark.streaming import maintenance as M

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "source"
    )


def test_lm_operators_match_registered_query(spark):
    """train_bigram_lm + doc_cross_entropy composed into the per-source
    rollup equals the registered (oracle-checked) lm_cross_entropy_screen
    at sf0.001 — the operators ARE the query's semantics, reusable by
    the streaming gate."""
    docs = _docs(spark)
    uni, big = LM.train_bigram_lm(docs.filter(F.col("source") == "src0"))
    v = uni.count()
    scores = LM.doc_cross_entropy(docs, uni, big, v)
    perdoc = docs.select("doc_id", "source").join(
        scores.withColumnRenamed("id", "doc_id"), "doc_id"
    )
    got = {
        r["source"]: (r["n_docs"], r["mean"], r["flagged"])
        for r in perdoc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("h_bits").alias("mean"),
            F.sum(F.when(F.col("h_bits") > 10.0, 1).otherwise(0)).alias(
                "flagged"
            ),
        )
        .collect()
    }
    want = {
        r["source"]: (r["n_docs"], r["mean_xent_bits"], r["flagged_docs"])
        for r in q.spark_queries()["lm_cross_entropy_screen"](
            spark, SF_DIR
        ).collect()
    }
    assert got.keys() == want.keys() and len(want) > 0
    for src in want:
        assert got[src][0] == want[src][0], src
        assert abs(got[src][1] - want[src][1]) < 1e-4, src
        assert got[src][2] == want[src][2], src


def test_lm_gate_matches_batch_scores_and_restart(spark, tmp_path):
    """Streaming admission == batch h_bits <= threshold; quarantine
    carries scores (NULL for unscorable docs); meta counters add up; a
    restart with no new files changes nothing (the gate is stateless, so
    order of arrival never matters)."""
    docs = _docs(spark)
    lm_dir = str(tmp_path / "lm")
    M.build_bigram_lm_artifact(docs.filter(F.col("source") == "src0"), lm_dir)

    uni = spark.read.parquet(lm_dir + "/uni")
    big = spark.read.parquet(lm_dir + "/big")
    v = json.loads(pathlib.Path(lm_dir + "_meta.json").read_text())[
        "vocab_size"
    ]
    batch_scores = {
        r["id"]: r["h_bits"]
        for r in LM.doc_cross_entropy(docs, uni, big, v).collect()
    }
    # median threshold => both sinks provably nonempty
    hs = sorted(batch_scores.values())
    threshold = hs[len(hs) // 2]
    want_admitted = {i for i, h in batch_scores.items() if h <= threshold}

    src = str(tmp_path / "src")
    for lo, hi in [(0, 170), (170, 340), (340, 10**9)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).repartition(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    admitted_dir = str(tmp_path / "admitted")
    quarantine_dir = str(tmp_path / "quarantine")
    stream_args = dict(
        lm_dir=lm_dir,
        admitted_dir=admitted_dir,
        quarantine_dir=quarantine_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold_bits=threshold,
    )
    M.incremental_lm_quality_gate(
        spark, M.read_event_stream(spark, src, schema), **stream_args
    ).awaitTermination(300)

    got = {r["doc_id"] for r in spark.read.parquet(admitted_dir).collect()}
    assert got == want_admitted and 0 < len(got) < docs.count()
    quar = spark.read.parquet(quarantine_dir).collect()
    assert {r["doc_id"] for r in quar} == (
        {r["doc_id"] for r in docs.collect()} - want_admitted
    )
    meta = json.loads(pathlib.Path(admitted_dir + "_meta.json").read_text())
    assert meta["n_admitted"] == len(got)
    assert meta["n_quarantined"] == len(quar)

    # restart: availableNow over the same files is a no-op
    M.incremental_lm_quality_gate(
        spark, M.read_event_stream(spark, src, schema), **stream_args
    ).awaitTermination(300)
    assert {
        r["doc_id"] for r in spark.read.parquet(admitted_dir).collect()
    } == want_admitted


def test_lm_gate_replay_is_idempotent(spark, tmp_path):
    """Crash-replay: re-running a batch whose sinks committed but whose
    meta write was lost rewrites the same _batch_id partitions — no
    duplicate rows (dynamic partition overwrite), counters correct."""
    docs = _docs(spark).filter(F.col("doc_id") < 100)
    lm_dir = str(tmp_path / "lm")
    M.build_bigram_lm_artifact(docs, lm_dir)
    admitted_dir = str(tmp_path / "admitted")
    proc = M.lm_gate_batch_processor(
        lm_dir, admitted_dir, str(tmp_path / "quarantine"), threshold_bits=50.0
    )
    proc(docs, 0)
    first = sorted(
        r["doc_id"] for r in spark.read.parquet(admitted_dir).collect()
    )
    meta_path = pathlib.Path(admitted_dir + "_meta.json")
    meta_path.unlink()  # simulate crash before the meta commit
    proc(docs, 0)  # replayed batch
    again = sorted(
        r["doc_id"] for r in spark.read.parquet(admitted_dir).collect()
    )
    assert again == first
    assert json.loads(meta_path.read_text())["n_admitted"] == len(first)
