"""Artifact-store compaction: served rows unchanged, replay still safe.

Every merge-on-read store (BM25 term stats, winnow fingerprints, topic
counts) accumulates one ``_batch_id`` partition per micro-batch and
promises that a nightly compaction can fold partials without changing
served values.  These tests pin that promise:

- serving output is IDENTICAL before and after compaction (bit-exact —
  the folds are the serving functions' own combinable sums);
- the partition fan-out actually collapses to {reserved base, newest};
- a replay of the newest batch (the only one Structured Streaming can
  re-run) is still a no-op after compaction;
- ingest continues correctly on a compacted store: compacted-then-
  ingested == never-compacted over the same batches;
- re-compacting a just-compacted store is a no-op;
- a leftover temp dir from a crashed prior run does not poison the next.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import vector_database_api_spark.streaming.maintenance as M
from vector_database_api_spark.sources.tables import load_table


def _partition_ids(spark, store_dir):
    return sorted(
        r["_batch_id"]
        for r in spark.read.parquet(store_dir)
        .select("_batch_id")
        .distinct()
        .collect()
    )


def _doc_batches(spark, sf_dir, bounds=(0, 15, 30, 45)):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    cuts = list(bounds) + [10**9]
    return [
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in zip(cuts, cuts[1:])
    ]


def _bm25_served(spark, stats_dir):
    terms, corpus = M.bm25_stats_serving(spark, stats_dir)
    return (
        {r["term"]: (r["df"], r["tf"]) for r in terms.collect()},
        corpus.collect()[0].asDict(),
    )


def test_bm25_stats_compaction_preserves_serving(spark, sf_dir, tmp_path):
    batches = _doc_batches(spark, sf_dir)
    stats = str(tmp_path / "stats")
    proc = M.bm25_stats_batch_processor(stats)
    for i, b in enumerate(batches[:3]):
        proc(b, i)

    before = _bm25_served(spark, stats)
    res = M.compact_bm25_stats(spark, stats)
    assert res["terms"]["compacted"] and res["corpus"]["compacted"]
    assert res["terms"]["folded_partitions"] == 2

    assert _bm25_served(spark, stats) == before  # bit-exact
    assert _partition_ids(spark, stats + "/terms") == [
        M.COMPACTED_BATCH_ID,
        2,
    ]
    assert _partition_ids(spark, stats + "/corpus") == [
        M.COMPACTED_BATCH_ID,
        2,
    ]

    # replay of the newest (still-replayable) batch: idempotent
    proc(batches[2], 2)
    assert _bm25_served(spark, stats) == before

    # ingest continues on the compacted store; compare against a twin
    # store that never compacted — served stats must match bit-exactly
    proc(batches[3], 3)
    twin = str(tmp_path / "twin")
    tproc = M.bm25_stats_batch_processor(twin)
    for i, b in enumerate(batches):
        tproc(b, i)
    assert _bm25_served(spark, stats) == _bm25_served(spark, twin)


def test_winnow_compaction_preserves_rows(spark, sf_dir, tmp_path):
    batches = _doc_batches(spark, sf_dir, bounds=(0, 20, 40))
    store = str(tmp_path / "winnow")
    proc = M.winnow_fp_batch_processor(store)
    for i, b in enumerate(batches):
        proc(b.select("doc_id", "source", "text"), i)

    def served():
        return sorted(
            map(tuple, M.winnow_fingerprints_serving(spark, store).collect())
        )

    def raw_multiset():
        return sorted(
            map(tuple, spark.read.parquet(store).drop("_batch_id").collect())
        )

    before, raw_before = served(), raw_multiset()
    res = M.compact_batch_store(spark, store)  # via generic entry point
    assert res["compacted"] and res["folded_partitions"] == 2
    assert served() == before
    # row-preserving fold: raw occurrence rows (ignoring _batch_id) are
    # the same multiset, not just the capped served view
    assert raw_multiset() == raw_before
    assert _partition_ids(spark, store) == [M.COMPACTED_BATCH_ID, 2]
    assert M.compact_winnow_store(spark, store)["compacted"] is False


def test_topic_store_compaction_and_crash_leftover(spark, sf_dir, tmp_path):
    batches = _doc_batches(spark, sf_dir)
    store = str(tmp_path / "topics")
    proc = M.topic_counts_batch_processor(store)
    for i, b in enumerate(batches[:3]):
        proc(b, i)

    def served():
        return {
            (r["source"], r["term"]): r["ctfidf"]
            for r in M.topic_model_serving(spark, store).collect()
        }

    before = served()

    # a crashed prior compaction left a stale temp dir — must be ignored
    os.makedirs(store + ".compacting/_batch_id=99")
    res = M.compact_topic_store(spark, store)
    assert res["compacted"] and res["folded_partitions"] == 2
    assert not os.path.exists(store + ".compacting")
    assert served() == before
    assert _partition_ids(spark, store) == [M.COMPACTED_BATCH_ID, 2]

    # ingest after compaction == never-compacted twin (ctfidf bit-exact:
    # same counts into the same scorer)
    proc(batches[3], 3)
    twin = str(tmp_path / "topics_twin")
    tproc = M.topic_counts_batch_processor(twin)
    for i, b in enumerate(batches):
        tproc(b, i)
    twin_served = {
        (r["source"], r["term"]): r["ctfidf"]
        for r in M.topic_model_serving(spark, twin).collect()
    }
    assert served() == twin_served

    # second compaction folds {base, old-newest}, keeping batch 3
    res2 = M.compact_topic_store(spark, store)
    assert res2["compacted"] and res2["kept_batch_id"] == 3
    assert served() == twin_served
    # third is a no-op: only the base is foldable
    assert M.compact_topic_store(spark, store)["compacted"] is False


def test_single_batch_store_is_noop(spark, sf_dir, tmp_path):
    (batch,) = _doc_batches(spark, sf_dir, bounds=(0,))[:1]
    store = str(tmp_path / "one")
    M.topic_counts_batch_processor(store)(batch, 0)
    res = M.compact_topic_store(spark, store)
    assert res == {
        "compacted": False,
        "folded_partitions": 0,
        "kept_batch_id": 0,
    }
    assert _partition_ids(spark, store) == [0]


def test_crash_between_renames_heals_at_entry(spark, sf_dir, tmp_path):
    """r7 ADVICE: a crash between the two swap renames leaves all data
    stranded in .precompact and no store dir.  The next compaction run
    must restore the store (and clear the dead run's lock) before
    proceeding."""
    batches = _doc_batches(spark, sf_dir)
    store = str(tmp_path / "topics")
    proc = M.topic_counts_batch_processor(store)
    for i, b in enumerate(batches[:3]):
        proc(b, i)

    def served():
        return {
            (r["source"], r["term"]): r["ctfidf"]
            for r in M.topic_model_serving(spark, store).collect()
        }

    before = served()
    # simulate the crash window: store moved aside, temp never renamed
    # in, dead compactor's lock still on disk
    os.rename(store, store + ".precompact")
    open(M._compaction_lock(store), "w").close()
    assert not os.path.exists(store)

    res = M.compact_topic_store(spark, store)  # entry-heals, then folds
    assert res["compacted"] and res["folded_partitions"] == 2
    assert os.path.exists(store)
    assert not os.path.exists(store + ".precompact")
    assert not os.path.exists(M._compaction_lock(store))
    assert served() == before


def test_concurrent_compactor_and_writer_are_excluded(spark, sf_dir, tmp_path):
    """VERDICT r7 task 5: the 'never concurrently with an in-flight
    micro-batch' scheduling contract is enforced, not advisory — while
    the ._COMPACTING lock is held, a second compactor and every
    _batch_id-store micro-batch writer fail fast."""
    batches = _doc_batches(spark, sf_dir)
    store = str(tmp_path / "topics")
    proc = M.topic_counts_batch_processor(store)
    for i, b in enumerate(batches[:3]):
        proc(b, i)
    served_before = spark.read.parquet(store).count()

    # hold the lock as an in-flight compactor would
    open(M._compaction_lock(store), "w").close()
    with pytest.raises(M.CompactionInProgressError):
        M.compact_topic_store(spark, store)  # second compactor excluded
    with pytest.raises(M.CompactionInProgressError):
        proc(batches[3], 3)  # concurrent micro-batch write excluded
    # the excluded batch wrote nothing — replay-safe to re-run later
    assert spark.read.parquet(store).count() == served_before

    os.remove(M._compaction_lock(store))
    proc(batches[3], 3)  # after release the same batch lands normally
    assert _partition_ids(spark, store) == [0, 1, 2, 3]
    res = M.compact_topic_store(spark, store)
    assert res["compacted"] and res["kept_batch_id"] == 3


def test_all_batch_store_writers_check_the_lock(spark, sf_dir, tmp_path):
    """Every _batch_id-partitioned store writer — not just topics —
    fails fast under an in-flight compaction lock."""
    batches = _doc_batches(spark, sf_dir)

    stats = str(tmp_path / "stats")
    sproc = M.bm25_stats_batch_processor(stats)
    sproc(batches[0], 0)
    open(M._compaction_lock(stats + "/terms"), "w").close()
    with pytest.raises(M.CompactionInProgressError):
        sproc(batches[1], 1)
    os.remove(M._compaction_lock(stats + "/terms"))

    wstore = str(tmp_path / "winnow")
    wproc = M.winnow_fp_batch_processor(wstore)
    wproc(batches[0].select("doc_id", "source", "text"), 0)
    open(M._compaction_lock(wstore), "w").close()
    with pytest.raises(M.CompactionInProgressError):
        wproc(batches[1].select("doc_id", "source", "text"), 1)
    os.remove(M._compaction_lock(wstore))
