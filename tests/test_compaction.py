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
    # in, dead compactor's pid-stamped lock still on disk
    os.rename(store, store + ".precompact")
    with open(M._compaction_lock(store), "w") as fh:
        fh.write("4194300")  # beyond pid_max: a dead owner
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

    # hold the lock as an in-flight LIVE compactor would (pid-stamped)
    with open(M._compaction_lock(store), "w") as fh:
        fh.write(str(os.getpid()))
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
    with open(M._compaction_lock(stats + "/terms"), "w") as fh:
        fh.write(str(os.getpid()))
    with pytest.raises(M.CompactionInProgressError):
        sproc(batches[1], 1)
    os.remove(M._compaction_lock(stats + "/terms"))

    wstore = str(tmp_path / "winnow")
    wproc = M.winnow_fp_batch_processor(wstore)
    wproc(batches[0].select("doc_id", "source", "text"), 0)
    with open(M._compaction_lock(wstore), "w") as fh:
        fh.write(str(os.getpid()))
    with pytest.raises(M.CompactionInProgressError):
        wproc(batches[1].select("doc_id", "source", "text"), 1)
    os.remove(M._compaction_lock(wstore))


def test_exception_between_renames_self_heals_and_releases(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r8 review: an EXCEPTION between the two swap renames must not
    release the lock over a missing store (a later micro-batch would
    recreate the store with only its own rows while the history sat
    stranded in .precompact).  The finally block renames .precompact
    back in-process, so the store is whole and the lock is released."""
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
    real_rename = os.rename

    def failing_rename(src, dst):
        if src.endswith(".compacting") and dst == store:
            raise OSError("injected crash between the two swap renames")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    with pytest.raises(OSError, match="injected crash"):
        M.compact_topic_store(spark, store)
    monkeypatch.setattr(os, "rename", real_rename)

    # self-healed: store whole, history intact, lock released
    assert os.path.exists(store)
    assert not os.path.exists(M._compaction_lock(store))
    assert served() == before
    # and both a micro-batch write and a fresh compaction proceed
    proc(batches[3], 3)
    res = M.compact_topic_store(spark, store)
    assert res["compacted"] and res["kept_batch_id"] == 3
    assert _partition_ids(spark, store) == [M.COMPACTED_BATCH_ID, 3]


def test_compactor_refuses_during_live_writer(spark, sf_dir, tmp_path):
    """r8 review: the exclusion is two-way — a compactor that starts
    while a micro-batch write is in flight (live writer marker) must
    refuse instead of renaming the store out from under the write.
    Dead writers' stale markers must NOT block compaction."""
    batches = _doc_batches(spark, sf_dir)
    store = str(tmp_path / "topics")
    proc = M.topic_counts_batch_processor(store)
    for i, b in enumerate(batches[:3]):
        proc(b, i)

    live_marker = store + f"._WRITING.{os.getpid()}.deadbeef"
    open(live_marker, "w").close()
    with pytest.raises(M.CompactionInProgressError, match="in-flight"):
        M.compact_topic_store(spark, store)
    assert not os.path.exists(M._compaction_lock(store))  # lock released
    os.remove(live_marker)

    stale_marker = store + "._WRITING.4194300.deadbeef"  # dead pid
    open(stale_marker, "w").close()
    res = M.compact_topic_store(spark, store)  # stale marker cleaned
    assert res["compacted"]
    assert not os.path.exists(stale_marker)


def test_writer_blocked_while_store_mid_swap(spark, sf_dir, tmp_path):
    """r8 review: a writer must stay excluded by a DEAD compactor's
    lock while the store is mid-swap (dir missing, data in .precompact)
    — clearing it and writing would strand the history — but may clear
    a dead lock when the store dir is whole."""
    batches = _doc_batches(spark, sf_dir)
    store = str(tmp_path / "topics")
    proc = M.topic_counts_batch_processor(store)
    for i, b in enumerate(batches[:2]):
        proc(b, i)

    # mid-swap crash state with a dead owner
    os.rename(store, store + ".precompact")
    with open(M._compaction_lock(store), "w") as fh:
        fh.write("4194300")
    with pytest.raises(M.CompactionInProgressError):
        proc(batches[2], 2)
    assert not os.path.exists(store)  # nothing was written

    # heal, then the same dead-lock with a WHOLE store is cleared
    M.compact_topic_store(spark, store)
    with open(M._compaction_lock(store), "w") as fh:
        fh.write("4194300")
    proc(batches[2], 2)  # dead lock over a whole store: write proceeds
    assert not os.path.exists(M._compaction_lock(store))
    assert 2 in _partition_ids(spark, store)


def test_pid_alive_eperm_means_alive(monkeypatch):
    """kill(pid,0) EPERM = the pid exists under another uid (r8 ADVICE):
    a live foreign-uid compactor's lock must never be stolen, a live
    foreign-uid writer's marker must never be deleted."""

    def eperm(pid, sig):
        raise PermissionError(1, "Operation not permitted")

    monkeypatch.setattr(os, "kill", eperm)
    assert M._pid_alive(12345) is True

    def esrch(pid, sig):
        raise ProcessLookupError(3, "No such process")

    monkeypatch.setattr(os, "kill", esrch)
    assert M._pid_alive(12345) is False


def test_live_writer_marker_survives_eperm(spark, tmp_path, monkeypatch):
    store = str(tmp_path / "store")
    marker = store + "._WRITING.999999.deadbeef"
    open(marker, "w").close()

    def eperm(pid, sig):
        raise PermissionError(1, "Operation not permitted")

    monkeypatch.setattr(os, "kill", eperm)
    live = M._live_writer_markers(store)
    assert live == [marker]
    assert os.path.exists(marker)  # never deleted while possibly live


def test_compactor_on_missing_store_releases_lock(spark, tmp_path):
    """Neither the store nor .precompact exists (never created, or
    externally deleted): the read fails, but the fresh lock must NOT
    persist — a kept lock would wedge every future writer_guard forever
    because later compactions hit the same read failure (r8 ADVICE)."""
    store = str(tmp_path / "never_created")
    with pytest.raises(Exception):
        M.compact_batch_store(spark, store, None)
    assert not os.path.exists(M._compaction_lock(store))
    # and a writer can proceed afterwards
    with M.writer_guard(store):
        pass


def test_xsub_compaction_preserves_rows(spark, sf_dir, tmp_path):
    """r10 exact-substring gram store joins the compaction contract:
    the fold is row-preserving (both occurrence filters are merge-on-
    read), so the raw occurrence multiset AND the filtered served view
    are unchanged; a second compaction is a no-op."""
    batches = _doc_batches(spark, sf_dir, bounds=(0, 20, 40))
    store = str(tmp_path / "xsub")
    proc = M.xsub_gram_batch_processor(store)
    for i, b in enumerate(batches):
        proc(b.select("doc_id", "source", "text"), i)

    def served():
        return sorted(
            map(tuple, M.xsub_grams_serving(spark, store).collect())
        )

    def raw_multiset():
        return sorted(
            map(tuple, spark.read.parquet(store).drop("_batch_id").collect())
        )

    before, raw_before = served(), raw_multiset()
    res = M.compact_xsub_store(spark, store)
    assert res["compacted"] and res["folded_partitions"] == 2
    assert served() == before
    assert raw_multiset() == raw_before
    assert _partition_ids(spark, store) == [M.COMPACTED_BATCH_ID, 2]
    assert M.compact_xsub_store(spark, store)["compacted"] is False
