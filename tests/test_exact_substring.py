"""Exact-substring dedup (operators/dedup.py::exact_substring_runs):
seed-and-extend over the positional k-gram index must recover maximal
common runs with EXACT lengths and offsets — the property the winnowing
family deliberately trades away."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_api_spark.operators.dedup import (
    exact_substring_runs,
    kgram_positions,
)

# 28 chars including both spaces; fillers use disjoint alphabets so no
# accidental 8-gram crosses doc boundaries after lower()
COMMON = " ABCDEFGHIJKLMNOPQRSTUVWXYZ "


def _runs(spark, rows, k=8, max_df=32):
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    return exact_substring_runs(
        kgram_positions(docs, k=k), k=k, max_df=max_df
    ).collect()


def test_single_maximal_run_exact_length_and_offsets(spark):
    rows = [
        (1, "s", "qqqqqqqqqqq" + COMMON + "rrrrrrrrrr"),
        (2, "s", "mmmmmmmmm" + COMMON + "nnnnnnnnnnnn"),
        (3, "s", "totally unrelated filler text with zero overlap here"),
    ]
    got = _runs(spark, rows)
    assert len(got) == 1
    r = got[0]
    assert (r["doc_id"], r["doc_id_b"]) == (1, 2)
    assert r["run_len"] == len(COMMON) == 28
    # kgram_positions is 0-based: the run starts where the filler ends
    assert r["run_start"] == 11
    assert r["run_start_b"] == 9
    assert r["diag"] == 2


def test_repeated_run_yields_one_row_per_diagonal(spark):
    rows = [
        (1, "s", "qqqqqqqqqqq" + COMMON + "rrrrrrrrrr"),
        (2, "s", COMMON + "bbbbbbbbbbbb" + COMMON),
    ]
    got = sorted(_runs(spark, rows), key=lambda r: r["diag"])
    # doc 2 contains the run twice -> two diagonals vs doc 1, each an
    # exact maximal run
    assert len(got) == 2
    assert all(r["run_len"] == 28 for r in got)
    assert {r["run_start_b"] for r in got} == {0, 28 + 12}


def test_viral_gram_cap_suppresses_boilerplate(spark):
    # 40 docs sharing the same 28-char run: every gram INSIDE the run
    # occurs 40 > max_df=32 times, so the df cap drops those buckets
    # before pairing (quadratic-output guard) and the viral run never
    # surfaces at its real length.  Grams CROSSING the run boundary mix
    # in per-doc suffix chars (docs 0-9 share the "v0" suffix prefix,
    # an honest sub-cap match), so the assertion is about run LENGTH:
    # nothing close to the viral run's 28 chars survives.
    rows = [
        (i, "s", f"u{i:02d}" * 4 + COMMON + f"v{i:02d}" * 4)
        for i in range(40)
    ]
    capped = _runs(spark, rows)
    assert all(r["run_len"] < len(COMMON) // 2 for r in capped), sorted(
        {r["run_len"] for r in capped}
    )
    # the same corpus under a laxer cap surfaces the full run for every
    # one of the 40*39/2 pairs — 28 chars, +1/+2 where the suffixes
    # share their decade prefix ("v0…" vs "v0…" extends the run)
    lax = _runs(spark, rows, max_df=100_000)
    full = [r for r in lax if r["run_len"] >= len(COMMON)]
    assert len(full) == 40 * 39 // 2
    assert all(len(COMMON) <= r["run_len"] <= len(COMMON) + 2 for r in full)


def test_scope_and_short_docs(spark):
    rows = [
        (1, "sA", "qqqqqqqqqqq" + COMMON),
        (2, "sB", "mmmmmmmmm" + COMMON),  # other source: never paired
        (3, "sA", "short"),  # < k: dropped before hashing
    ]
    assert _runs(spark, rows) == []


def test_runs_below_k_never_seed(spark):
    # common substring of k-1 chars produces no k-gram seed
    sub = "ABCDEFG"  # 7 < k=8
    rows = [
        (1, "s", "qqqqqqqqqq" + sub + "rrrrrrrrrr"),
        (2, "s", "mmmmmmmmmm" + sub + "nnnnnnnnnn"),
    ]
    assert _runs(spark, rows) == []


def test_streaming_xsub_matches_batch_and_replay(spark, tmp_path, sf_dir):
    """Streamed gram store == batch artifact over the same docs (after
    the merge-on-read occurrence filters), replay of a committed batch
    is a no-op — AND the cross-batch pair property that makes
    merge-on-read a correctness requirement here: a run shared by two
    docs that arrive in DIFFERENT batches must still pair (a per-batch
    [>=2] prune would have dropped both sides as singletons)."""
    from pyspark.sql import functions as F

    import vector_database_api_spark.streaming.maintenance as M
    from vector_database_api_spark.operators import dedup as dedup_mod
    from vector_database_api_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    src = str(tmp_path / "src")
    for lo, hi in [(0, 20), (20, 35), (35, 10**9)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).repartition(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    store = str(tmp_path / "xsub_store")
    M.incremental_xsub_maintenance(
        spark,
        M.read_event_stream(spark, src, schema),
        store,
        str(tmp_path / "ckpt_xsub"),
    ).awaitTermination(300)

    def rows_of(df):
        return {
            (r["doc_id"], r["source"], r["pos"], r["h"]) for r in df.collect()
        }

    served = rows_of(M.xsub_grams_serving(spark, store))
    want = rows_of(
        dedup_mod.prune_for_pairing(dedup_mod.kgram_positions(docs), 32)
    )
    assert served == want and served

    # cross-batch pair: with the corpus-wide filters applied merge-on-
    # read, the exact-substring runs derived from the STREAMED store
    # equal those from the batch store — including pairs whose two docs
    # arrived in different micro-batches (doc_id boundaries 20/35 split
    # the corpus arbitrarily, so the sf testdata's near-dup pairs cross
    # them)
    got_runs = sorted(
        map(
            tuple,
            dedup_mod.exact_substring_runs(
                M.xsub_grams_serving(spark, store), k=20, max_df=None
            ).collect(),
        )
    )
    want_runs = sorted(
        map(
            tuple,
            dedup_mod.exact_substring_runs(
                dedup_mod.prune_for_pairing(
                    dedup_mod.kgram_positions(docs), 32
                ),
                k=20,
                max_df=None,
            ).collect(),
        )
    )
    assert got_runs == want_runs and got_runs

    # crash-replay: reprocess batch 0's content under the same id
    proc = M.xsub_gram_batch_processor(store)
    proc(docs.filter(F.col("doc_id") < 20), 0)
    assert rows_of(M.xsub_grams_serving(spark, store)) == want


def test_self_repetition_exact_lengths(spark):
    """Within-doc repeats (self_repetition_runs): a substring repeated
    later in the same doc is recovered with exact length, start, and
    diagonal (= the repeat distance); docs without repeats contribute
    nothing."""
    from vector_database_api_spark.operators.dedup import (
        kgram_positions,
        prune_for_pairing,
        self_repetition_runs,
    )

    # all three segments have pairwise-disjoint, internally unique
    # alphabets: an "mmmm…" style filler would itself self-repeat (the
    # operator correctly finds those runs — first draft of this test
    # proved it)
    body = "ABCDEFGHIJKLMNOPQRSTUVWXYZ!?"  # 28 unique chars
    rows = [
        # repeat at distance 28 + 9 = 37
        (1, "s", body + "123456789" + body + "@@"),
        (2, "s", "no internal repetition right here"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    got = self_repetition_runs(
        prune_for_pairing(kgram_positions(docs, k=8), 32), k=8
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["doc_id"] == 1
    assert r["diag"] == len(body) + 9
    assert r["run_len"] == len(body) == 28
    assert r["run_start"] == 0


def test_self_repetition_tandem_periodic(spark):
    """Tandem repeat with period p over a span of length L produces one
    maximal run per multiple of p, of exact length L - diag — the
    suffix-array family's self-overlap structure, recovered from the
    diagonal islands."""
    from vector_database_api_spark.operators.dedup import (
        kgram_positions,
        prune_for_pairing,
        self_repetition_runs,
    )

    unit = "abcdefghij"  # period 10
    text = unit * 4 + "klmnopqrstuv"  # span 40, non-repeating tail
    docs = spark.createDataFrame(
        [(1, "s", text)], "doc_id long, source string, text string"
    )
    got = {
        r["diag"]: r["run_len"]
        for r in self_repetition_runs(
            prune_for_pairing(kgram_positions(docs, k=8), 32), k=8
        ).collect()
    }
    assert got == {10: 30, 20: 20, 30: 10}
