"""Dedup operators vs constructed ground truth."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vector_database_api_spark.operators import dedup as D

DOCS_SCHEMA = "doc_id bigint, text string"


def _shingles(text, n=3):
    toks = text.lower().split(" ")
    return {"_".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_exact_dedup_keeps_lowest_id(spark):
    rows = [
        (1, "alpha beta gamma"),
        (5, "alpha beta gamma"),
        (3, "delta epsilon zeta"),
        (2, "alpha beta gamma"),
    ]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    kept = sorted(r["doc_id"] for r in D.exact_dedup(df).collect())
    assert kept == [1, 3]


def test_minhash_finds_near_dups_with_exact_jaccard(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")  # high word-trigram overlap
    rows = [
        (1, base),
        (2, near),
        (3, "completely different words describing unrelated things entirely now"),
        (4, "another separate document about novel topics nobody mentioned before"),
    ]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    pairs = D.minhash_near_dup_pairs(df, jaccard_threshold=0.3).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    sa, sb = _shingles(base), _shingles(near)
    want = len(sa & sb) / len(sa | sb)
    assert abs(pairs[0]["jaccard"] - want) < 1e-12


def test_minhash_identical_docs(spark):
    rows = [(1, "one two three four five six"), (2, "one two three four five six")]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    pairs = D.minhash_near_dup_pairs(df, jaccard_threshold=0.99).collect()
    assert len(pairs) == 1 and pairs[0]["jaccard"] == 1.0


def test_simhash_properties(spark):
    rows = [
        (1, "spark window merge join table"),
        (2, "spark window merge join table"),  # identical -> same hash
        (3, "spark window merge join chart"),  # near -> small hamming
        (4, "zzz qqq vvv kkk www"),  # far -> larger hamming
    ]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    got = {r["id"]: r["simhash"] for r in D.simhash(df).collect()}
    assert len(got[1]) == 60 and set(got[1]) <= {"0", "1"}
    assert got[1] == got[2]

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    assert ham(got[1], got[3]) < ham(got[1], got[4])


def test_simhash_udf_equals_hof(spark, sf_dir):
    """The vectorized pandas-UDF SimHash must be bit-identical to the
    pure-expression form (integer votes, same md5 bytes)."""
    from vector_database_api_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    hof = {r["id"]: r["simhash"] for r in D.simhash(docs, compute="hof").collect()}
    udf = {r["id"]: r["simhash"] for r in D.simhash(docs, compute="udf").collect()}
    assert hof == udf


def test_simhash_near_dup_pairs_matches_brute_force(spark):
    """The banded join must reproduce brute-force all-pairs exactly for
    max_hamming <= bands-1 (lossless pigeonhole guarantee)."""
    import pytest

    rows = [
        (1, "spark window merge join table"),
        (2, "spark window merge join table"),  # hamming 0 pair with 1
        (3, "spark window merge join chart"),  # maybe-near
        (4, "zzz qqq vvv kkk www"),  # far
        (5, "spark window merge join table"),  # hamming 0 with 1, 2
    ]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    sigs = {r["id"]: r["simhash"] for r in D.simhash(df).collect()}

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    want = sorted(
        (a, b, ham(sigs[a], sigs[b]))
        for a in sigs
        for b in sigs
        if a < b and ham(sigs[a], sigs[b]) <= 3
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_near_dup_pairs(df, bands=4, max_hamming=3).collect()
    )
    assert got == want
    assert (1, 2, 0) in got and (1, 5, 0) in got and (2, 5, 0) in got

    with pytest.raises(ValueError):
        D.simhash_near_dup_pairs(df, bands=4, max_hamming=4)


def test_embedding_near_dup_blocked(spark):
    rows = [
        ("a", [1.0, 0.0, 0.0], "x"),
        ("b", [0.999, 0.01, 0.0], "x"),  # near-dup of a, same block
        ("c", [0.0, 1.0, 0.0], "x"),
        ("d", [1.0, 0.0, 0.0], "y"),  # identical to a but different block
    ]
    df = spark.createDataFrame(rows, "id string, embedding array<float>, label string")
    pairs = D.embedding_near_dup_pairs(
        df, block_col="label", threshold=0.95
    ).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [("a", "b")]

    # without blocking the cross-block duplicate surfaces too
    pairs_all = D.embedding_near_dup_pairs(df, threshold=0.95).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs_all} == {("a", "b"), ("a", "d"), ("b", "d")}


def test_udf_shingles_equal_sql_shingles(spark, sf_dir):
    """word_shingles_udf must produce byte-identical arrays to the SQL
    spark_word_shingles form (which is what the DuckDB oracle mirrors)."""
    from vector_database_api_spark.functions import text as T
    from vector_database_api_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    both = docs.select(
        F.expr(T.spark_word_shingles("text", 3)).alias("sql_form"),
        T.word_shingles_udf(3)(F.col("text")).alias("udf_form"),
    )
    assert both.filter(F.col("sql_form") != F.col("udf_form")).count() == 0


import pytest


@pytest.mark.parametrize("strategy", ["driver", "distributed"])
def test_connected_components_chain_and_clique(spark, strategy):
    """Chain 1-2-3-4 (diameter 3, needs multiple propagation rounds),
    clique 10-11-12, isolated pair 20-21 — same answer on both paths."""
    edges = spark.createDataFrame(
        [
            (1, 2),
            (2, 3),
            (3, 4),
            (10, 11),
            (11, 12),
            (10, 12),
            (20, 21),
        ],
        "id_a bigint, id_b bigint",
    )
    got = {
        r.id: r.component
        for r in D.connected_components(edges, strategy=strategy).collect()
    }
    assert got == {
        1: 1,
        2: 1,
        3: 1,
        4: 1,
        10: 10,
        11: 10,
        12: 10,
        20: 20,
        21: 20,
    }


def test_connected_components_direction_agnostic(spark):
    """Edges given with arbitrary (src, dst) order produce identical
    labels — the graph is undirected."""
    fwd = spark.createDataFrame([(5, 9), (9, 7)], "id_a bigint, id_b bigint")
    rev = spark.createDataFrame([(9, 5), (7, 9)], "id_a bigint, id_b bigint")
    as_dict = lambda df: {  # noqa: E731
        r.id: r.component for r in D.connected_components(df).collect()
    }
    assert as_dict(fwd) == as_dict(rev) == {5: 5, 7: 5, 9: 5}


def test_connected_components_empty_edges(spark):
    edges = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert D.connected_components(edges).count() == 0


def test_connected_components_strategies_agree(spark):
    """Seeded random graph: driver union-find and distributed propagation
    must label every node identically."""
    import random

    rng = random.Random(7)
    pairs = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(200), rng.randrange(200)) for _ in range(150)
            )
            if a != b
        }
    )
    edges = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    drv = {
        r.id: r.component
        for r in D.connected_components(edges, strategy="driver").collect()
    }
    dist = {
        r.id: r.component
        for r in D.connected_components(edges, strategy="distributed").collect()
    }
    assert drv == dist


def test_semdedup_keep_first_semantics(spark):
    """Hand-built corpus: b duplicates a (same direction), c is orthogonal
    — a kept (lowest id), b dropped, c kept.  d sits in another cluster
    with no neighbor above threshold."""
    from vector_database_api_spark.operators.dedup import semdedup_decision

    rows = [
        (0, [1.0, 0.0]),
        (1, [2.0, 0.0]),   # same direction as 0 -> cosine 1.0 -> drop
        (2, [0.0, 1.0]),   # orthogonal -> keep
        (3, [-5.0, 0.1]),  # other side; nearest centroid differs
    ]
    df = spark.createDataFrame(rows, "id bigint, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0])],
        "cluster_id bigint, cvec array<double>",
    )
    out = {
        r["id"]: (r["cluster_id"], r["keep"])
        for r in semdedup_decision(df, cents, threshold=0.95).collect()
    }
    assert out[0] == (0, True)
    assert out[1] == (0, False)
    assert out[2][1] is True
    assert out[3] == (1, True)


def test_semdedup_drop_iff_lower_id_neighbor(spark, sf_dir):
    """Registry-shape invariant on real data: an item is dropped iff it
    has a lower-id same-cluster neighbor at cosine >= threshold."""
    from vector_database_api_spark.operators.dedup import (
        assign_clusters,
        embedding_near_dup_pairs,
        semdedup_decision,
    )
    from vector_database_api_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    embs = load_table(spark, sf_dir, "embeddings")
    cents = embs.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("cvec")
    )
    out = semdedup_decision(
        embs, cents, threshold=0.4, vec_col="embedding", id_col="vec_id"
    )
    dropped = {r["id"] for r in out.filter(~F.col("keep")).collect()}
    assigned = assign_clusters(embs, cents, id_col="vec_id")
    with_cluster = embs.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    ).join(assigned, "id")
    pairs = embedding_near_dup_pairs(
        with_cluster, vec_col="v", id_col="id",
        block_col="cluster_id", threshold=0.4,
    )
    expected = {r["id_b"] for r in pairs.collect()}
    assert dropped == expected and dropped


def test_span_dup_profile_hand_built(spark):
    """Two docs share one exact 8-word span (each contributes 1
    duplicated window); the third doc is unique.  Doc-level dedup sees
    three distinct documents — span dedup must still find the
    boilerplate."""
    shared = "the quick brown fox jumps over the lazy"
    docs = spark.createDataFrame(
        [
            (0, "a", f"intro one two three {shared} alpha beta gamma delta"),
            (1, "a", f"totally different lead in {shared} and another tail"),
            (2, "b", "nothing here repeats anywhere at all in this row"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r["source"]: (r["n_docs"], r["n_windows"], r["n_dup_windows"])
        for r in D.span_dup_profile(docs, w=8).collect()
    }
    # doc0: 16 tokens -> 9 windows; doc1: 15 -> 8; doc2: 9 -> 2.
    # Exactly ONE window per doc matches cross-doc (the 8-gram equal to
    # `shared` itself; all other windows straddle differing context).
    assert got["a"] == (2, 17, 2), got
    assert got["b"] == (1, 2, 0), got

    hot = D.span_hot_spans(docs, w=8, top=5).collect()
    assert hot[0]["span"] == shared.replace(" ", "_")
    assert hot[0]["n_docs"] == 2 and hot[0]["n_occurrences"] == 2
