"""Hybrid-retrieval family: BM25 keyword scoring, RRF fusion, MMR.

The DuckDB oracles prove cross-engine value equality; these tests pin the
semantics against independent Python recomputation on the small SF and the
plan-level contracts (no explode / no corpus shuffle in the BM25 scan leg).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import vector_database_api_spark.queries as q
from vector_database_api_spark.queries import (
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    _bm25_scored,
)
from vector_database_api_spark.sources.tables import load_table


def _tokenize(text: str) -> list[str]:
    return text.lower().split(" ")


def test_bm25_matches_python_recomputation(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    toks = {d: _tokenize(t) for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        t: sum(1 for tk in toks.values() if t in tk) for t in _BM25_TERMS
    }
    rows = q.spark_queries()["bm25_keyword_topk"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    prev = None
    for r in rows:
        expected = 0.0
        for t in _BM25_TERMS:
            tf = toks[r["doc_id"]].count(t)
            assert tf == r[f"tf_{t}"]
            if tf:
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                dl = len(toks[r["doc_id"]])
                expected += (
                    idf
                    * (tf * (_BM25_K1 + 1.0))
                    / (tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl))
                )
        assert r["bm25"] == pytest.approx(expected, abs=2e-6)
        if prev is not None:  # descending, doc_id tie-break
            assert (prev["bm25"], -prev["doc_id"]) >= (r["bm25"], -r["doc_id"])
        prev = r


def test_bm25_scan_leg_has_no_explode_and_no_corpus_shuffle(spark, sf_dir):
    plan = _bm25_scored(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # term frequencies via HOFs, not explode
    # the only shuffle feeds the 5-scalar stats aggregate (SinglePartition);
    # the broadcast exchange returning those scalars is expected
    for line in plan.splitlines():
        if "ShuffleExchange" in line or "Exchange hashpartitioning" in line:
            assert "SinglePartition" in line, line


def test_hybrid_rrf_scores_follow_from_ranks(spark, sf_dir):
    rows = q.spark_queries()["hybrid_rrf_fusion"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        exp = 0.0
        if r["r_kw"] is not None:
            assert 1 <= r["r_kw"] <= 20
            exp += 1.0 / (60 + r["r_kw"])
        if r["r_vec"] is not None:
            assert 1 <= r["r_vec"] <= 20
            exp += 1.0 / (60 + r["r_vec"])
        assert r["rrf"] == pytest.approx(exp, abs=1e-6)
    # both legs contribute somewhere in the fused set
    assert any(r["r_kw"] is not None for r in rows)
    assert any(r["r_vec"] is not None for r in rows)


def test_mmr_greedy_invariants(spark, sf_dir):
    out = q.spark_queries()["mmr_diversified_topk"](spark, sf_dir).collect()
    assert [r["mmr_rank"] for r in out] == [1, 2, 3, 4, 5]
    ids = [r["doc_id"] for r in out]
    assert len(set(ids)) == 5
    # first pick is the relevance argmax: its recorded score is 0.7*rel and
    # the largest any pick can attain; later picks pay a diversity penalty
    assert out[0]["mmr"] == max(r["mmr"] for r in out)
    # every pick must come from the cosine top-20 pool of vec_id=0
    embs = load_table(spark, sf_dir, "embeddings")
    qv = embs.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    from vector_database_api_spark.functions.vector import cosine_similarity

    pool = {
        r["vec_id"]
        for r in embs.crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("qv")).alias("rel"),
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(20)
        .collect()
    }
    assert set(ids) <= pool


def test_phrase_search_matches_substring_scan(spark, sf_dir):
    """Every doc the positional join finds must actually contain the
    phrase as a substring (single-space-tokenized corpus), with the
    same occurrence count as a direct regex count."""
    import re

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    expected = {}
    for d, t in docs.items():
        toks = t.lower().split(" ")
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "vector" and toks[i + 1] == "hash"
        )
        if n:
            first = next(
                i
                for i in range(len(toks) - 1)
                if toks[i] == "vector" and toks[i + 1] == "hash"
            )
            expected[d] = (n, first + 1)  # 1-based
    rows = q.spark_queries()["phrase_search_positional"](spark, sf_dir).collect()
    got = {r["doc_id"]: (r["n_hits"], r["first_pos"]) for r in rows}
    assert got == expected
    # sanity: a regex over the raw text agrees on the count
    for d, (n, _) in expected.items():
        assert len(re.findall(r"(?=\bvector hash\b)", docs[d].lower())) == n


def test_search_facet_counts_covers_exactly_top50(spark, sf_dir):
    rows = q.spark_queries()["search_facet_counts"](spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    assert total == min(50, n_emb)
    for r in rows:
        # mean rounds to 4dp, max to 6dp — allow the rounding gap
        assert r["mean_sim"] <= r["max_sim"] + 5e-5


def test_streaming_bm25_stats_match_batch_and_replay(spark, tmp_path, sf_dir):
    """Streamed term-statistics artifact == batch recomputation over the
    same corpus, and a crash-replay of a committed batch is a no-op
    (dynamic partition overwrite rewrites identical content)."""
    import vector_database_api_spark.streaming.maintenance as M

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    for lo, hi in [(0, 20), (20, 35), (35, 10**9)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).repartition(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stats_dir = str(tmp_path / "bm25_stats")
    M.incremental_bm25_stats_maintenance(
        spark,
        M.read_event_stream(spark, src, schema),
        stats_dir,
        str(tmp_path / "ckpt"),
    ).awaitTermination(300)

    terms, corpus = M.bm25_stats_serving(spark, stats_dir)
    got_terms = {
        r["term"]: (r["df"], r["tf"]) for r in terms.collect()
    }
    got_corpus = corpus.collect()[0]

    # batch recomputation
    toks = {
        r["doc_id"]: r["text"].lower().split(" ") for r in docs.collect()
    }
    want_terms: dict[str, list[int]] = {}
    for tk in toks.values():
        seen = set()
        for t in tk:
            e = want_terms.setdefault(t, [0, 0])
            e[1] += 1
            if t not in seen:
                e[0] += 1
                seen.add(t)
    assert got_terms == {t: (d, f) for t, (d, f) in want_terms.items()}
    assert got_corpus["n_docs"] == len(toks)
    assert got_corpus["avgdl"] == pytest.approx(
        sum(len(t) for t in toks.values()) / len(toks)
    )

    # crash-replay: reprocess batch 0's file content under the same id
    proc = M.bm25_stats_batch_processor(stats_dir)
    b0 = docs.filter(F.col("doc_id") < 20)
    proc(b0, 0)
    terms2, corpus2 = M.bm25_stats_serving(spark, stats_dir)
    assert {
        r["term"]: (r["df"], r["tf"]) for r in terms2.collect()
    } == got_terms
    assert corpus2.collect()[0]["n_docs"] == got_corpus["n_docs"]


def test_bm25_null_text_cross_engine(spark):
    """r5 ADVICE regression: a NULL-text row must not skew n_docs/avgdl
    differently per engine (Spark's size(split(NULL)) is -1; DuckDB's
    len(string_split(NULL)) is NULL and ignored by avg).  Both engines
    now exclude NULL text, so scores over a NULL-bearing corpus are
    bit-identical.  Driver testdata carries no NULLs, so the sweep
    cannot cover this — pinned here on a synthetic corpus."""
    import duckdb

    from vector_database_api_spark.queries import (
        _BM25_SCORED_CTES,
        _bm25_scored_docs,
    )

    rows = [
        (1, "dup vector hash dup"),
        (2, "vector vector plain words here"),
        (3, None),
        (4, "hash of the vector dup table"),
        (5, "no query terms at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dl"], r["bm25"])
        for r in _bm25_scored_docs(docs).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {
        d: (dl, bm25)
        for d, dl, bm25 in con.sql(
            f"WITH {_BM25_SCORED_CTES} SELECT doc_id, dl, bm25 FROM scored"
        ).fetchall()
    }
    assert set(got) == set(want) == {1, 2, 4}  # NULL + no-hit rows absent
    for d in got:
        assert got[d][0] == want[d][0], d
        assert got[d][1] == want[d][1], d  # bit-exact doubles
    # the corpus scalars exclude the NULL row on BOTH engines: n_docs=4
    n_docs = con.sql(
        f"WITH {_BM25_SCORED_CTES} SELECT n_docs FROM stats"
    ).fetchone()[0]
    assert n_docs == 4


def test_maxp_matches_python_recomputation(spark, sf_dir):
    """maxP passage retrieval pinned against an independent Python
    replay: same windowing (32/16), chunk-level BM25 statistics, and
    max-over-chunks doc score with the min best-start tie-break."""
    import math as _math

    from vector_database_api_spark.queries import (
        _BM25_TERMS,
        _MAXP_STRIDE,
        _MAXP_WIN,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
        if r["text"] is not None
    }
    chunks = []  # (doc_id, start, tokens)
    for d, t in docs.items():
        ws = t.lower().split(" ")
        for s in range(1, len(ws) + 1, _MAXP_STRIDE):
            chunks.append((d, s, ws[s - 1 : s - 1 + _MAXP_WIN]))
    n = len(chunks)
    avgdl = sum(len(c) for _, _, c in chunks) / n
    df = {
        t: sum(1 for _, _, c in chunks if t in c) for t in _BM25_TERMS
    }

    def contrib(tf, dft, dl):
        if tf == 0:
            return 0.0
        idf = _math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
        return idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    best: dict = {}
    for d, s, c in chunks:
        tfs = {t: sum(1 for w in c if w == t) for t in _BM25_TERMS}
        if sum(tfs.values()) == 0:
            continue
        score = sum(contrib(tfs[t], df[t], len(c)) for t in _BM25_TERMS)
        cur = best.get(d)
        hit_count = (cur[2] if cur else 0) + 1
        if cur is None or score > cur[0] or (score == cur[0] and s < cur[1]):
            best[d] = (score, s, hit_count)
        else:
            best[d] = (cur[0], cur[1], hit_count)
    want = sorted(
        ((d, v[1], v[2], v[0]) for d, v in best.items()),
        key=lambda x: (-x[3], x[0]),
    )[:10]
    got = q.spark_queries()["maxp_passage_topk"](spark, sf_dir).collect()
    assert [
        (r["doc_id"], r["best_start"], r["n_hit_chunks"]) for r in got
    ] == [(d, s, h) for d, s, h, _ in want]
    for r, (_, _, _, sc) in zip(got, want):
        assert r["maxp"] == pytest.approx(sc, abs=1e-6)


def test_maxscore_pruning_is_lossless_and_effective(spark, sf_dir):
    """MaxScore == plain postings top-10 row-for-row (losslessness is
    also hash-proven by the shared oracle), and on this corpus the
    pruning threshold actually removes candidate docs: theta from the
    rare term's top-10 exceeds the common-terms-only upper-bound sum,
    so docs matching only common terms never reach full scoring."""
    plain = q.spark_queries()["bm25_postings_topk"](spark, sf_dir).collect()
    pruned = q.spark_queries()["bm25_maxscore_topk"](spark, sf_dir).collect()
    assert [tuple(r) for r in pruned] == [tuple(r) for r in plain]

    ubs = q._cached_bm25_maxscores(spark, sf_dir).collect()[0]
    ess = max(_BM25_TERMS, key=lambda t: ubs[f"ub_{t}"])
    assert ess == "dup"  # the rare term dominates the bounds
    # the non-essential bound sum is what a common-terms-only doc can
    # reach; with >=10 essential docs theta sits above it -> pruning
    # fires (sf0.001 has ~25 'dup' docs, so the guard holds at test SF)
    piv = q._bm25_postings_pivoted(spark, sf_dir)
    n_ess = piv.filter(f"tf_{ess} > 0").count()
    if n_ess >= 10:
        theta = min(r["bm25"] for r in plain[: 10]) if len(plain) >= 10 else None
        common_ub = sum(
            ubs[f"ub_{t}"] for t in _BM25_TERMS if t != ess
        )
        assert theta is None or theta > common_ub + 1e-6


def test_blockmax_bounds_tighter_and_survivors_subset(spark, sf_dir):
    """Block-Max WAND == plain postings top-10 row-for-row (losslessness
    is also hash-proven by the shared oracle); per-block bounds are
    pointwise <= the MaxScore artifact's corpus-wide bounds; and the
    BMW survivor set is a SUBSET of the MaxScore survivor set (same
    theta, tighter-or-equal bounds)."""
    plain = q.spark_queries()["bm25_postings_topk"](spark, sf_dir).collect()
    bmw = q.spark_queries()["bm25_blockmax_topk"](spark, sf_dir).collect()
    assert [tuple(r) for r in bmw] == [tuple(r) for r in plain]

    bm = q._cached_bm25_blockmax(spark, sf_dir).collect()
    ubs = q._cached_bm25_maxscores(spark, sf_dir).collect()[0]
    for row in bm:
        for t in _BM25_TERMS:
            assert row[f"bm_{t}"] <= ubs[f"ub_{t}"] + 1e-12

    # replay both prune predicates over the candidate set in Python:
    # identical theta, bound_blockmax(doc) <= bound_maxscore(doc)
    piv = q._bm25_postings_pivoted(spark, sf_dir).collect()
    theta_rows = sorted(
        (r["bm25"] for r in q._bm25_scored(spark, sf_dir)
         .filter("tf_dup > 0").collect()),
        reverse=True,
    )[:10]
    theta = theta_rows[9] if len(theta_rows) >= 10 else float("-inf")
    blockmax = {r["block"]: r for r in bm}
    ms_surv, bmw_surv = set(), set()
    for r in piv:
        blk = blockmax[r["doc_id"] // q._BMW_BLOCK]
        ms_b = sum(ubs[f"ub_{t}"] for t in _BM25_TERMS if r[f"tf_{t}"] > 0)
        bw_b = sum(blk[f"bm_{t}"] for t in _BM25_TERMS if r[f"tf_{t}"] > 0)
        assert bw_b <= ms_b + 1e-12
        if ms_b >= theta - 1e-6:
            ms_surv.add(r["doc_id"])
        if bw_b >= theta - 1e-6:
            bmw_surv.add(r["doc_id"])
    assert bmw_surv <= ms_surv


def test_ql_dirichlet_served_matches_registry(spark, sf_dir):
    """The served Lucene-decomposition QL scorer (ql_dirichlet_search:
    matched-postings term + dl-only closed form) reproduces the
    oracle-checked registry twin's direct-formula ranking and scores —
    pinning the decomposition algebra end-to-end."""
    from vector_database_api_spark.operators import bm25 as B

    docs = load_table(spark, sf_dir, "documents")
    postings, doclens, stats = B.build_bm25_index(docs, id_col="doc_id")
    row = stats.collect()[0]
    total = float(row["n_docs"]) * float(row["avgdl"])
    got = B.ql_dirichlet_search(
        postings, doclens, total, list(_BM25_TERMS), k=10
    ).collect()
    want = q.spark_queries()["ql_dirichlet_topk"](spark, sf_dir).collect()
    assert [r["id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert abs(g["score"] - w["ql"]) < 2e-6


def test_impact_pruned_index_quality_and_size(spark, sf_dir):
    """Static uniform pruning (bm25_impact_pruned_topk): the oracle
    proves the pruned index is built bit-exactly; this pins the LOSSY
    trade it buys — the kept-postings fraction is ~the configured
    median cut (half the index) while the pruned top-10 still overlaps
    the exact ranking on >= 8 of 10 docs (measured 9/10 at sf0.001 and
    sf0.01)."""
    full = [
        r["doc_id"]
        for r in q.spark_queries()["bm25_keyword_topk"](spark, sf_dir).collect()
    ]
    pruned = [
        r["doc_id"]
        for r in q.spark_queries()["bm25_impact_pruned_topk"](
            spark, sf_dir
        ).collect()
    ]
    assert len(set(full) & set(pruned)) >= 8

    stats = q._cached_bm25_stats(spark, sf_dir)
    base = q._bm25_base(load_table(spark, sf_dir, "documents"))
    impacts = base.crossJoin(F.broadcast(stats)).select(
        *[
            F.expr(q._bm25_contrib_sql(t)).alias(f"c_{t}")
            for t in _BM25_TERMS
        ]
    )
    unpiv = impacts.selectExpr(
        "stack(3, "
        + ", ".join(f"'{t}', c_{t}" for t in _BM25_TERMS)
        + ") AS (term, c)"
    ).filter("c > 0")
    tau = unpiv.agg(
        F.expr(f"percentile(c, {q._IMPACT_Q})").alias("tau")
    ).collect()[0]["tau"]
    total = unpiv.count()
    kept = unpiv.filter(F.col("c") >= tau).count()
    assert 0.45 <= kept / total <= 0.56


def test_ltr_feature_matrix_null_evidence_and_leg_coverage(spark, sf_dir):
    """The LTR export keeps missing evidence NULL (vector-recalled docs
    without a term hit carry no bm25/ql) and covers both first-stage
    legs: the keyword top-1 and the dense top-1 are both rows."""
    rows = q.spark_queries()["ltr_feature_matrix"](spark, sf_dir).collect()
    by_id = {r["doc_id"]: r for r in rows}
    kw_top = q.spark_queries()["bm25_keyword_topk"](spark, sf_dir).collect()
    vec_top = q.spark_queries()["knn_cosine_topk"](spark, sf_dir).collect()
    assert kw_top[0]["doc_id"] in by_id
    assert int(vec_top[0]["id"]) in by_id
    # every row has the dense + prior features; bm25/ql are NULL exactly
    # for the no-term-hit docs (hit docs carry both)
    for r in rows:
        assert r["cos_sim"] is not None and r["n_chars"] is not None
        has_hit = (r["tf_dup"] + r["tf_vector"] + r["tf_hash"]) > 0
        assert (r["bm25"] is not None) == has_hit
        assert (r["ql"] is not None) == has_hit
    # NULL-production itself is hash-proven by the shared oracle (both
    # engines LEFT-JOIN the same candidate pool); at this SF the dense
    # top-20 may happen to all contain a query term, so no hard
    # at-least-one-NULL assertion — the equivalence above is the pin.


def test_ir_eval_matches_python_trec_eval(spark, sf_dir):
    """The IR evaluation suite must agree with an independent pure-Python
    trec_eval-style recomputation: qrels rebuilt from the raw corpus
    (rel = #query terms present), run read back from bm25_batch_topk,
    every metric recomputed with float arithmetic from scratch."""
    from vector_database_api_spark.queries import _BATCH_QUERIES

    docs = {
        r["doc_id"]: (r["text"] or "").lower().split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
        if r["text"] is not None
    }
    run = {}
    for r in q.spark_queries()["bm25_batch_topk"](spark, sf_dir).collect():
        run.setdefault(r["qid"], []).append((r["rank"], r["doc_id"]))
    got = {
        r["qid"]: r
        for r in q.spark_queries()["ir_eval_metrics"](spark, sf_dir).collect()
    }
    assert set(got) == {qid for qid, _ in _BATCH_QUERIES}
    for qid, terms in _BATCH_QUERIES:
        rel = {
            d: sum(1 for t in terms if t in tk) for d, tk in docs.items()
        }
        graded = sorted((g for g in rel.values() if g > 0), reverse=True)
        n_rel = sum(1 for g in rel.values() if g >= 2)
        ranked = [rel[d] for _, d in sorted(run[qid])]
        assert len(ranked) == 10
        dcg = sum(
            (2.0**g - 1.0) / math.log(i + 2) for i, g in enumerate(ranked)
        )
        idcg = sum(
            (2.0**g - 1.0) / math.log(i + 2)
            for i, g in enumerate(graded[:10])
        )
        hits = [1 if g >= 2 else 0 for g in ranked]
        mrr = next(
            (1.0 / (i + 1) for i, h in enumerate(hits) if h), 0.0
        )
        ap = (
            sum(
                sum(hits[: i + 1]) / (i + 1.0)
                for i, h in enumerate(hits)
                if h
            )
            / min(n_rel, 10)
            if n_rel
            else 0.0
        )
        m = got[qid]
        assert m["n_rel"] == n_rel
        assert m["ndcg10"] == pytest.approx(dcg / idcg if idcg else 0.0, abs=2e-6)
        assert m["mrr10"] == pytest.approx(mrr, abs=2e-6)
        assert m["map10"] == pytest.approx(ap, abs=2e-6)
        assert m["p10"] == pytest.approx(sum(hits) / 10.0, abs=2e-6)
        assert m["recall10"] == pytest.approx(
            sum(hits) / n_rel if n_rel else 0.0, abs=2e-6
        )


def test_ir_metric_exprs_degenerate_cases(spark):
    """The shared metric expressions on hand-built corner rows: a run
    with zero relevant docs scores 0 everywhere; a perfect run (all
    grade-3, ideal ordering) scores 1.0 on every normalized metric;
    short runs (rel_r NULL past the result count) are treated as
    non-relevant padding."""
    from vector_database_api_spark.queries import _IR_METRICS

    cols = ", ".join(f"rel_{r} int" for r in range(1, 11))
    schema = f"qid int, {cols}, n3 bigint, n2 bigint, n1 bigint, n_rel bigint"
    rows = [
        # no relevant docs anywhere: metrics all zero (incl. guard paths)
        tuple([1] + [0] * 10 + [0, 0, 5, 0]),
        # perfect: 10 grade-3 results, exactly 10 grade-3 docs exist
        tuple([2] + [3] * 10 + [10, 0, 0, 10]),
        # short run: 2 results then NULL padding, 2 relevant total
        tuple([3, 3, 2] + [None] * 8 + [1, 1, 0, 2]),
    ]
    df = spark.createDataFrame(rows, schema)
    out = {
        r["qid"]: r
        for r in df.selectExpr(
            "qid", *[f"{e} AS {n}" for n, e in _IR_METRICS.items()]
        ).collect()
    }
    z = out[1]
    assert (z["ndcg10"], z["mrr10"], z["map10"], z["p10"], z["recall10"]) == (
        0.0, 0.0, 0.0, 0.0, 0.0,
    )
    p = out[2]
    assert (p["ndcg10"], p["mrr10"], p["map10"], p["p10"], p["recall10"]) == (
        1.0, 1.0, 1.0, 1.0, 1.0,
    )
    s = out[3]
    assert s["mrr10"] == 1.0
    assert s["p10"] == pytest.approx(0.2)
    assert s["recall10"] == pytest.approx(1.0)
    assert s["map10"] == pytest.approx(1.0)  # both relevant, found at 1 and 2
    assert s["ndcg10"] == pytest.approx(1.0)  # ideal order for its qrels


def test_batch_run_rank_matches_plain_window_to_20(spark, sf_dir):
    """r9: the batch run's rank column is a grouped_topk top-20
    left-joined onto the unranked scored frame (the full per-qid
    ranking window it replaced was corpus-scale on this tiny-vocab
    corpus — every batch term matches ~77% of docs).  Pin the refactor
    row-for-row against the window form: ranks 1..20 identical
    (including (bm25 DESC, doc_id) tie-breaks at the 20/21 boundary),
    NULL beyond, and the unranked rel/bm25 rows unchanged."""
    from pyspark.sql import Window

    scored, run = q._bm25_batch_frames(spark, sf_dir)
    w = Window.partitionBy("qid").orderBy(F.desc("bm25"), "doc_id")
    expect = (
        scored.withColumn("_wr", F.row_number().over(w))
        .withColumn(
            "rank", F.when(F.col("_wr") <= 20, F.col("_wr"))
        )
        .select("qid", "doc_id", "bm25", "rel", "rank")
    )
    got_rows = sorted(map(tuple, run.collect()))
    exp_rows = sorted(map(tuple, expect.collect()))
    assert got_rows == exp_rows
    assert any(r[-1] is None for r in got_rows)  # unranked tail exists
    assert sum(1 for r in got_rows if r[-1] is not None) == 6 * 20
