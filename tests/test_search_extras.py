"""Search-serving extras: snippets, field collapsing, autocut, RM3
pseudo-relevance feedback, fuzzy term matching.

The DuckDB oracles (tests/test_queries_registry.py) prove cross-engine
value equality on the driver tables; these tests pin the SEMANTICS against
independent Python recomputation on tiny hand-built corpora, plus the
degenerate shapes the oracle corpus never hits.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import vector_database_api_spark.queries as q
from vector_database_api_spark.queries import (
    _BM25_TERMS,
    _FUZZY_Q,
    _RM3_FB_K,
    _SNIPPET_W,
)


# ---------------------------------------------------------------------------
# snippet highlighting
# ---------------------------------------------------------------------------


def _best_window(tokens: list[str], terms: set[str], w: int) -> tuple[int, int]:
    """(1-based start, hits) of the best w-token window: max hits,
    earliest on ties — the query's documented contract."""
    n_wins = max(len(tokens) - w + 1, 1)
    best_s, best_h = 1, -1
    for s in range(1, n_wins + 1):
        h = sum(1 for t in tokens[s - 1 : s - 1 + w] if t in terms)
        if h > best_h:
            best_s, best_h = s, h
    return best_s, best_h


def test_snippet_matches_python_recomputation(spark, sf_dir):
    from vector_database_api_spark.sources.tables import load_table

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
        if r["text"] is not None
    }
    rows = q.spark_queries()["search_snippet_highlight"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 5
    terms = set(_BM25_TERMS)
    for r in rows:
        toks = texts[r["doc_id"]].lower().split(" ")
        s, h = _best_window(toks, terms, _SNIPPET_W)
        assert r["snip_start"] == s
        assert r["snip_hits"] == h
        assert r["snippet"] == " ".join(toks[s - 1 : s - 1 + _SNIPPET_W])
        # the snippet really contains that many query-term hits
        assert sum(1 for t in r["snippet"].split(" ") if t in terms) == h


def test_snippet_short_doc_shorter_than_window(spark):
    """A doc shorter than the window yields one window = the whole doc."""
    toks = "tiny vector doc".split(" ")
    s, h = _best_window(toks, set(_BM25_TERMS), _SNIPPET_W)
    assert (s, h) == (1, 1)


# ---------------------------------------------------------------------------
# field collapsing
# ---------------------------------------------------------------------------


def test_collapse_at_most_two_per_source(spark, sf_dir):
    rows = q.spark_queries()["collapsed_topk_by_source"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    per_src: dict[str, int] = {}
    for r in rows:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
        assert 1 <= r["src_rank"] <= 2
    assert all(v <= 2 for v in per_src.values())
    # output is the global-score order over the collapsed survivors
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_collapse_is_subset_of_uncollapsed_window(spark, sf_dir):
    """Every collapsed hit comes from the BM25 top-50 retrieval window."""
    top50 = {
        r["doc_id"]
        for r in q._bm25_scored(spark, sf_dir)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(50)
        .collect()
    }
    rows = q.spark_queries()["collapsed_topk_by_source"](spark, sf_dir).collect()
    assert {r["doc_id"] for r in rows} <= top50


# ---------------------------------------------------------------------------
# autocut
# ---------------------------------------------------------------------------


def test_autocut_cuts_at_largest_gap(spark, sf_dir):
    full = q._rrf_kw_leg(spark, sf_dir).collect()
    rows = q.spark_queries()["autocut_topk"](spark, sf_dir).collect()
    assert 0 < len(rows) <= len(full)
    # recompute the cut independently: largest gap, earliest on ties
    gaps = [full[i]["bm25"] - full[i + 1]["bm25"] for i in range(len(full) - 1)]
    if gaps:
        best = max(gaps)
        expected_cut = gaps.index(best) + 1
        assert len(rows) == expected_cut
    # the kept prefix is rank-exact
    for i, r in enumerate(rows):
        assert r["rnk"] == i + 1
        assert r["doc_id"] == full[i]["doc_id"]
        assert r["bm25"] == full[i]["bm25"]


def test_autocut_single_row_list():
    """One result -> no gaps -> keep everything (the loop never runs)."""
    rows = [{"bm25": 3.0, "doc_id": 1}]
    best_gap, cut = None, len(rows)
    for i in range(len(rows) - 1):
        g = rows[i]["bm25"] - rows[i + 1]["bm25"]
        if best_gap is None or g > best_gap:
            best_gap, cut = g, i + 1
    assert cut == 1


# ---------------------------------------------------------------------------
# RM3 pseudo-relevance feedback
# ---------------------------------------------------------------------------


def test_rm3_terms_match_python_recomputation(spark, sf_dir):
    from vector_database_api_spark.sources.tables import load_table

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
        if r["text"] is not None
    }
    fb = q._bm25_scored(spark, sf_dir).orderBy(
        F.desc("bm25"), "doc_id"
    ).limit(_RM3_FB_K).collect()
    # independent relevance-model weights over the feedback docs
    weights: dict[str, float] = {}
    fb_df: dict[str, int] = {}
    for r in fb:
        toks = texts[r["doc_id"]].lower().split(" ")
        dl = len(toks)
        seen = {}
        for t in toks:
            if len(t) >= 3 and t not in _BM25_TERMS:
                seen[t] = seen.get(t, 0) + 1
        for t, tf in seen.items():
            weights[t] = weights.get(t, 0.0) + tf / dl
            fb_df[t] = fb_df.get(t, 0) + 1
    cands = sorted(
        ((w, t) for t, w in weights.items() if fb_df[t] >= 2),
        key=lambda p: (-p[0], p[1]),
    )
    rows = q.spark_queries()["rm3_expansion_terms"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 5
    for row, (w, t) in zip(rows, cands):
        assert row["term"] == t
        assert row["fb_df"] == fb_df[t]
        assert row["rm3_weight"] == pytest.approx(w, abs=1e-6)
    # expansion never echoes the original query terms
    assert not ({r["term"] for r in rows} & set(_BM25_TERMS))


def test_rm3_expanded_search_scores_positive_and_ranked(spark, sf_dir):
    rows = q.spark_queries()["rm3_expanded_search"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    scores = [r["rm3_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    assert all(1 <= r["n_terms"] <= 5 for r in rows)


# ---------------------------------------------------------------------------
# fuzzy term matching
# ---------------------------------------------------------------------------


def _trigrams(s: str) -> set[str]:
    return {s[i : i + 3] for i in range(len(s) - 2)}


def test_fuzzy_match_recovers_typo_target(spark, sf_dir):
    """'vectr' is a typo of 'vector'; the corpus contains 'vector', so it
    must surface, with the exact trigram-Jaccard score."""
    rows = q.spark_queries()["fuzzy_term_match"](spark, sf_dir).collect()
    by_term = {r["term"]: r for r in rows}
    assert "vector" in by_term
    qt = _trigrams(_FUZZY_Q)
    vt = _trigrams("vector")
    expected = len(qt & vt) / len(qt | vt)
    assert by_term["vector"]["jac"] == pytest.approx(expected, abs=1e-6)
    for r in rows:
        ct = _trigrams(r["term"])
        assert r["jac"] == pytest.approx(
            len(qt & ct) / len(qt | ct), abs=1e-6
        )
        assert r["jac"] > 0


def test_fuzzy_scores_descend(spark, sf_dir):
    rows = q.spark_queries()["fuzzy_term_match"](spark, sf_dir).collect()
    keys = [(-r["jac"], -r["df"], r["term"]) for r in rows]
    assert keys == sorted(keys)


# ---------------------------------------------------------------------------
# near-dup-collapsed results + proximity boost
# ---------------------------------------------------------------------------


def test_near_dup_collapse_one_per_component(spark, sf_dir):
    rows = q.spark_queries()["collapsed_topk_by_near_dup"](
        spark, sf_dir
    ).collect()
    assert 0 < len(rows) <= 10
    comps = [r["component"] for r in rows]
    assert len(comps) == len(set(comps))  # at most one doc per cluster
    # each kept doc is the best-scoring member of its cluster within the
    # retrieval window (smallest doc_id on score ties)
    top50 = q._bm25_scored(spark, sf_dir).orderBy(
        F.desc("bm25"), "doc_id"
    ).limit(50).collect()
    comp_map = {
        r["id"]: r["component"]
        for r in q._cached_simhash_components(spark, sf_dir).collect()
    }
    by_comp = {}
    for r in top50:
        c = comp_map.get(r["doc_id"], r["doc_id"])
        cur = by_comp.get(c)
        if cur is None or (r["bm25"], -r["doc_id"]) > (cur[1], -cur[0]):
            by_comp[c] = (r["doc_id"], r["bm25"])
    for r in rows:
        assert by_comp[r["component"]][0] == r["doc_id"]


def test_proximity_boost_semantics(spark, sf_dir):
    from vector_database_api_spark.sources.tables import load_table

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
        if r["text"] is not None
    }
    rows = q.spark_queries()["proximity_boosted_topk"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        toks = texts[r["doc_id"]].lower().split(" ")
        pa = [i for i, t in enumerate(toks) if t == "vector"]
        pb = [i for i, t in enumerate(toks) if t == "hash"]
        if pa and pb:
            dmin = min(abs(x - y) for x in pa for y in pb)
            assert r["prox"] == pytest.approx(1.0 / (1.0 + dmin), abs=1e-6)
        else:
            assert r["prox"] == 0.0
        assert r["score"] == pytest.approx(r["bm25"] + r["prox"], abs=2e-6)
    # ranking is by the boosted total
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_snippet_terms_with_quotes_and_empty_terms(spark):
    """r6 ADVICE (medium): terms are user-supplied — a quote/backslash
    term must highlight, not raise ParseException (terms were string-
    interpolated into F.expr), and empty terms must short-circuit to
    snip_hits=0 instead of producing invalid ``x IN ()``."""
    from vector_database_api_spark.operators.presentation import best_snippet

    hits = spark.createDataFrame(
        [(1, "meet o'brien and the back\\slash crew today")],
        "id int, text string",
    )
    out = best_snippet(hits, ["o'brien", "back\\slash"], 5, "id").collect()
    assert len(out) == 1
    assert out[0]["snip_hits"] == 2
    assert "o'brien" in out[0]["snippet"]

    # SQL injection attempt rides along as an inert literal
    inj = best_snippet(
        hits, ["')) FROM x; DROP TABLE y; --"], 3, "id"
    ).collect()
    assert inj[0]["snip_hits"] == 0

    empty = best_snippet(hits, [], 3, "id").collect()
    assert len(empty) == 1
    assert empty[0]["snip_hits"] == 0
    assert empty[0]["snip_start"] == 1
