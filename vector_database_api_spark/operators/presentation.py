"""Result-presentation transforms over BOUNDED retrieval windows.

Snippet highlighting and field collapsing run on the top-k (or top-pool)
output of a search — a frame whose row count is bounded by the retrieval
window, never the corpus — so their windows/explodes are constant-size
work regardless of corpus scale (the same bounded-pool adjudication as
`operators/rerank.py`).  Shared verbatim by the oracle-checked registry
queries (`queries.py::search_snippet_highlight`,
`queries.py::collapsed_topk_by_source`) and the served paths
(`service.py::search_with_snippets`, `service.py::search_collapsed`).

The reference returns raw chunk lists only (search_service.py:112-153);
these are the presentation layers production engines add on top.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def best_snippet(
    hits: DataFrame,
    terms: Sequence[str],
    window: int,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Append (snip_start, snip_hits, snippet) to each row of ``hits``:
    the best ``window``-token highlight — the window with the most
    query-term hits, earliest (smallest 1-based start) on ties.

    ``hits`` must be retrieval-window-bounded (a top-k joined back to its
    text): window enumeration explodes O(doc_len) rows PER HIT, and the
    per-hit argmax is a row_number window partitioned by ``id_col`` —
    bounded by one document's windows, a BOUNDED_WINDOW_KEYS-compliant
    partition.  All other columns pass through.  Rows with NULL
    ``text_col`` are dropped (nothing to highlight).

    ``terms`` are USER-SUPPLIED (service.py::search_with_snippets passes
    the tokenized query text), so they are bound as an array of literal
    columns — never interpolated into expression text: a first cut
    string-built ``x IN ('t1', 't2')``, which raised ParseException on a
    quote/backslash in a term ("o'brien") and let crafted terms inject
    arbitrary SQL into the expression (r6 ADVICE).  Empty ``terms``
    short-circuits to ``snip_hits = 0`` (every window ties; the earliest
    wins), where the interpolated form produced invalid ``x IN ()``."""
    window = int(window)
    keep = [c for c in hits.columns if c != text_col]
    staged_cols = [F.split(F.lower(F.col(text_col)), " ", -1).alias("_tk")]
    if terms:
        staged_cols.append(F.array(*[F.lit(t) for t in terms]).alias("_terms"))
    staged = hits.filter(F.col(text_col).isNotNull()).select(*keep, *staged_cols)
    hits_expr = (
        F.expr(
            f"size(filter(slice(_tk, _s, {window}), "
            "x -> array_contains(_terms, x)))"
        )
        if terms
        else F.lit(0)
    )
    wins = staged.select(
        *keep,
        "_tk",
        *(["_terms"] if terms else []),
        F.explode(
            F.expr(f"sequence(1, greatest(size(_tk) - {window - 1}, 1))")
        ).alias("_s"),
    ).select(
        *keep,
        "_s",
        hits_expr.cast("long").alias("snip_hits"),
        F.expr(f"array_join(slice(_tk, _s, {window}), ' ')").alias("snippet"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("snip_hits"), "_s")
    return (
        wins.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *keep,
            F.col("_s").cast("long").alias("snip_start"),
            "snip_hits",
            "snippet",
        )
    )


def collapse_topk(
    tagged: DataFrame,
    key_col: str,
    score_col: str,
    id_col: str,
    per_key: int,
    k: int,
    rank_col: str = "collapse_rank",
) -> DataFrame:
    """Field collapsing (Elasticsearch `collapse`) over a retrieval
    window: keep at most ``per_key`` rows per ``key_col`` value (ranked
    by ``score_col`` DESC, ``id_col`` ASC), then the global top ``k`` in
    score order.  ``tagged`` must be the retrieval WINDOW (top-N), not
    the corpus — the per-key row_number window is then bounded by the
    window size regardless of how skewed the key is in the corpus (the
    window-skew policy holds by construction).  NULL keys collapse
    together (row_number treats NULL as one partition): an engine
    collapsing on a missing field groups the missing docs, same as
    Elasticsearch."""
    w = Window.partitionBy(key_col).orderBy(F.desc(score_col), id_col)
    return (
        tagged.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= per_key)
        .orderBy(F.desc(score_col), id_col)
        .limit(k)
    )
