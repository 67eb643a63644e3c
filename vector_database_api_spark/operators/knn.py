"""Brute-force filtered kNN top-k — the reference's ``_fallback_search``.

Reference: ``/root/reference/app/services/search_service.py:112-153`` —
score every embedded chunk against the query vector (cosine), sort
descending, slice k.  Filter-then-search semantics (search_service.py:103-105,
135-145): metadata filters are applied BEFORE scoring/top-k, so the k results
are k *filtered* results (possibly fewer).

Spark shape:

- the query vector arrives as a one-row DataFrame broadcast into a cross
  join (no shuffle of the big side — each partition scores its rows against
  the broadcast copy);
- scoring is the JVM-side HOF expression from ``functions.vector``;
- ``ORDER BY score DESC, id LIMIT k`` is planned by Catalyst as
  ``TakeOrderedAndProject``: a per-partition top-k heap + single merge on the
  driver — O(n) per partition, no global sort, no full shuffle.  This beats
  the reference's full `sort()[:k]` asymptotically and is the shape that
  survives 100 TB (each of 1000 executors returns only k rows).
- ties broken by id: the reference relies on Python sort stability over dict
  order (nondeterministic across runs, SURVEY §2.7 T1); we make ordering
  total and deterministic.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_api_spark.functions.vector import (
    dot_product,
    euclidean_distance,
    norm2,
)
from vector_database_api_spark.operators.filters import (
    apply_metadata_filters,
    library_scope,
)


def knn_brute_force(
    chunks: DataFrame,
    query: DataFrame,
    k: int = 5,
    id_col: str = "id",
    vec_col: str = "embedding",
    query_vec_col: str = "query_embedding",
    metric: str = "cosine",
    library_id: str | None = None,
    metadata_filters: dict[str, Any] | None = None,
    after: tuple | None = None,
) -> DataFrame:
    """Top-k rows of ``chunks`` nearest to the single row of ``query``.

    ``query`` must have exactly one row holding ``query_vec_col``; it is
    broadcast, so the big side never shuffles.  Returns the chunk id plus
    ``similarity`` and ``distance`` columns (reference SearchResult shape,
    models.py:123-128).

    ``after`` = (score, id) keyset cursor: only rows STRICTLY after that
    position in the ranking order are returned (score must be the exact
    double a previous page returned; cosine pages on similarity,
    euclidean on distance).  The filter runs before the top-k, so page N
    costs the same single scan + TakeOrderedAndProject as page 1 — O(k),
    not the O(N*k) of OFFSET deep paging.
    """
    scoped = library_scope(chunks, library_id)
    scoped = apply_metadata_filters(scoped, metadata_filters)
    scoped = scoped.filter(F.col(vec_col).isNotNull())

    # Stage the norms and dot once per row instead of inlining
    # cosine_similarity()'s full expression: interpreted HOFs disable
    # whole-stage codegen and the inline form re-evaluates norm2(vec)
    # and norm2(query) in both the zero-guard and the denominator (and
    # the query norm is a constant — it belongs on the 1-row broadcast
    # side, computed once before the BroadcastExchange, not re-reduced
    # per corpus row).  CollapseProject keeps the stage because _na2 and
    # _qn2 are non-cheap and referenced twice.  Bit-identical values:
    # same operations in the same order as cosine_similarity().
    qdf = query.select(
        F.col(query_vec_col), norm2(query_vec_col).alias("_qn2")
    )
    staged = scoped.crossJoin(F.broadcast(qdf)).select(
        F.col(id_col),
        F.col("_qn2"),
        norm2(vec_col).alias("_na2"),
        dot_product(vec_col, query_vec_col).alias("_dot"),
        euclidean_distance(vec_col, query_vec_col).alias("distance"),
    )
    sim = (
        F.when(
            (F.col("_na2") == F.lit(0.0)) | (F.col("_qn2") == F.lit(0.0)),
            F.lit(0.0),
        )
        .otherwise(F.col("_dot") / (F.sqrt(F.col("_na2")) * F.sqrt(F.col("_qn2"))))
        .alias("similarity")
    )
    # a stored embedding with a NULL ELEMENT yields NULL dot/norm and
    # hence NULL similarity AND distance (the isNotNull filter above only
    # screens whole-array NULLs).  Drop such rows before ranking: the
    # desc orderBy ranks NULLs last, so they only surfaced when a
    # library had fewer than k healthy chunks — accident, not semantics
    # — and the batch dense leg (service._batch_dense_leg) already
    # drops them for grouped_topk's non-NULL contract.  Filtering here
    # keeps single-request and batch results identical in the
    # degraded-embedding corner (r9 ADVICE).
    scored = staged.select(F.col(id_col), sim, F.col("distance")).filter(
        F.col("similarity").isNotNull()
    )

    if after is not None:
        a_score, a_id = after
        if metric == "cosine":
            scored = scored.filter(
                (F.col("similarity") < F.lit(float(a_score)))
                | (
                    (F.col("similarity") == F.lit(float(a_score)))
                    & (F.col(id_col) > F.lit(a_id))
                )
            )
        else:
            scored = scored.filter(
                (F.col("distance") > F.lit(float(a_score)))
                | (
                    (F.col("distance") == F.lit(float(a_score)))
                    & (F.col(id_col) > F.lit(a_id))
                )
            )
    if metric == "cosine":
        ordered = scored.orderBy(F.desc("similarity"), F.col(id_col))
    elif metric == "euclidean":
        ordered = scored.orderBy(F.asc("distance"), F.col(id_col))
    else:
        raise ValueError(f"unknown metric: {metric}")
    return ordered.limit(k)


def knn_brute_force_blas(
    chunks: DataFrame,
    query_vec,
    k: int = 5,
    id_col: str = "id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    library_id: str | None = None,
    metadata_filters: dict[str, Any] | None = None,
) -> DataFrame:
    """Scale-path brute-force kNN: the reference's own vectorized scoring
    trick (``batch_cosine_similarity``, embedding.py:115-140) as an
    Arrow-batched pandas UDF — one NumPy matrix product per batch instead
    of per-element interpreted HOF evaluation (~10-20x on wide scans; same
    plan shape otherwise: broadcast-free narrow scan + TakeOrderedAndProject).

    Scores differ from the sequential JVM expressions only in the last
    ulp (pairwise vs sequential accumulation), so this variant backs
    scale/serving paths while the exact form backs oracle-checked queries.
    Zero-norm semantics preserved: similarity exactly 0.0
    (embedding.py:82-84).
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    @F.pandas_udf("struct<similarity:double,distance:double>")
    def score(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"similarity": [], "distance": []})
        m = np.vstack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        dots = m @ q
        norms = np.linalg.norm(m, axis=1)
        denom = norms * qn
        sims = np.where(denom == 0.0, 0.0, dots / np.where(denom == 0.0, 1.0, denom))
        dists = np.linalg.norm(m - q, axis=1)
        return pd.DataFrame({"similarity": sims, "distance": dists})

    scoped = library_scope(chunks, library_id)
    scoped = apply_metadata_filters(scoped, metadata_filters)
    scoped = scoped.filter(F.col(vec_col).isNotNull())
    scored = scoped.select(
        F.col(id_col), score(F.col(vec_col)).alias("s")
    ).select(id_col, F.col("s.similarity").alias("similarity"), F.col("s.distance").alias("distance"))

    if metric == "cosine":
        ordered = scored.orderBy(F.desc("similarity"), F.col(id_col))
    elif metric == "euclidean":
        ordered = scored.orderBy(F.asc("distance"), F.col(id_col))
    else:
        raise ValueError(f"unknown metric: {metric}")
    return ordered.limit(k)


def knn_join_blocked_blas(
    df: DataFrame,
    k: int = 2,
    id_col: str = "id",
    vec_col: str = "embedding",
    block_col: str = "cluster_id",
) -> DataFrame:
    """Scale-path twin of the blocked kNN JOIN (queries.py::
    knn_join_blocked_topk): within each block, one float64 Gram-matrix
    product scores every pair and a vectorized argpartition takes each
    query's top-k — ``applyInPandas`` keyed on the block, so each block
    is one Arrow batch and the shuffle key is the block id (identical
    exchange layout to the HOF form; only the per-pair evaluation moves
    from interpreted expressions to BLAS).  Measured ~20x on the 1M-row smoke
    (HOF 182-277 s across runs vs 4.5-12.5 s here; tools/scale_smoke.py).  Scores differ from the HOF form only
    in the last ulp (pairwise vs sequential accumulation); ordering ties
    broken by neighbor id like every top-k in the repo.

    Returns (qid, nid, cosine, rank), rank 1..k per query.
    """

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"qid": [], "nid": [], "cosine": [], "rank": []}
            ).astype({"rank": "int32"})
        m = np.vstack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
        norms = np.linalg.norm(m, axis=1)
        safe = np.where(norms == 0.0, 1.0, norms)
        sims = (m @ m.T) / np.outer(safe, safe)
        zero = norms == 0.0
        sims[zero, :] = 0.0
        sims[:, zero] = 0.0
        ids = pdf[id_col].to_numpy()
        # deterministic: order by (-sim, nid); exclude self
        np.fill_diagonal(sims, -np.inf)
        kk = min(k, n - 1)
        out_q, out_n, out_s, out_r = [], [], [], []
        for i in range(n):
            row = sims[i]
            # cheap candidate pool via argpartition, then an exact
            # deterministic (-sim, nid) sort of just that pool
            pool = max(kk * 4, kk)
            if pool < n:
                cand = np.argpartition(-row, pool - 1)[:pool]
                # Ties at the pool boundary (plausible in dedup corpora
                # with byte-identical embeddings): argpartition keeps an
                # ARBITRARY subset of the boundary-similarity entries, so
                # the (id) tie-break could diverge from the exact HOF
                # query.  Widen to every entry at-or-above the boundary —
                # anything excluded is strictly below it and can never
                # enter the top-k under (-sim, id) ordering.
                boundary = row[cand].min()
                cand = np.nonzero(row >= boundary)[0]
            else:
                cand = np.arange(n)
            cand = cand[np.lexsort((ids[cand], -row[cand]))][:kk]
            for r, j in enumerate(cand, 1):
                out_q.append(ids[i])
                out_n.append(ids[j])
                out_s.append(row[j])
                out_r.append(r)
        return pd.DataFrame(
            {
                "qid": out_q,
                "nid": out_n,
                "cosine": out_s,
                "rank": np.asarray(out_r, dtype=np.int32),
            }
        )

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"qid {id_type}, nid {id_type}, cosine double, rank int"
    return (
        df.select(F.col(id_col), F.col(vec_col), F.col(block_col))
        .groupBy(block_col)
        .applyInPandas(per_block, out_schema)
    )


def knn_join_multiprobe_blas(
    queries: DataFrame,
    neighbors: DataFrame,
    k: int = 2,
    cell_col: str = "cluster_id",
) -> DataFrame:
    """Scale-path twin of the MULTI-PROBE kNN join (queries.py::
    knn_join_trained_multiprobe): ``queries`` is the probe-expanded
    query side — one (qid, qv, cell) row per probed cell — and
    ``neighbors`` the storage assignment — one (nid, nv, cell) row per
    corpus vector.  A cogrouped ``applyInPandas`` keyed on the cell
    scores each cell's Q x N block with ONE float64 Gram product and
    emits each query's per-cell top-k; the global top-k is then a
    window over qid on a BOUNDED input (<= p*k candidate rows per
    query — the per-cell top-k can never evict a true global top-k
    member; a (qid, nid) pair exists in at most one cell when a
    neighbor is stored exactly once, and a max-combine dedup before the
    rank window enforces that invariant mechanically for any multi-
    stored input).  Exchange
    layout matches the HOF form (shuffle both sides on the cell id);
    only per-pair evaluation moves from interpreted expressions to
    BLAS.  Deterministic (-cosine, nid) ordering with the same
    boundary-tie widening as :func:`knn_join_blocked_blas`; zero-norm
    vectors score exactly 0.0.

    Returns (qid, nid, cosine, rank), rank 1..k per query.
    """
    from pyspark.sql import Window

    id_type = neighbors.schema["nid"].dataType.simpleString()
    out_schema = f"qid {id_type}, nid {id_type}, cosine double"

    def per_cell(qpdf: pd.DataFrame, npdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(npdf) == 0:
            return pd.DataFrame({"qid": [], "nid": [], "cosine": []})
        qm = np.vstack(qpdf["qv"].map(lambda v: np.asarray(v, dtype=np.float64)))
        nm = np.vstack(npdf["nv"].map(lambda v: np.asarray(v, dtype=np.float64)))
        qn = np.linalg.norm(qm, axis=1)
        nn = np.linalg.norm(nm, axis=1)
        sims = (qm @ nm.T) / np.outer(
            np.where(qn == 0.0, 1.0, qn), np.where(nn == 0.0, 1.0, nn)
        )
        sims[qn == 0.0, :] = 0.0
        sims[:, nn == 0.0] = 0.0
        qids = qpdf["qid"].to_numpy()
        nids = npdf["nid"].to_numpy()
        n = len(nids)
        kk = min(k, n)
        out_q, out_n, out_s = [], [], []
        for i in range(len(qids)):
            row = sims[i].copy()
            row[nids == qids[i]] = -np.inf  # self-exclusion
            pool = max(kk * 4, kk)
            if pool < n:
                cand = np.argpartition(-row, pool - 1)[:pool]
                boundary = row[cand].min()
                cand = np.nonzero(row >= boundary)[0]
            else:
                cand = np.arange(n)
            cand = cand[np.lexsort((nids[cand], -row[cand]))][:kk]
            for j in cand:
                if row[j] == -np.inf:
                    continue
                out_q.append(qids[i])
                out_n.append(nids[j])
                out_s.append(row[j])
        return pd.DataFrame({"qid": out_q, "nid": out_n, "cosine": out_s})

    per_cell_topk = (
        queries.groupBy(cell_col)
        .cogroup(neighbors.groupBy(cell_col))
        .applyInPandas(per_cell, out_schema)
    )
    # Enforce the single-storage invariant at the seam instead of only
    # documenting it (r5 ADVICE): if a caller ever feeds a multi-stored
    # neighbor side, the same (qid, nid) pair survives per-cell top-k in
    # several cells and would consume multiple ranks below.  The pair's
    # cosine is identical in every cell, so a max-combine dedup is exact
    # — and a no-op shuffle-wise for valid inputs (the candidate set is
    # bounded at <= p*k rows per query either way).
    deduped = per_cell_topk.groupBy("qid", "nid").agg(
        F.max("cosine").alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("nid"))
    return (
        deduped.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )
