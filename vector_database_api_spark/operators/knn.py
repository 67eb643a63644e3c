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
) -> DataFrame:
    """Top-k rows of ``chunks`` nearest to the single row of ``query``.

    ``query`` must have exactly one row holding ``query_vec_col``; it is
    broadcast, so the big side never shuffles.  Returns the chunk id plus
    ``similarity`` and ``distance`` columns (reference SearchResult shape,
    models.py:123-128).
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
    scored = staged.select(F.col(id_col), sim, F.col("distance"))

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
