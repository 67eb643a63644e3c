"""Sign-random-projection (cosine) LSH — build + search.

Reference: ``/root/reference/app/database/indexes.py:44-190`` — L=8 hash
tables x k=12 unit-normalized Gaussian hyperplanes (indexes.py:59-84), hash =
concatenated sign bits of dot(v, plane) (indexes.py:86-101), candidate
retrieval = union of the query's L buckets with fallback to ALL indexed
vectors when every bucket misses (indexes.py:150-153), then exact cosine
re-rank of candidates that survive the metadata-filtered chunk set
(indexes.py:155-168; filter applied in search_service.py:103-105).

MLlib's ``BucketedRandomProjectionLSH`` is *Euclidean* LSH — a different
family — so the SRP hashing is ours; everything else is stock DataFrame ops.

Spark-first design:

- Hyperplanes are seeded NumPy (the reference is unseeded — we fix the
  seed for determinism) and enter the plan as nested array *literals*, so
  hashing is a pure JVM expression (``zip_with``/``aggregate`` dot products
  + sign bits) — no Python in the hot path, and the identical literals are
  emitted into DuckDB oracle SQL, making the whole LSH search
  oracle-checkable bit-for-bit.
- The index is a ``(id, table_idx, hash)`` DataFrame.  At scale this is a
  table bucketed/partitioned by ``(table_idx, hash)`` so the candidate
  equi-join against the query's 8 bucket keys is a pruned scan, not a
  shuffle of the index.
- Candidate retrieval is an equi-join against the 8-row broadcast query
  hash set + ``dropDuplicates`` (UNION DISTINCT, A4) — the big side never
  shuffles (broadcast hash join), and re-rank is the shared bit-exact
  cosine expression with ``TakeOrderedAndProject`` top-k.
"""

from __future__ import annotations

from typing import Any

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_database_api_spark.config import DEFAULT_CONFIG, EngineConfig
from vector_database_api_spark.functions.vector import (
    cosine_similarity,
    euclidean_distance,
)
from vector_database_api_spark.operators.filters import (
    apply_metadata_filters,
    library_scope,
)


def generate_planes(
    dim: int,
    num_tables: int | None = None,
    hash_length: int | None = None,
    seed: int | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
) -> np.ndarray:
    """Seeded unit-normalized Gaussian hyperplanes, shape (L, k, dim)
    (reference indexes.py:59-84, unseeded there)."""
    num_tables = num_tables or config.lsh_num_tables
    hash_length = hash_length or config.lsh_hash_length
    seed = config.seed if seed is None else seed
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(num_tables, hash_length, dim))
    planes /= np.linalg.norm(planes, axis=2, keepdims=True)
    return planes


def _plane_repr(x: float) -> str:
    """Decimal text of a plane component.  Python ``repr`` round-trips the
    double; both Spark's and DuckDB's parsers resolve it to the identical
    IEEE value, so the two engines hash with the same planes."""
    return repr(float(x))


def _spark_dot_literal_sql(vec: str, plane: np.ndarray) -> str:
    lit = "array(" + ",".join(f"CAST('{_plane_repr(x)}' AS DOUBLE)" for x in plane) + ")"
    return (
        f"aggregate(zip_with({vec}, {lit}, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def spark_hash_sql(vec: str, table_planes: np.ndarray) -> str:
    """Spark-SQL text of the hash for ONE table: concat of sign bits
    (reference indexes.py:86-101).  Generated as SQL text (one ``F.expr``)
    rather than thousands of py4j Column objects — planning stays cheap."""
    bits = ", ".join(
        f"CASE WHEN {_spark_dot_literal_sql(vec, p)} >= 0 THEN '1' ELSE '0' END"
        for p in table_planes
    )
    return f"concat({bits})"


def hash_column(vec: str, table_planes: np.ndarray) -> Column:
    """Hash for ONE table as a Column (``vec`` must be a column name)."""
    return F.expr(spark_hash_sql(vec, table_planes))


def hash_table_df(
    df: DataFrame,
    planes: np.ndarray,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH index rows ``(id, table_idx, hash)`` for every embedded row —
    the L3 index-add path as one narrow projection (no shuffle)."""
    hashed = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(
            F.array(*[hash_column(vec_col, planes[t]) for t in range(len(planes))])
        ).alias("table_idx", "hash"),
    )
    return hashed


def lsh_search(
    chunks: DataFrame,
    query: DataFrame,
    planes: np.ndarray,
    k: int = 5,
    id_col: str = "id",
    vec_col: str = "embedding",
    query_vec_col: str = "query_embedding",
    library_id: str | None = None,
    metadata_filters: dict[str, Any] | None = None,
    index_df: DataFrame | None = None,
) -> DataFrame:
    """Full LSH search (L5/L6 + J2/J4/A4 + T1).

    ``index_df`` may carry a precomputed ``(id, table_idx, hash)`` index
    (the materialized-table path); otherwise hashes are computed inline
    from ``chunks``.  The single-DataFrame result makes the whole search
    one Catalyst plan:

    scope -> candidates (bucket equi-join vs broadcast query hashes, union
    distinct, fallback-to-all when empty) -> semi-join filtered chunks ->
    exact re-rank -> deterministic top-k.
    """
    scoped = library_scope(chunks, library_id).filter(F.col(vec_col).isNotNull())
    if index_df is None:
        index_df = hash_table_df(scoped, planes, id_col=id_col, vec_col=vec_col)

    query_hashes = query.select(
        F.posexplode(
            F.array(*[hash_column(query_vec_col, planes[t]) for t in range(len(planes))])
        ).alias("table_idx", "hash")
    )
    candidates = (
        index_df.join(F.broadcast(query_hashes), ["table_idx", "hash"])
        .select(id_col)
        .dropDuplicates([id_col])
    )

    # Zero-candidate fallback: ALL indexed vectors (reference
    # indexes.py:150-153).  Expressed inside the plan (no driver-side
    # branching) so the query stays a single deterministic DAG: every row
    # is kept if it is a candidate OR the candidate set is globally empty.
    n_cand = candidates.agg(F.count(F.lit(1)).alias("n_candidates"))
    flagged = scoped.join(
        candidates.withColumn("is_candidate", F.lit(True)), [id_col], "left"
    ).crossJoin(F.broadcast(n_cand))
    pool = flagged.filter(
        F.col("is_candidate").isNotNull() | (F.col("n_candidates") == 0)
    ).drop("is_candidate", "n_candidates")

    # metadata filter intersects the candidate pool (search_service.py:103-105)
    pool = apply_metadata_filters(pool, metadata_filters)

    scored = pool.crossJoin(F.broadcast(query.select(query_vec_col))).select(
        F.col(id_col),
        cosine_similarity(vec_col, query_vec_col).alias("similarity"),
        euclidean_distance(vec_col, query_vec_col).alias("distance"),
    )
    return scored.orderBy(F.desc("similarity"), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# DuckDB oracle SQL generation (same plane literals, same op order)
# ---------------------------------------------------------------------------


def _duck_dot_literal(vec: str, plane: np.ndarray) -> str:
    lit = "[" + ",".join(_plane_repr(x) for x in plane) + "]"
    return (
        f"list_reduce(list_transform(list_zip({vec}, {lit}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
    )


def duck_hash_sql(vec: str, table_planes: np.ndarray) -> str:
    bits = "||".join(
        f"(CASE WHEN {_duck_dot_literal(vec, p)} >= 0 THEN '1' ELSE '0' END)"
        for p in table_planes
    )
    return f"({bits})"
