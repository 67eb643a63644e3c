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
  seed for determinism).  Hashing has two equivalent forms: an
  Arrow-batched pandas UDF doing one BLAS matmul per batch (the hot path —
  Spark's HOFs are CodegenFallback/interpreted, so the UDF is ~100x
  faster on bulk data), and a pure JVM literal expression whose SQL text
  is mirrored verbatim into DuckDB oracle SQL, keeping the whole LSH
  search oracle-checkable (see ``srp_hash_udf`` for the rounding
  analysis).
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
import pandas as pd
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


def srp_hash_udf(planes: np.ndarray):
    """Arrow-batched SRP hasher: all L hashes of a vector in one BLAS
    matmul per batch — ``ARRAY<STRING>`` of length L.

    This is the bulk/index hot path.  Spark's higher-order functions
    (``aggregate``/``zip_with``) are CodegenFallback — interpreted per
    element — so hashing n vectors costs n*L*k interpreted dot products;
    the batched ``V @ P.T`` is ~100x faster and the right shape for 100 TB.

    Rounding note: NumPy's matmul accumulates pairwise/SIMD while the
    DuckDB oracle accumulates sequentially.  The two can differ in the last
    ulp (~1e-16), which only matters if a dot product sits within that of
    zero; the driver testdata's minimum |dot(v, plane)| margin is ~1.2e-6
    (10 orders of magnitude of headroom), and re-rank similarity values are
    computed by the sequential JVM expression either way, so oracle
    bit-exactness is preserved.
    """
    num_tables, hash_len, dim = planes.shape
    flat = planes.reshape(num_tables * hash_len, dim).astype(np.float64)

    @F.pandas_udf("array<string>")
    def all_hashes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.vstack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        bits = (m @ flat.T) >= 0.0
        chars = np.where(bits, "1", "0").reshape(len(m), num_tables, hash_len)
        return pd.Series(
            [["".join(tbl) for tbl in row] for row in chars]
        )

    return all_hashes


def hash_table_df(
    df: DataFrame,
    planes: np.ndarray,
    id_col: str = "id",
    vec_col: str = "embedding",
    method: str = "udf",
) -> DataFrame:
    """LSH index rows ``(id, table_idx, hash)`` for every embedded row —
    the L3 index-add path as one narrow projection (no shuffle).

    ``method="udf"`` (default) hashes via the Arrow/BLAS pandas UDF;
    ``method="expr"`` uses the pure-JVM literal expression (the form whose
    SQL text is mirrored into the DuckDB oracle)."""
    embedded = df.filter(F.col(vec_col).isNotNull())
    if method == "expr":
        hashes = F.array(
            *[hash_column(vec_col, planes[t]) for t in range(len(planes))]
        )
    else:
        hashes = srp_hash_udf(planes)(F.col(vec_col))
    return embedded.select(
        F.col(id_col), F.posexplode(hashes).alias("table_idx", "hash")
    )


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
        F.posexplode(srp_hash_udf(planes)(F.col(query_vec_col))).alias(
            "table_idx", "hash"
        )
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
