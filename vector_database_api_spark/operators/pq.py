"""Product quantization (PQ) — the memory-scale ANN path.

The reference stores every raw vector in its indexes (LSH
app/database/indexes.py:107, IVF app/database/indexes.py:317): memory is
O(n * d) floats, which caps out long before 100 TB.  PQ is the standard
way past that wall (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 — the algorithm behind FAISS
IVF-PQ): split each d-dim vector into ``m`` subvectors, vector-quantize
each subspace against a tiny codebook of ``k`` entries, and store only
the m code bytes per row — a 64-d float32 vector becomes 8 bytes at
m=8, a 32x compression, independent of corpus size.

Spark-first shape:

- **Train on a seeded driver-side sample.**  Codebooks are m * k * dsub
  floats (a few KB); training them on a bounded random sample is the
  standard practice at any corpus size (FAISS trains on ~max(10^5, 256k)
  sampled vectors regardless of index size), so the driver-side NumPy
  k-means is O(sample), constant in corpus scale, and the codebooks
  broadcast to executors by closure exactly like IVF centroids
  (ivf.py:22-24).
- **Encode distributively.**  One Arrow-batched pandas UDF maps each
  batch to codes with three BLAS matmuls per subspace — the same
  hot-path pattern as ``lsh.srp_hash_udf`` and
  ``ivf.assign_to_centroids``.
- **Search by ADC** (asymmetric distance computation): the query stays
  un-quantized; one (m, k) lookup table of partial inner products is
  computed per query on the driver, broadcast by closure, and each
  row's score is ``lut[j, code_j]`` summed over subspaces — a table
  gather + row sum per Arrow batch, no per-row Python.
- Vectors are L2-normalized before encoding, so the ADC inner product
  approximates cosine similarity and ranking matches the engine's
  cosine top-k convention (ORDER BY similarity DESC, id).

Exactness invariant (tested): the ADC score of a row equals the exact
inner product between the normalized query and the row's RECONSTRUCTED
vector (codebook entries concatenated) — quantization is the only
approximation, the distributed arithmetic adds none.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PQIndex:
    codebooks: np.ndarray  # (m, k, dsub) float64
    codes_df: DataFrame  # (id, codes array<smallint>)
    m: int
    k: int
    dim: int


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0  # zero vectors stay zero (cosine 0 convention)
    return mat / norms


def _kmeans_numpy(
    x: np.ndarray, k: int, iters: int, rng: np.random.Generator
) -> np.ndarray:
    """Seeded Lloyd's iterations on a driver-side sample.  Empty clusters
    are re-seeded from random points, mirroring the reference's random
    re-init posture (app/database/indexes.py:240-242)."""
    cent = x[rng.choice(len(x), size=k, replace=len(x) < k)].copy()
    for _ in range(iters):
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * x @ cent.T
            + (cent * cent).sum(axis=1)[None, :]
        )
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
            else:
                cent[j] = x[rng.integers(len(x))]
    return cent


def build_pq(
    df: DataFrame,
    id_col: str = "id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    train_sample: int = 20000,
    kmeans_iters: int = 10,
) -> PQIndex:
    """Train per-subspace codebooks on a seeded sample, then encode every
    row distributively.  ``dim`` must divide evenly by ``m``."""
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("cannot build PQ index on an empty DataFrame")
    dim = first["d"]
    if dim % m != 0:
        raise ValueError(f"dim={dim} must divide evenly into m={m} subspaces")
    dsub = dim // m

    # bounded, seeded sample — constant-size driver work at any corpus scale
    n = df.count()
    fraction = min(1.0, train_sample / max(n, 1))
    sample = (
        df.select(F.col(vec_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .sample(fraction=fraction, seed=seed)
        .limit(train_sample)
        .collect()
    )
    train = _normalize_rows(
        np.array([r["v"] for r in sample], dtype=np.float64)
    )

    rng = np.random.default_rng(seed)
    codebooks = np.stack(
        [
            _kmeans_numpy(
                train[:, j * dsub : (j + 1) * dsub], k, kmeans_iters, rng
            )
            for j in range(m)
        ]
    )

    codes_df = encode_codes(df, codebooks, id_col=id_col, vec_col=vec_col)
    return PQIndex(codebooks=codebooks, codes_df=codes_df, m=m, k=k, dim=dim)


def encode_matrix(mat: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Pure encode kernel: per-subspace nearest-codebook-entry argmin for
    every row of ``mat`` (already normalized).  Shared by the Arrow UDF
    hot path and the hypothesis property suite, which verifies the
    nearest-entry invariant against brute-force subspace distances."""
    m, _, dsub = codebooks.shape
    codes = np.empty((len(mat), m), dtype=np.int16)
    for j in range(m):
        block = mat[:, j * dsub : (j + 1) * dsub]
        cj = codebooks[j]
        d2 = (
            (block * block).sum(axis=1)[:, None]
            - 2.0 * block @ cj.T
            + (cj * cj).sum(axis=1)[None, :]
        )
        codes[:, j] = d2.argmin(axis=1).astype(np.int16)
    return codes


def adc_lut(query_vec: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Pure ADC kernel: lut[j, c] = <normalized-query subvector j,
    codebook[j][c]>; a code row's similarity is the gathered row sum."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    m, _, dsub = codebooks.shape
    return np.stack(
        [codebooks[j] @ q[j * dsub : (j + 1) * dsub] for j in range(m)]
    )


def adc_scores(codes: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Gather + row-sum of the ADC lookup table for a code matrix."""
    m = lut.shape[0]
    return lut[np.arange(m)[None, :], codes].sum(axis=1)


def encode_codes(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode rows against FROZEN codebooks (the incremental-add path:
    like IVF's frozen-centroid assignment, ivf.py:187-200, new vectors
    are coded without retraining).  One Arrow batch = three BLAS matmuls
    per subspace."""
    cb = np.asarray(codebooks, dtype=np.float64)

    @F.pandas_udf("array<smallint>")
    def encode(vecs: pd.Series) -> pd.Series:
        mat = _normalize_rows(
            np.vstack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        )
        return pd.Series(list(encode_matrix(mat, cb)))

    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), encode(F.col(vec_col)).alias("codes")
    )


def reconstruct(index: PQIndex, codes: np.ndarray) -> np.ndarray:
    """Decode one code row back to its quantized vector (testing aid)."""
    return np.concatenate(
        [index.codebooks[j, codes[j]] for j in range(index.m)]
    )


def pq_search(
    index: PQIndex,
    query_vec: np.ndarray,
    k: int = 5,
) -> DataFrame:
    """ADC top-k: per-query (m, num_codes) inner-product table, gather +
    sum per row, deterministic ``ORDER BY similarity DESC, id LIMIT k``
    (TakeOrderedAndProject — the same distributed top-k as every other
    search path)."""
    lut = adc_lut(query_vec, index.codebooks)

    @F.pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        mat = np.vstack(codes.map(np.asarray))
        return pd.Series(adc_scores(mat, lut))

    return (
        index.codes_df.select("id", adc(F.col("codes")).alias("similarity"))
        .orderBy(F.desc("similarity"), F.col("id"))
        .limit(k)
    )


def ivfpq_search(
    ivf_index,
    pq_index: PQIndex,
    query_vec: np.ndarray,
    k: int = 5,
    nprobe: int | None = None,
) -> DataFrame:
    """IVF+PQ: probe the top-nprobe IVF clusters (partition pruning over
    the assignment table, ivf.py:156-159), then ADC-score ONLY the probed
    members' codes — the FAISS-style composition where scan cost is
    bounded by nprobe/nlist and memory by m bytes/vector.  The candidate
    restriction is a broadcast-able semi-join on id (cluster membership is
    a projection of the IVF index table, tiny next to the corpus).

    Returns (id, similarity) ranked by quantized cosine, deterministic
    id tie-break; untrained IVF => empty (reference indexes.py:343-344).
    """
    from vector_database_api_spark.operators.ivf import probe_clusters

    spark = pq_index.codes_df.sparkSession
    if not ivf_index.trained:
        return spark.createDataFrame([], "id string, similarity double")
    probed = probe_clusters(ivf_index, query_vec, nprobe=nprobe)
    member_ids = ivf_index.index_df.filter(
        F.col("cluster_id").isin(probed)
    ).select("id")
    pool = PQIndex(
        codebooks=pq_index.codebooks,
        codes_df=pq_index.codes_df.join(F.broadcast(member_ids), "id", "left_semi"),
        m=pq_index.m,
        k=pq_index.k,
        dim=pq_index.dim,
    )
    return pq_search(pool, query_vec, k=k)


def pq_search_refined(
    index: PQIndex,
    chunks: DataFrame,
    query_vec: np.ndarray,
    k: int = 5,
    refine: int = 10,
) -> DataFrame:
    """ADC shortlist + exact re-rank (the FAISS ``IndexRefine`` pattern):
    rank ALL codes by quantized similarity, keep the top ``refine*k``
    candidate ids, then score only those against the RAW vectors and take
    the exact top-k.

    This buys back most of the recall PQ loses to quantization at a cost
    proportional to ``refine*k`` raw-vector reads instead of the full
    corpus: the big scan stays on 8-16 B/vector codes; full-precision
    vectors are touched for a shortlist that is broadcastable by
    construction.  ``chunks`` must carry (id, embedding) for every id in
    the index.  Deterministic: both stages tie-break on id.
    """
    from vector_database_api_spark.operators.knn import knn_brute_force

    shortlist = pq_search(index, query_vec, k=k * refine).select("id")
    spark = chunks.sparkSession
    qdf = spark.createDataFrame(
        [(query_vec.tolist(),)], "query_embedding array<double>"
    )
    pool = chunks.join(F.broadcast(shortlist), "id", "left_semi")
    return knn_brute_force(pool, qdf, k=k)
