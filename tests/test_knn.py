"""Brute-force filtered kNN vs NumPy ground truth (search_service.py:112-153)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from vector_database_api_spark.operators.knn import knn_brute_force

SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("library_id", StringType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("metadata", MapType(StringType(), StringType())),
    ]
)


def _data(spark, n=50, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [
        (
            f"c{i:03d}",
            "libA" if i % 2 == 0 else "libB",
            [float(x) for x in vecs[i]],
            {"topic": "ml" if i % 3 == 0 else "db"},
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA), vecs


def _query_df(spark, vec):
    return spark.createDataFrame(
        [Row(query_embedding=[float(x) for x in vec])],
        StructType([StructField("query_embedding", ArrayType(FloatType()))]),
    )


def _numpy_topk(vecs, q, mask, k):
    v = vecs.astype(np.float64)
    qd = q.astype(np.float64)
    sims = v @ qd / (np.linalg.norm(v, axis=1) * np.linalg.norm(qd))
    order = sorted(
        (i for i in range(len(v)) if mask[i]), key=lambda i: (-sims[i], f"c{i:03d}")
    )
    return [f"c{i:03d}" for i in order[:k]]


def test_knn_matches_numpy(spark):
    df, vecs = _data(spark)
    q = vecs[0]
    got = [
        r["id"] for r in knn_brute_force(df, _query_df(spark, q), k=10).collect()
    ]
    assert got == _numpy_topk(vecs, q, [True] * len(vecs), 10)


def test_filter_then_search(spark):
    """Metadata filter applies BEFORE top-k: k results are k filtered results."""
    df, vecs = _data(spark)
    q = vecs[1]
    got = [
        r["id"]
        for r in knn_brute_force(
            df,
            _query_df(spark, q),
            k=5,
            library_id="libA",
            metadata_filters={"topic": "ml"},
        ).collect()
    ]
    mask = [i % 2 == 0 and i % 3 == 0 for i in range(len(vecs))]
    assert got == _numpy_topk(vecs, q, mask, 5)
    assert len(got) == 5


def test_fewer_than_k_results_allowed(spark):
    df, _ = _data(spark, n=6)
    q = np.ones(8, dtype=np.float32)
    got = knn_brute_force(
        df, _query_df(spark, q), k=100, library_id="libA"
    ).collect()
    assert len(got) == 3  # only 3 libA rows exist


def test_null_embeddings_excluded(spark):
    rows = [
        ("a", "lib", [1.0, 0.0], {}),
        ("b", "lib", None, {}),
        ("c", "lib", [0.9, 0.1], {}),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = [
        r["id"]
        for r in knn_brute_force(
            df, _query_df(spark, np.array([1.0, 0.0])), k=10
        ).collect()
    ]
    assert got == ["a", "c"]


def test_null_element_embeddings_excluded(spark):
    """r9 ADVICE parity fix: a stored embedding with a NULL ELEMENT
    (NULL similarity) must never surface, even when the library has
    fewer than k healthy chunks — matching the batch dense leg, which
    drops NULL-similarity rows before grouped_topk."""
    rows = [
        ("a", "lib", [1.0, 0.0], {}),
        ("b", "lib", [None, 1.0], {}),
        ("c", "lib", [0.9, 0.1], {}),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = [
        r["id"]
        for r in knn_brute_force(
            df, _query_df(spark, np.array([1.0, 0.0])), k=10
        ).collect()
    ]
    assert got == ["a", "c"]


def test_tie_break_deterministic(spark):
    """Duplicate vectors: ties broken by id ascending (reference relies on
    dict order — we make it total, SURVEY §2.7 T1)."""
    rows = [
        ("z9", "lib", [1.0, 0.0], {}),
        ("a1", "lib", [1.0, 0.0], {}),
        ("m5", "lib", [1.0, 0.0], {}),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = [
        r["id"]
        for r in knn_brute_force(
            df, _query_df(spark, np.array([1.0, 0.0])), k=3
        ).collect()
    ]
    assert got == ["a1", "m5", "z9"]


def test_blas_knn_matches_exact_topk(spark, sf_dir):
    """The BLAS scale path returns the same neighbors (ids) as the
    bit-exact JVM expression path; scores agree to ~1e-12."""
    import numpy as np

    from vector_database_api_spark.operators.knn import (
        knn_brute_force,
        knn_brute_force_blas,
    )
    from vector_database_api_spark.sources.tables import load_table

    embs = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("id"), "embedding"
    )
    qrow = embs.filter(F.col("id") == "3").collect()[0]
    qvec = np.asarray(qrow["embedding"], dtype=np.float64)
    query = spark.createDataFrame(
        [(list(float(x) for x in qrow["embedding"]),)],
        "query_embedding array<float>",
    )
    exact = knn_brute_force(embs, query, k=10).collect()
    blas = knn_brute_force_blas(embs, qvec, k=10).collect()
    assert [r["id"] for r in exact] == [r["id"] for r in blas]
    for e, b in zip(exact, blas):
        assert abs(e["similarity"] - b["similarity"]) < 1e-12
        assert abs(e["distance"] - b["distance"]) < 1e-12


def test_knn_join_blocked_blas_matches_hof(spark, sf_dir):
    """The BLAS per-block kNN join returns the same (qid, nid, rank)
    edges as the oracle-checked HOF query (scores may differ in the last
    ulp; ids and ranks must not)."""
    from vector_database_api_spark import queries as q
    from vector_database_api_spark.operators.knn import knn_join_blocked_blas

    hof = {
        (r["qid"], r["rank"]): r["nid"]
        for r in q.spark_queries()["knn_join_blocked_topk"](spark, sf_dir).collect()
    }
    wc = q._cached_semdedup_assignment(spark, sf_dir)
    blas = {
        (r["qid"], r["rank"]): r["nid"]
        for r in knn_join_blocked_blas(
            wc, k=2, id_col="id", vec_col="v", block_col="cluster_id"
        ).collect()
    }
    assert blas == hof and len(hof) > 0


def test_knn_join_blocked_blas_pool_boundary_ties(spark):
    """More identical embeddings than the argpartition candidate pool
    (pool = 4k): every neighbor ties at the boundary similarity, so the
    exact (-sim, nid) order is the LOWEST neighbor ids — an arbitrary
    argpartition subset would return higher ids nondeterministically.
    Also pins the output id type to the input's (here: int, not the
    previously hardcoded long)."""
    from vector_database_api_spark.operators.knn import knn_join_blocked_blas

    n, k = 40, 2  # pool = 8 << 39 tied neighbors
    rows = [(i, [1.0, 2.0, 3.0], 0) for i in range(n)]
    df = spark.createDataFrame(
        rows, "id int, embedding array<double>, cluster_id int"
    )
    out = knn_join_blocked_blas(
        df, k=k, id_col="id", vec_col="embedding", block_col="cluster_id"
    )
    assert dict(out.dtypes)["qid"] == "int" and dict(out.dtypes)["nid"] == "int"
    got = {(r["qid"], r["rank"]): r["nid"] for r in out.collect()}
    for qid in range(n):
        expect = [i for i in range(n) if i != qid][:k]
        for rank, nid in enumerate(expect, 1):
            assert got[(qid, rank)] == nid, (qid, rank, got[(qid, rank)], nid)


def test_knn_join_multiprobe_blas_matches_hof(spark, sf_dir):
    """The cogrouped multi-probe BLAS kernel returns the same
    (qid, rank) -> nid edges as the oracle-checked HOF multi-probe query
    when fed the same frozen-centroid artifacts (scores may differ in
    the last ulp; ids and ranks must not)."""
    from vector_database_api_spark import queries as q
    from vector_database_api_spark.operators import dedup as ded
    from vector_database_api_spark.operators.knn import knn_join_multiprobe_blas
    from vector_database_api_spark.sources.tables import load_table

    hof = {
        (r["qid"], r["rank"]): r["nid"]
        for r in q.spark_queries()["knn_join_multiprobe_topk"](
            spark, sf_dir
        ).collect()
    }
    embs = load_table(spark, sf_dir, "embeddings")
    cents = embs.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("cvec")
    )
    store = q._cached_semdedup_assignment(spark, sf_dir)
    probes = ded.assign_clusters_topp(embs, cents, p=2, id_col="vec_id")
    queries_side = probes.select(F.col("id").alias("qid"), "cluster_id").join(
        embs.select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        ),
        "qid",
    )
    neighbors = store.select(
        F.col("id").alias("nid"), F.col("v").alias("nv"), "cluster_id"
    )
    blas = {
        (r["qid"], r["rank"]): r["nid"]
        for r in knn_join_multiprobe_blas(queries_side, neighbors, k=2).collect()
    }
    assert blas == hof and len(hof) > 0
