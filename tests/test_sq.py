"""Scalar quantization (SQ8): reconstruction bound, affine-decomposition
equality, recall vs brute force, and degenerate inputs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_database_api_spark.operators import sq as SQ
from vector_database_api_spark.operators.knn import knn_brute_force
from vector_database_api_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("id"), "embedding"
    )


@pytest.fixture(scope="module")
def index(embs):
    return SQ.build_sq(embs)


def test_codes_shape_and_range(index, embs):
    rows = index.codes_df.collect()
    assert len(rows) == embs.count()
    for r in rows[:50]:
        assert len(r["codes"]) == index.dim
        assert all(0 <= c <= 255 for c in r["codes"])


def test_reconstruction_error_bound(index, embs):
    """Dequantized value is within half a quantization step of the true
    normalized coordinate, per dimension."""
    raw = {
        r["id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in embs.collect()
    }
    step = (index.vmaxs - index.vmins) / 255.0
    for r in index.codes_df.collect()[:100]:
        v = raw[r["id"]]
        n = np.linalg.norm(v)
        nv = v / n if n > 0 else v
        dq = index.vmins + np.asarray(r["codes"]) / 255.0 * (
            index.vmaxs - index.vmins
        )
        assert np.all(np.abs(dq - nv) <= step / 2 + 1e-12)


def test_affine_equals_dequant_scores(index, embs):
    """sq_search's bias + dot(codes, w) decomposition matches the literal
    dequantize-then-dot arithmetic (up to reassociation ulps) and ranks
    identically on this corpus."""
    q = np.asarray(
        embs.filter(F.col("id") == "7").first()["embedding"], dtype=np.float64
    )
    a = sorted(
        ((r["id"], r["similarity"]) for r in SQ.sq_search(index, q, k=20).collect())
    )
    d = sorted(
        (
            (r["id"], r["similarity"])
            for r in SQ.sq_dequant_score(index, q, k=20).collect()
        )
    )
    assert [x[0] for x in a] == [x[0] for x in d]
    assert np.allclose([x[1] for x in a], [x[1] for x in d], atol=1e-9)


def test_recall_vs_brute_force(index, embs, spark):
    """8-bit-per-dim quantization is tight: recall@10 vs exact cosine
    should be near-perfect (far above PQ's, which is the trade)."""
    q = np.asarray(
        embs.filter(F.col("id") == "3").first()["embedding"], dtype=np.float64
    )
    qdf = spark.createDataFrame(
        [(q.tolist(),)], "query_embedding array<double>"
    )
    exact = {r["id"] for r in knn_brute_force(embs, qdf, k=10).collect()}
    approx = {r["id"] for r in SQ.sq_search(index, q, k=10).collect()}
    assert len(exact & approx) >= 9


def test_degenerate_constant_dim_and_zero_vector(spark):
    """A constant dimension (vmax == vmin) encodes to 0 and reconstructs
    exactly; an all-zero corpus still builds and scores 0."""
    df = spark.createDataFrame(
        [("a", [1.0, 5.0]), ("b", [1.0, 7.0])], "id string, embedding array<double>"
    )
    idx = SQ.build_sq(df)
    # dim 1 of the normalized vectors differs, dim-wise bounds exist
    codes = {r["id"]: list(r["codes"]) for r in idx.codes_df.collect()}
    assert codes["a"][0] in range(256) and codes["b"][0] in range(256)

    zeros = spark.createDataFrame(
        [("z", [0.0, 0.0])], "id string, embedding array<double>"
    )
    zidx = SQ.build_sq(zeros)
    assert [list(r["codes"]) for r in zidx.codes_df.collect()] == [[0, 0]]
    out = SQ.sq_search(zidx, np.array([1.0, 0.0]), k=1).collect()
    assert out[0]["similarity"] == 0.0


def test_no_python_in_plan(index):
    """SQ is the all-JVM quantization path — encode/scan plans must not
    contain any Python evaluation."""
    plan = index.codes_df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
