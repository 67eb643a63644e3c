"""JL random projection (operators/projection.py): BLAS path fidelity,
SQL-path cross-engine bit-exactness, shapes."""

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_database_api_spark.operators import projection as P
from vector_database_api_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def _cos(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(a @ b / (na * nb))


def test_gaussian_path_matches_numpy_and_preserves_cosine(emb):
    # orderBy pins row identity across the two collects — limit without
    # orderBy has no guaranteed order once the source is multi-file
    sample = emb.orderBy("vec_id").limit(100)
    rows = sample.collect()
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    udf = P.gaussian_project_udf(64, 32, seed=7)
    got = np.array(
        [r["p"] for r in sample.select(udf("embedding").alias("p")).collect()]
    )
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((64, 32)) / np.sqrt(32)
    want = vecs @ mat
    assert np.allclose(got, want, rtol=0, atol=0)  # same ops, bit-exact
    errs = [
        abs(_cos(vecs[i], vecs[j]) - _cos(got[i], got[j]))
        for i in range(0, 40)
        for j in range(i + 1, 40)
    ]
    assert sum(errs) / len(errs) < 0.2  # JL bound ballpark at d_out=32


def test_sql_path_is_bit_exact_cross_engine(spark, sf_dir, emb):
    sample = emb.filter(F.col("vec_id") < 10)
    spark_rows = {
        r["vec_id"]: r["p"]
        for r in sample.select(
            "vec_id", F.expr(P.spark_project_sql("embedding", 64, 16)).alias("p")
        ).collect()
    }
    duck_rows = {
        int(vid): list(p)
        for vid, p in duckdb.sql(
            f"SELECT vec_id, {P.duck_project_sql('embedding', 64, 16)} AS p"
            " FROM read_parquet($path) WHERE vec_id < 10",
            params={"path": f"{sf_dir}/embeddings.parquet"},
        ).fetchall()
    }
    assert spark_rows.keys() == duck_rows.keys()
    for vid in spark_rows:
        assert spark_rows[vid] == duck_rows[vid], vid  # bit-exact, not approx


def test_sql_sign_matrix_is_balanced():
    """The arithmetic ±1 matrix must be near-balanced per column (a
    degenerate all-ones column would project onto a constant)."""
    signs = np.zeros((64, 16))
    for i in range(64):
        for j in range(16):
            mix = (i + 1) * 2654435761 + (j + 1) * 40503 + (i + 1) * (j + 1) * 97
            signs[i, j] = 1.0 if (mix % 127) % 2 == 0 else -1.0
    col_bias = np.abs(signs.sum(axis=0)) / 64
    assert col_bias.max() < 0.5, col_bias
    # and not rank-1: distinct column patterns
    assert len({tuple(signs[:, j]) for j in range(16)}) == 16


def test_output_dims(emb):
    row = (
        emb.limit(1)
        .select(F.expr(P.spark_project_sql("embedding", 64, 16)).alias("p"))
        .collect()[0]
    )
    assert len(row["p"]) == 16
    assert all(isinstance(x, float) and math.isfinite(x) for x in row["p"])
