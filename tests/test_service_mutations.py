"""M2/M3 incremental maintenance: chunk delete/update keep chunks table and
index tables consistent (chunk_service.py:81-134 semantics)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_database_api_spark.config import EngineConfig
from vector_database_api_spark.operators import lsh as lsh_mod
from vector_database_api_spark.service import VectorEngine
from vector_database_api_spark.streaming.maintenance import CHUNK_INGEST_SCHEMA

CFG = EngineConfig(embedding_dim=16, ivf_nlist=4, ivf_nprobe=4, default_k=5)


@pytest.fixture()
def engine(spark, tmp_path):
    eng = VectorEngine(spark, str(tmp_path / "wh"), config=CFG)
    rows = [
        (f"c{i:02d}", "libA" if i < 16 else "libB", f"d{i}", f"text number {i}", None, {})
        for i in range(24)
    ]
    eng.ingest_chunks(spark.createDataFrame(rows, CHUNK_INGEST_SCHEMA))
    return eng


def test_delete_chunks_unindexed(engine):
    engine.delete_chunks("libA", ["c00", "c01"])
    assert engine.chunks("libA").count() == 14
    # the other library is untouched by the partition-scoped rewrite
    assert engine.chunks("libB").count() == 8


def test_delete_chunks_with_lsh_index(engine, spark):
    engine.index_library("libA", "lsh")
    engine.delete_chunks("libA", ["c02", "c03"])
    idx = spark.read.parquet(engine._index_dir("lsh", "libA"))
    ids = {r["id"] for r in idx.select("id").distinct().collect()}
    assert "c02" not in ids and "c03" not in ids
    assert len(ids) == 14
    # search no longer returns deleted ids
    got = {r["id"] for r in engine.search("libA", query_text="text number 2", k=16).collect()}
    assert "c02" not in got


def test_update_chunk_text_reindexes_lsh(engine, spark):
    engine.index_library("libA", "lsh")
    engine.update_chunk_texts("libA", {"c05": "totally new content"})
    chunks = {r["id"]: r for r in engine.chunks("libA").collect()}
    assert chunks["c05"]["text"] == "totally new content"
    # index rows for c05 match a fresh hash of the new embedding
    planes = lsh_mod.generate_planes(CFG.embedding_dim, config=CFG)
    fresh = {
        (r["table_idx"], r["hash"])
        for r in lsh_mod.hash_table_df(
            engine.chunks("libA").filter(F.col("id") == "c05"), planes
        ).collect()
    }
    idx = spark.read.parquet(engine._index_dir("lsh", "libA"))
    stored = {
        (r["table_idx"], r["hash"])
        for r in idx.filter(F.col("id") == "c05").collect()
    }
    assert stored == fresh
    # incremental result identical to full rebuild
    rebuilt = {
        (r["id"], r["table_idx"], r["hash"])
        for r in lsh_mod.hash_table_df(engine.chunks("libA"), planes).collect()
    }
    incremental = {(r["id"], r["table_idx"], r["hash"]) for r in idx.collect()}
    assert incremental == rebuilt


def test_update_chunk_text_reassigns_ivf_with_frozen_centroids(engine, spark):
    engine.index_library("libA", "ivf")
    centroids = np.load(engine._centroids_path("libA"))
    engine.update_chunk_texts("libA", {"c06": "changed text entirely"})
    # centroids must NOT move (reference never retrains once trained)
    assert np.array_equal(np.load(engine._centroids_path("libA")), centroids)
    idx = spark.read.parquet(engine._index_dir("ivf", "libA"))
    assert idx.count() == 16
    row = idx.filter(F.col("id") == "c06").collect()[0]
    # assignment matches argmin against the frozen centroids
    emb = engine.chunks("libA").filter(F.col("id") == "c06").collect()[0]["embedding"]
    d = np.linalg.norm(centroids - np.asarray(emb, dtype=np.float64), axis=1)
    assert row["cluster_id"] == int(np.argmin(d))


def test_delete_all_chunks_empties_library(engine):
    ids = [f"c{i:02d}" for i in range(16, 24)]
    engine.delete_chunks("libB", ids)
    assert engine.chunks("libB").count() == 0
    assert engine.chunks("libA").count() == 16
