"""Custom Python data source: partition planning, determinism, write path."""

from __future__ import annotations

import json
import os

import pytest

from vector_database_api_spark.sources.pydatasource import register_synthdocs


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_synthdocs(spark)


def _load(spark, rows=100, partitions=4, seed=42):
    return (
        spark.read.format("synthdocs")
        .option("rows", str(rows))
        .option("partitions", str(partitions))
        .option("seed", str(seed))
        .load()
    )


def test_partition_planning_and_row_coverage(spark):
    df = _load(spark, rows=103, partitions=5)
    assert df.rdd.getNumPartitions() == 5
    ids = sorted(r.doc_id for r in df.collect())
    assert ids == list(range(103))


def test_deterministic_across_parallelism(spark):
    """Same (seed, rows) must yield identical rows at any partition count —
    the property that makes the source safe to re-read on task retry or
    re-plan on a differently-sized cluster."""
    a = {r.doc_id: (r.text, r.lang, r.source) for r in _load(spark, 50, 2).collect()}
    b = {r.doc_id: (r.text, r.lang, r.source) for r in _load(spark, 50, 7).collect()}
    assert a == b
    c = {r.doc_id: r.text for r in _load(spark, 50, 2, seed=7).collect()}
    assert any(c[i] != a[i][0] for i in c)  # seed actually matters


def test_n_chars_matches_text(spark):
    for r in _load(spark, 20, 2).collect():
        assert r.n_chars == len(r.text)


def test_jsonl_writer_two_phase_commit(spark, tmp_path):
    out = str(tmp_path / "snap")
    df = _load(spark, rows=40, partitions=3)
    df.write.format("synthdocs").option("path", out).mode("append").save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["rows"] == 40
    seen = []
    for f in manifest["files"]:
        with open(f) as fh:
            seen += [json.loads(line) for line in fh.read().splitlines() if line]
    assert sorted(d["doc_id"] for d in seen) == list(range(40))
    # values round-trip
    orig = {r.doc_id: r.text for r in df.collect()}
    assert all(orig[d["doc_id"]] == d["text"] for d in seen)
