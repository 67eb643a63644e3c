"""CRUD semantics vs the reference's storage behavior (storage.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_api_spark.operators import crud as C

LIBS = "id string, name string"
DOCS = "id string, library_id string, name string"
CHUNKS = "id string, document_id string, text string"


def _fixture(spark):
    libs = spark.createDataFrame([("L1", "libA"), ("L2", "libB")], LIBS)
    docs = spark.createDataFrame(
        [("D1", "L1", "d1"), ("D2", "L1", "d2"), ("D3", "L2", "d3")], DOCS
    )
    chunks = spark.createDataFrame(
        [
            ("C1", "D1", "t1"),
            ("C2", "D1", "t2"),
            ("C3", "D2", "t3"),
            ("C4", "D3", "t4"),
        ],
        CHUNKS,
    )
    return libs, docs, chunks


def test_insert(spark):
    libs, _, _ = _fixture(spark)
    out = C.insert_rows(libs, spark.createDataFrame([("L3", "libC")], LIBS))
    assert out.count() == 3


def test_update_coalesce_ignores_null_fields(spark):
    """S4: None/NULL patch fields leave the old value (storage.py:50-65)."""
    libs, _, _ = _fixture(spark)
    patch = spark.createDataFrame([("L1", None), ("L2", "renamed")], LIBS)
    got = {r["id"]: r["name"] for r in C.update_by_id(libs, patch).collect()}
    assert got == {"L1": "libA", "L2": "renamed"}


def test_update_missing_rows_pass_through(spark):
    libs, _, _ = _fixture(spark)
    patch = spark.createDataFrame([("L9", "ghost")], LIBS)
    got = {r["id"]: r["name"] for r in C.update_by_id(libs, patch).collect()}
    assert got == {"L1": "libA", "L2": "libB"}


def test_delete_cascade(spark):
    """S5: deleting L1 removes its documents and their chunks."""
    libs, docs, chunks = _fixture(spark)
    out = C.delete_cascade(libs, docs, chunks, ["L1"])
    assert [r["id"] for r in out["libraries"].collect()] == ["L2"]
    assert [r["id"] for r in out["documents"].collect()] == ["D3"]
    assert [r["id"] for r in out["chunks"].collect()] == ["C4"]


def test_delete_documents_cascade(spark):
    _, docs, chunks = _fixture(spark)
    out = C.delete_documents_cascade(docs, chunks, ["D1"])
    assert sorted(r["id"] for r in out["documents"].collect()) == ["D2", "D3"]
    assert sorted(r["id"] for r in out["chunks"].collect()) == ["C3", "C4"]


def test_truncate(spark):
    libs, _, _ = _fixture(spark)
    out = C.truncate(libs)
    assert out.count() == 0
    assert out.schema == libs.schema


def test_integrity_audit(spark):
    """S10: orphaned children are flagged per FK level."""
    libs, docs, chunks = _fixture(spark)
    docs_bad = C.insert_rows(
        docs, spark.createDataFrame([("D9", "L_GONE", "dangling")], DOCS)
    )
    chunks_bad = C.insert_rows(
        chunks, spark.createDataFrame([("C9", "D_GONE", "dangling")], CHUNKS)
    )
    viol = C.integrity_audit(libs, docs_bad, chunks_bad).collect()
    got = {(r["violation"], r["entity_id"], r["missing_parent_id"]) for r in viol}
    assert got == {
        ("orphan_document", "D9", "L_GONE"),
        ("orphan_chunk", "C9", "D_GONE"),
    }


def test_integrity_audit_clean(spark):
    libs, docs, chunks = _fixture(spark)
    assert C.integrity_audit(libs, docs, chunks).count() == 0


def test_assemble_nested(spark):
    """P2: parent with sorted ARRAY<STRUCT> of children."""
    _, docs, chunks = _fixture(spark)
    out = C.assemble_nested(docs, chunks, "id", "document_id", ["id", "text"])
    row = {r["id"]: r for r in out.collect()}
    assert [c["id"] for c in row["D1"]["children"]] == ["C1", "C2"]
    assert row["D3"]["children"][0]["text"] == "t4"
    # parent with no children -> NULL (left join), matching "empty list on
    # read" semantics after a downstream coalesce
    assert row.get("D2")["children"] == [("C3", "t3")]
