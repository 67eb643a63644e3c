"""Document chunking: fan-out correctness invariants."""

from __future__ import annotations

import pytest

from vector_database_api_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a" * 250),
        (2, "short"),
        (3, ""),
        (4, "x" * 120),  # exactly one window
        (5, "y" * 121),  # one char past -> second window
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_every_document_survives(docs):
    out = chunk_documents(docs, chunk_size=120, overlap=20)
    assert {r.doc_id for r in out.select("doc_id").distinct().collect()} == {
        1,
        2,
        3,
        4,
        5,
    }


def test_window_count_and_indices(docs):
    out = chunk_documents(docs, chunk_size=120, overlap=20).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # stride 100: len 250 -> offsets 0,100,200 -> 3 chunks
    assert len(by_doc[1]) == 3
    assert sorted(r.chunk_idx for r in by_doc[1]) == [0, 1, 2]
    assert len(by_doc[2]) == 1
    assert len(by_doc[3]) == 1 and by_doc[3][0].chunk_text == ""
    assert len(by_doc[4]) == 1
    assert len(by_doc[5]) == 2


def test_reconstruction_with_overlap(docs, spark):
    """Dropping the first `overlap` chars of every chunk after the first
    reassembles the original text exactly — no gaps, no repeats."""
    text = "".join(chr(97 + i % 26) for i in range(333))
    df = spark.createDataFrame([(9, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_size=120, overlap=20).collect(),
        key=lambda r: r.chunk_idx,
    )
    rebuilt = rows[0].chunk_text + "".join(r.chunk_text[20:] for r in rows[1:])
    assert rebuilt == text


def test_max_chunks_cap(docs):
    out = chunk_documents(docs, chunk_size=120, overlap=20, max_chunks=2)
    counts = {
        r.doc_id: r["n"]
        for r in out.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    assert counts[1] == 2  # capped from 3


def test_overlap_must_be_smaller_than_chunk(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=50, overlap=50)
