"""Format round-trips, partition pruning, and compaction."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from vector_database_api_spark.plans.audit import explain_str
from vector_database_api_spark.sources import formats as FMT
from vector_database_api_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip_preserves_rows(docs, spark, tmp_path, fmt):
    path = str(tmp_path / f"rt_{fmt}")
    # header option matches read_files' csv default (ignored by the
    # self-describing formats); quoting handles newlines in text fields
    docs.write.format(fmt).option("header", "true").mode("overwrite").save(path)
    back = FMT.read_files(spark, path, fmt=fmt, schema=SCHEMA)
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["n_chars"] for r in back.select("doc_id", "n_chars").collect()}
    b = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    assert a == b


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        FMT.read_files(spark, str(tmp_path), fmt="csv")


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        FMT.read_files(spark, str(tmp_path), fmt="avro")


def test_partitioned_write_prunes(docs, spark, tmp_path):
    path = str(tmp_path / "by_lang")
    FMT.write_partitioned(docs, path, ["lang"])
    langs = [d.name for d in Path(path).iterdir() if d.name.startswith("lang=")]
    assert len(langs) >= 2
    back = FMT.read_files(spark, path)
    one = back.filter(F.col("lang") == back.select("lang").first()["lang"])
    plan = explain_str(one)
    # the filter must appear as a partition filter on the scan, not a data filter
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert one.count() > 0


def test_compaction_reduces_file_count(docs, spark, tmp_path):
    path = str(tmp_path / "fragmented")
    docs.repartition(16).write.parquet(path)
    before = len([f for f in Path(path).glob("part-*")])
    assert before >= 16
    written = FMT.compact_small_files(spark, path, target_file_bytes=1 << 30)
    after = len([f for f in Path(path).glob("part-*")])
    assert written == 1 and after == 1
    assert FMT.read_files(spark, path).count() == docs.count()


def test_json_tolerant_quarantines_corrupt_rows(spark, tmp_path):
    path = tmp_path / "feed.jsonl"
    path.write_text(
        '{"id": 1, "v": 10.5}\n'
        "this is not json\n"
        '{"id": 2, "v": 20.0}\n'
        '{"id": "oops", "v": []}\n'
    )
    df = FMT.read_json_tolerant(spark, str(path), "id bigint, v double")
    clean, bad = FMT.split_quarantine(df)
    assert {(r["id"], r["v"]) for r in clean.collect()} == {(1, 10.5), (2, 20.0)}
    assert bad.count() == 2  # the non-json line and the type-mismatch line
