"""Metadata-filter mini-language semantics (search_service.py:155-197)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from vector_database_api_spark.operators.filters import apply_metadata_filters


def _chunks(spark):
    rows = [
        Row(
            id="c1",
            metadata={"topic": "python", "level": "beginner"},
            created_at=datetime.datetime(2024, 1, 1),
        ),
        Row(
            id="c2",
            metadata={"topic": "ml"},
            created_at=datetime.datetime(2024, 6, 1),
        ),
        Row(id="c3", metadata={}, created_at=datetime.datetime(2024, 12, 1)),
    ]
    return spark.createDataFrame(rows)


def ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_exact_match_and_missing_key(spark):
    df = _chunks(spark)
    assert ids(apply_metadata_filters(df, {"topic": "python"})) == ["c1"]
    # missing key => no match (reference search_service.py:188-191)
    assert ids(apply_metadata_filters(df, {"level": "beginner"})) == ["c1"]
    assert ids(apply_metadata_filters(df, {"nope": "x"})) == []


def test_conjunction(spark):
    df = _chunks(spark)
    assert ids(
        apply_metadata_filters(df, {"topic": "python", "level": "beginner"})
    ) == ["c1"]
    assert ids(apply_metadata_filters(df, {"topic": "python", "level": "pro"})) == []


def test_created_after_before(spark):
    df = _chunks(spark)
    # strict comparisons (search_service.py:170-178)
    assert ids(
        apply_metadata_filters(df, {"created_after": datetime.datetime(2024, 3, 1)})
    ) == ["c2", "c3"]
    assert ids(
        apply_metadata_filters(df, {"created_before": datetime.datetime(2024, 6, 1)})
    ) == ["c1"]
    assert ids(
        apply_metadata_filters(
            df,
            {
                "created_after": datetime.datetime(2024, 3, 1),
                "created_before": datetime.datetime(2024, 9, 1),
            },
        )
    ) == ["c2"]


def test_contains_case_insensitive(spark):
    df = _chunks(spark)
    assert ids(apply_metadata_filters(df, {"topic_contains": "PYTH"})) == ["c1"]
    assert ids(apply_metadata_filters(df, {"topic_contains": "zzz"})) == []


def test_empty_filters_is_noop(spark):
    df = _chunks(spark)
    assert ids(apply_metadata_filters(df, {})) == ["c1", "c2", "c3"]
    assert ids(apply_metadata_filters(df, None)) == ["c1", "c2", "c3"]
