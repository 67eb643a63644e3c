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


def test_range_sorted_layout_skips_row_groups(spark, sf_dir, tmp_path):
    """Range-clustered parquet: row-group min/max stats on the sort key
    become non-overlapping, so a selective range predicate needs only a
    small fraction of row groups — verified from the parquet footers
    (what the scan's row-group skipping reads), plus result parity."""
    import pyarrow.parquet as pq

    from vector_database_api_spark.sources.formats import write_range_sorted

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    sorted_dir = str(tmp_path / "sorted")
    write_range_sorted(
        li, sorted_dir, ["l_orderkey"], num_files=2, rowgroup_bytes=8 * 1024
    )

    def rowgroup_ranges(d):
        out = []
        for f in sorted(str(p) for p in __import__("pathlib").Path(d).glob("*.parquet")):
            md = pq.ParquetFile(f).metadata
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(0).statistics
                out.append((st.min, st.max, md.row_group(g).num_rows))
        return out

    ranges = rowgroup_ranges(sorted_dir)
    assert len(ranges) >= 8, f"want multiple row groups, got {len(ranges)}"
    # non-overlapping: sort by min, every group's max below next group's min
    # (allow equal boundary key on the seam)
    rs = sorted(ranges)
    assert all(a[1] <= b[0] for a, b in zip(rs, rs[1:]))

    # a tight range predicate touches few groups by stats
    lo, hi = rs[0][1], rs[1][1]  # spans ~2 groups
    touched = sum(1 for mn, mx, _ in ranges if not (mx < lo or mn > hi))
    assert touched <= max(3, len(ranges) // 4)

    # and results match the unsorted source
    got = (
        spark.read.parquet(sorted_dir)
        .filter((F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi))
        .count()
    )
    want = li.filter((F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi)).count()
    assert got == want


def test_xml_roundtrip_with_explicit_schema(spark, sf_dir, tmp_path):
    """Native XML source/sink (Spark 4): write nation as XML rows, read
    back with an explicit schema, values identical."""
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = str(tmp_path / "nation_xml")
    nation.write.format("xml").option("rowTag", "row").mode("overwrite").save(path)
    back = FMT.read_files(
        spark,
        path,
        fmt="xml",
        schema="n_nationkey bigint, n_name string, n_regionkey bigint",
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_zorder_tightens_both_columns(spark, sf_dir, tmp_path):
    """Z-order clustering on (user_id, value): per-FILE min/max spans are
    tight on BOTH dimensions, where a single-key sort leaves the second
    column's spans at ~full width — the footer stats a multi-dimension
    file-skipping scan actually uses."""
    import pathlib

    import pyarrow.parquet as pq

    from vector_database_api_spark.sources.formats import (
        write_range_sorted,
        write_zorder,
    )
    from vector_database_api_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    n_files = 16
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    write_zorder(ev, zdir, ["user_id", "value"], num_files=n_files, bits=8)
    write_range_sorted(ev, sdir, ["user_id"], num_files=n_files)

    def file_spans(d, col_idx):
        spans = []
        for f in sorted(str(p) for p in pathlib.Path(d).glob("*.parquet")):
            md = pq.ParquetFile(f).metadata
            mn = min(
                md.row_group(g).column(col_idx).statistics.min
                for g in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(g).column(col_idx).statistics.max
                for g in range(md.num_row_groups)
            )
            spans.append((mn, mx))
        return spans

    def avg_frac(spans):
        lo = min(s[0] for s in spans)
        hi = max(s[1] for s in spans)
        return sum((b - a) for a, b in spans) / len(spans) / (hi - lo)

    # single-key sort: first column tight, second near-full-width
    sv = avg_frac(file_spans(sdir, 1))
    assert avg_frac(file_spans(sdir, 0)) < 0.15
    assert sv > 0.5
    # z-order: BOTH columns substantially tighter than full width, and the
    # second column far tighter than the single-key layout leaves it
    zu, zv = avg_frac(file_spans(zdir, 0)), avg_frac(file_spans(zdir, 1))
    assert zu < 0.5 and zv < 0.5, (zu, zv)
    assert zv < sv * 0.7, (zv, sv)
    # and the rewritten table is the same multiset of rows
    assert spark.read.parquet(zdir).count() == ev.count()
    got = spark.read.parquet(zdir).groupBy("user_id").count()
    want = ev.groupBy("user_id").count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
