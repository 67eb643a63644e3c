"""File-format sources and sinks beyond the driver's parquet.

The reference has no storage formats at all — everything lives in
in-process dicts (app/database/storage.py:20-26).  A 100 TB engine lives
or dies by its table layout, so this module makes the layout decisions
explicit and testable:

- **Readers** for parquet / csv / json / orc with explicit schema
  (schema inference is a full extra pass over the data — never at scale).
- **Partitioned writer**: hive-style ``partitionBy`` layout so equality
  predicates on the partition key become directory pruning (the on-disk
  analogue of the reference's per-library dict scoping,
  app/database/storage.py:242-249).
- **Bucketed writer**: ``bucketBy`` on the join key so repeated big-table
  joins skip their shuffle entirely (proven shuffle-free in
  tests/test_plans.py::test_bucketed_tables_join_without_shuffle).
- **Small-file compaction**: streaming ingestion (M1) appends one file
  per micro-batch per partition; compaction rewrites a table to
  size-targeted files.  At 100 TB uncompacted small files dominate task
  scheduling and NameNode/listing overhead — this is maintenance you
  schedule, not an option you set.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

READ_FORMATS = ("parquet", "csv", "json", "orc", "xml")


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Format-dispatched reader.  ``schema`` is required for csv/json:
    inference reads the data twice and silently widens types (a '1' in a
    later file turns the column into string) — at scale schemas are
    declared, never discovered."""
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {READ_FORMATS}")
    if fmt in ("csv", "json", "xml") and schema is None:
        raise ValueError(f"{fmt} requires an explicit schema (no inference)")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        # quoted newlines inside text fields: without multiLine the reader
        # treats every physical line as a record and silently drops rows
        options.setdefault("multiLine", "true")
    if fmt == "xml":
        # native XML source (new in Spark 4) — rowTag is mandatory
        options.setdefault("rowTag", "row")
    return reader.options(**options).load(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-layout write: one directory per partition value.  Equality
    filters on ``partition_cols`` then prune directories at planning time
    (PartitionFilters in the scan, not data filters)."""
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    num_buckets: int = 8,
    fmt: str = "parquet",
) -> None:
    """Bucketed + sorted layout (requires saveAsTable: bucketing metadata
    lives in the catalog).  Two tables bucketed the same way sort-merge
    join with zero Exchange."""
    (
        df.write.format(fmt)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table_name)
    )


def compact_small_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_file_bytes: int = 128 * 1024 * 1024,
    schema=None,
) -> int:
    """Rewrite a table directory to ~``target_file_bytes`` files; returns
    the file count written.  Uses the table's current on-disk size (from
    the files scan) to choose the repartition width — no driver-side data
    movement, one distributed shuffle-free coalesce when shrinking.

    In-place rewrite via an adjacent temp dir + atomic-ish swap: at 100 TB
    this would be a transactional overwrite (Delta/Iceberg rewrite
    action); plain parquet has no transaction, so the swap window is the
    documented trade-off.
    """
    import shutil
    import tempfile
    from pathlib import Path

    df = read_files(spark, path, fmt=fmt, schema=schema)
    size_bytes = sum(
        f.stat().st_size
        for f in Path(path).rglob("*")
        if f.is_file() and not f.name.startswith(("_", "."))
    )
    n_files = max(1, math.ceil(size_bytes / target_file_bytes))
    tmp = tempfile.mkdtemp(dir=str(Path(path).parent), prefix="_compact_")
    df.coalesce(n_files).write.format(fmt).mode("overwrite").save(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n_files


def read_json_tolerant(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """PERMISSIVE json read with corrupt-row capture: malformed lines land
    in ``corrupt_col`` instead of failing the job or being silently
    dropped.  At 100 TB some fraction of any feed is malformed; the
    pipeline decision (quarantine vs fail) must be explicit, so this
    returns ALL rows and the caller splits on ``corrupt_col IS NULL``.
    """
    full_schema = f"{schema}, {corrupt_col} string"
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def split_quarantine(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) split of a tolerant read.  Spark requires
    caching before filtering on the corrupt column (the raw record is
    only retained while the batch is materialized)."""
    from pyspark.sql import functions as F

    df = df.cache()
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return clean, bad


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    fmt: str = "parquet",
    rowgroup_bytes: int | None = None,
) -> None:
    """Range-clustered layout: globally range-partition on ``sort_cols``
    and sort within each file, so every parquet row group covers a tight,
    non-overlapping min/max range of the sort key.

    This is the file-skipping half of the scan story (partition dirs and
    buckets being the other two): a pushed-down range/equality predicate
    on the sort key lets the parquet reader drop whole row groups from
    their footer stats before any page IO.  At 100 TB the same layout is
    what Z-ordering/liquid clustering generalize to multiple keys; for a
    single dominant key a plain range sort is strictly tighter.
    ``rowgroup_bytes`` caps the parquet row-group (block) size in BYTES —
    shrink it for small test data; leave None in production (default
    128 MB groups).
    """
    w = df.repartitionByRange(
        *( [num_files] if num_files else [] ), *sort_cols
    ).sortWithinPartitions(*sort_cols).write.format(fmt).mode("overwrite")
    if rowgroup_bytes is not None:
        # parquet sizes row groups in bytes; cap block size so small test
        # datasets still produce multiple groups per file
        w = w.option("parquet.block.size", str(max(4 * 1024, rowgroup_bytes)))
    w.save(path)


def zorder_bucket(col, lo, hi, bits: int):
    """Min-max bucket of a numeric column into [0, 2^bits): floor((x - lo)
    * scale) clamped, with scale = (2^bits - 1)/(hi - lo); degenerate
    bounds (hi <= lo) map everything to 0.  ``lo``/``hi`` are Columns so
    bounds can stay in-plan (computed by an aggregation, broadcast by
    crossJoin) — no driver round-trip, and the identical arithmetic is
    SQL-expressible for the DuckDB oracle."""
    from pyspark.sql import functions as F

    m = (1 << bits) - 1
    c = F.col(col) if isinstance(col, str) else col
    scale = F.when(hi > lo, F.lit(float(m)) / (hi - lo)).otherwise(F.lit(0.0))
    b = F.floor((c.cast("double") - lo) * scale)
    return F.least(F.greatest(b, F.lit(0)), F.lit(m)).cast("bigint")


def zorder_address(buckets, bits: int):
    """Interleave the bits of n bucket columns into one Z-curve address:
    bit i of bucket j lands at position i*n + j.  Pure JVM shift/and/or
    expressions (whole-stage codegen), 2*bits*n terms unrolled."""
    from functools import reduce

    from pyspark.sql import functions as F

    n = len(buckets)
    terms = []
    for j, b in enumerate(buckets):
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return reduce(lambda a, c: a.bitwiseOR(c), terms)


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int | None = None,
    bits: int = 16,
    fmt: str = "parquet",
    rowgroup_bytes: int | None = None,
) -> None:
    """Z-order-clustered layout (the multi-key generalization of
    ``write_range_sorted``, i.e. what Delta OPTIMIZE ZORDER / Iceberg
    sort orders do): min-max bucket each clustering column, interleave
    the bucket bits into a Z-curve address, then range-partition and
    sort the files by that address.

    Every file then covers a small hyper-rectangle of the clustered
    dimensions, so footer min/max stats prune files for predicates on
    ANY of the columns — where a single-key sort gives tight spans on
    the leading key only (proven in tests/test_formats.py::
    test_zorder_tightens_both_columns).  The bounds aggregation is one
    tiny job; the curve address is pure JVM bit arithmetic."""
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
            )
        ]
    )
    with_z = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__z",
        zorder_address(
            [
                zorder_bucket(
                    c, F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits
                )
                for c in cols
            ],
            bits,
        ),
    ).drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])
    w = (
        with_z.repartitionByRange(
            *([num_files] if num_files else []), "__z"
        )
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(fmt)
        .mode("overwrite")
    )
    if rowgroup_bytes is not None:
        w = w.option("parquet.block.size", str(max(4 * 1024, rowgroup_bytes)))
    w.save(path)
