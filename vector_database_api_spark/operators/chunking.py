"""Document → chunk splitting as a distributed operator.

The reference's data model is Library → Document → Chunk
(app/models.py:21-34); chunks arrive pre-split via the REST API
(POST /api/v1/chunks, app/api/routes/chunks.py:9-20) and the split
itself happens outside the engine (demo.py hand-writes chunk texts).
For a 100 TB corpus the split IS an engine operator: every document
fans out to overlapping fixed-width windows, embarrassingly parallel,
no shuffle — `sequence` + `posexplode` + `substring`, all JVM
expressions inside whole-stage codegen.

The reference's declared capacity limit `max_chunks_per_document=1000`
(app/config.py:21) maps to an optional cap on the generated offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 120,
    overlap: int = 20,
    max_chunks: int | None = None,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_chunk_chars): overlapping
    character windows of ``chunk_size`` advancing by ``chunk_size -
    overlap``.  Empty documents yield one empty chunk (offset 0), so
    every document survives the fan-out — no silent row loss.  A window
    is only started if it contributes at least one character beyond the
    previous window's coverage (offset bound ``len - overlap - 1``), so
    no chunk is fully contained in its predecessor.
    """
    if overlap >= chunk_size:
        raise ValueError(f"overlap={overlap} must be < chunk_size={chunk_size}")
    stride = chunk_size - overlap
    offsets = F.sequence(
        F.lit(0),
        F.greatest(F.length(text_col) - F.lit(overlap + 1), F.lit(0)),
        F.lit(stride),
    )
    if max_chunks is not None:
        offsets = F.slice(offsets, 1, max_chunks)
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
        F.posexplode(offsets).alias("chunk_idx", "off"),
    )
    chunk = F.expr(f"substring(_t, off + 1, {chunk_size})")
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        chunk.alias("chunk_text"),
        F.length(chunk).alias("n_chunk_chars"),
    )


def duck_chunk_documents_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 120,
    overlap: int = 20,
) -> str:
    """DuckDB mirror of :func:`chunk_documents` (same offsets, same
    substring windows)."""
    stride = chunk_size - overlap
    return f"""
    SELECT {id_col} AS doc_id,
           CAST(off // {stride} AS INTEGER) AS chunk_idx,
           substring({text_col}, CAST(off AS INTEGER) + 1, {chunk_size}) AS chunk_text,
           length(substring({text_col}, CAST(off AS INTEGER) + 1, {chunk_size})) AS n_chunk_chars
    FROM (
      SELECT {id_col}, {text_col},
             unnest(generate_series(0, greatest(length({text_col}) - {overlap + 1}, 0), {stride})) AS off
      FROM {table}
    )
    """
