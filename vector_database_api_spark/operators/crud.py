"""CRUD / mutation semantics over immutable snapshots.

Reference: ``/root/reference/app/database/storage.py`` — dict-backed
insert/get/update/delete with cascades and edge-list bookkeeping under
reader-writer locks.  In Spark the same capability is snapshot-functional:
every mutation is a pure DataFrame -> DataFrame transformation; "commit" is
an atomic table overwrite (or a Delta MERGE on a real deployment), which
replaces the reference's in-process locking with snapshot isolation
(concurrency.py is capability-matched by storage, not code — SURVEY §1.2).

Operators:

- insert            (S2, storage.py:35-44,98-114,175-190)
- update_by_id      (S4, storage.py:50-65: None fields ignored => coalesce)
- delete_cascade    (S5, storage.py:67-90: library -> documents -> chunks)
- truncate          (S9, storage.py:267-276)
- integrity_audit   (S10, storage.py:278-306: orphans per FK, anti-joins)
- assemble_nested   (P2, library_service.py:52-55: parent row + ARRAY<STRUCT>
                     of children)
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def insert_rows(table: DataFrame, new_rows: DataFrame) -> DataFrame:
    """Append rows (S2).  ``unionByName`` keeps schema alignment explicit."""
    return table.unionByName(new_rows)


def update_by_id(
    table: DataFrame,
    patch: DataFrame,
    id_col: str = "id",
) -> DataFrame:
    """Partial update (S4): for every column present in ``patch``, non-NULL
    patch values win; NULL means "leave unchanged" — the reference drops
    None fields before setattr (service ``model_dump`` + None-filter,
    library_service.py:66-69).  Rows absent from ``patch`` pass through."""
    patch_cols = [c for c in patch.columns if c != id_col]
    renamed = patch.select(
        F.col(id_col), *[F.col(c).alias(f"_patch_{c}") for c in patch_cols]
    )
    joined = table.join(renamed, id_col, "left")
    out_cols = []
    for c in table.columns:
        if c == id_col:
            out_cols.append(F.col(c))
        elif c in patch_cols:
            out_cols.append(F.coalesce(F.col(f"_patch_{c}"), F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def delete_cascade(
    libraries: DataFrame,
    documents: DataFrame,
    chunks: DataFrame,
    library_ids: Iterable[str],
) -> dict[str, DataFrame]:
    """Cascade delete (S5): removing libraries removes their documents and
    chunks — one anti-join per level, no driver-side iteration."""
    doomed = list(library_ids)
    lib_out = libraries.filter(~F.col("id").isin(doomed))
    doc_out = documents.filter(~F.col("library_id").isin(doomed))
    # chunks cascade through their parent document (FK document_id), the
    # same two-hop the reference walks via edge lists (storage.py:78-87)
    doomed_docs = documents.filter(F.col("library_id").isin(doomed)).select(
        F.col("id").alias("document_id")
    )
    chunk_out = chunks.join(doomed_docs, "document_id", "left_anti")
    return {"libraries": lib_out, "documents": doc_out, "chunks": chunk_out}


def delete_documents_cascade(
    documents: DataFrame, chunks: DataFrame, document_ids: Iterable[str]
) -> dict[str, DataFrame]:
    """Document-level cascade (storage.py:137-161)."""
    doomed = list(document_ids)
    return {
        "documents": documents.filter(~F.col("id").isin(doomed)),
        "chunks": chunks.filter(~F.col("document_id").isin(doomed)),
    }


def truncate(table: DataFrame) -> DataFrame:
    """S9: empty snapshot with the same schema."""
    return table.filter(F.lit(False))


def integrity_audit(
    libraries: DataFrame, documents: DataFrame, chunks: DataFrame
) -> DataFrame:
    """S10: referential-integrity violations — children whose parent id has
    no matching row, one anti-join per FK, unioned with a violation tag."""
    orphan_docs = (
        documents.join(
            libraries.select(F.col("id").alias("library_id")),
            "library_id",
            "left_anti",
        )
        .select(
            F.lit("orphan_document").alias("violation"),
            F.col("id").alias("entity_id"),
            F.col("library_id").alias("missing_parent_id"),
        )
    )
    orphan_chunks = (
        chunks.join(
            documents.select(F.col("id").alias("document_id")),
            "document_id",
            "left_anti",
        )
        .select(
            F.lit("orphan_chunk").alias("violation"),
            F.col("id").alias("entity_id"),
            F.col("document_id").alias("missing_parent_id"),
        )
    )
    return orphan_docs.unionByName(orphan_chunks)


def assemble_nested(
    parents: DataFrame,
    children: DataFrame,
    parent_id_col: str,
    child_fk_col: str,
    child_struct_cols: list[str],
    children_alias: str = "children",
) -> DataFrame:
    """P2 nested read model: parent rows with an ARRAY<STRUCT> of their
    children (sorted for determinism) — the reference's read-time join +
    list assembly (library_service.py:52-55) as one groupBy."""
    nested = (
        children.groupBy(F.col(child_fk_col).alias(parent_id_col))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(*[F.col(c) for c in child_struct_cols]))
            ).alias(children_alias)
        )
    )
    return parents.join(nested, parent_id_col, "left")
