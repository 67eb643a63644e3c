from vector_database_api_spark.sources.tables import (
    DRIVER_TABLES,
    chunks_table,
    documents_table,
    libraries_table,
    load_table,
    load_tables,
)

__all__ = [
    "DRIVER_TABLES",
    "chunks_table",
    "documents_table",
    "libraries_table",
    "load_table",
    "load_tables",
]
