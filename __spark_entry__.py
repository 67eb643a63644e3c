"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship filtered kNN on sf0.001.
``queries()`` / ``oracle_sql()`` — the oracle-checked registry, defined in
``vector_database_api_spark/queries.py`` (single source of truth so Spark
code and DuckDB SQL stay aligned).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_database_api_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Filtered brute-force cosine kNN: metadata filter -> scoring via JVM
    higher-order functions -> TakeOrderedAndProject top-k (reference
    _fallback_search semantics, search_service.py:112-153).
    """
    return _q.knn_filtered(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.spark_queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_queries()
