"""PySpark-native analytics engine with the capabilities of
``nicoamigosa/vector-database-api`` (reference: an in-memory FastAPI vector DB
with a Library -> Document -> Chunk hierarchy, SRP-LSH / IVF ANN indexes and
filtered top-k cosine search).

This package re-expresses those semantics Spark-first: DataFrame/SQL plans
optimized by Catalyst, MLlib for index training, Structured Streaming for
incremental maintenance, plus the LLM-data-pipeline operator surface (dedup,
similarity join, text analysis) the reference's capability class implies at
100 TB scale.
"""

from vector_database_api_spark.config import EngineConfig
from vector_database_api_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]
__version__ = "0.1.0"
