from vector_database_api_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    euclidean_distance,
    norm2,
    normalize_vector,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "euclidean_distance",
    "norm2",
    "normalize_vector",
]
