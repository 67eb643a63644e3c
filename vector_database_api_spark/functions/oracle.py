"""DuckDB SQL fragments mirroring ``functions.vector`` bit-for-bit.

Each fragment reproduces the Spark expression's operation order exactly:
element-wise DOUBLE casts, sequential left-to-right accumulation.  Spark's
``aggregate(..., 0.0D, (acc, v) -> acc + v)`` computes ``(((0+p1)+p2)+...)``;
DuckDB's ``list_reduce`` seeds with the first element: ``((p1+p2)+...)``.
IEEE ``0.0 + p1 == p1``, so the two are bit-identical — which is what lets
top-k-by-similarity queries hash-match between the engines.
"""

from __future__ import annotations


def duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
    )


def duck_norm2(a: str) -> str:
    return (
        f"list_reduce(list_transform({a}, "
        f"e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)), (x, y) -> x + y)"
    )


def duck_cosine(a: str, b: str) -> str:
    return (
        f"CASE WHEN {duck_norm2(a)} = 0.0 OR {duck_norm2(b)} = 0.0 THEN 0.0 "
        f"ELSE {duck_dot(a, b)} / (sqrt({duck_norm2(a)}) * sqrt({duck_norm2(b)})) END"
    )


def duck_euclidean(a: str, b: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
        f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), (x, y) -> x + y))"
    )
