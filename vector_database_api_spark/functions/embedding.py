"""Deterministic text embedder — hermetic replacement for the reference's
Cohere dependency.

Reference: ``/root/reference/app/utils/embedding.py:23-63`` calls the Cohere
``/v2/embed`` HTTP API per batch (S11), which makes its own test suite
require a live API key (test_basic.py imports fail without one — SURVEY §5).
Our engine keeps the same *shape* — a batched, vectorized embedding stage —
but derives vectors deterministically from the text, so every test and
oracle run is reproducible offline.

This is an Arrow-batched pandas UDF: for a real provider the same function
body would issue one HTTP call per batch (amortized exactly like the
reference's ``generate_embeddings`` list API); the Spark-side contract
(ARRAY<FLOAT> column out, batch-parallel per partition, no driver
involvement) is identical either way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


def text_to_vector(text: str, dim: int) -> np.ndarray:
    """Unit-norm vector seeded from the text's sha256 — stable across
    processes, partitionings, and sessions."""
    seed = int.from_bytes(
        hashlib.sha256(text.encode("utf-8")).digest()[:8], "big"
    )
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def make_embedder(dim: int = 64):
    """Returns a pandas UDF embedding a STRING column into ARRAY<FLOAT>."""

    @pandas_udf("array<float>")
    def embed(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: text_to_vector(t if t is not None else "", dim).tolist()
        )

    return embed


def embed_text(col: Column | str, dim: int = 64) -> Column:
    """Column helper: ``embed_text("text")`` -> ARRAY<FLOAT> embedding."""
    return make_embedder(dim)(col)
