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


# ---------------------------------------------------------------------------
# SQL-mirrorable twin (md5 arithmetic) — the oracle-checkable seam
# ---------------------------------------------------------------------------

MD5_DIM = 8  # 32 hex chars / 4-hex windows


def md5_text_to_vector(text: str | None) -> list[float]:
    """Unit-norm 8-d DOUBLE vector from md5 arithmetic — every step is
    plain SQL (``queries.py::embed_texts_deterministic`` carries the
    DuckDB twin, so the embedding seam is VALUE-hash-gated, not
    rows-only): component j = int(md5hex[4j:4j+4], 16) / 32768 - 1,
    then divide by the l2 norm (sequential left-to-right double fold,
    the functions/vector.py convention, so the SQL ``c0*c0 + c1*c1 +
    ...`` left-associative chain matches bit-exactly).  Zero norm keeps
    the raw components (the V1 zero-norm convention).  The production
    seam stays :func:`text_to_vector` (sha256+PCG64, better spread);
    this twin exists so the external-source plumbing itself — Arrow
    batches, ARRAY column out, NULL->'' — is cross-engine checkable."""
    h = hashlib.md5((text if text is not None else "").encode("utf-8")).hexdigest()
    comps = [int(h[4 * j : 4 * j + 4], 16) / 32768.0 - 1.0 for j in range(MD5_DIM)]
    s = 0.0
    for c in comps:
        s += c * c
    n = float(np.sqrt(s))
    return [c / n for c in comps] if n > 0 else comps


def make_md5_embedder():
    """ARRAY<DOUBLE> pandas UDF over :func:`md5_text_to_vector` — DOUBLE
    (not the serving seam's FLOAT) so the oracle compare is bit-exact."""

    @pandas_udf("array<double>")
    def embed_md5(texts: pd.Series) -> pd.Series:
        return texts.map(md5_text_to_vector)

    return embed_md5


def embed_text_md5(col: Column | str) -> Column:
    return make_md5_embedder()(col)


def duck_md5_embed_cte(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB CTE body computing the same unit-norm md5 embedding:
    ``emb AS (SELECT *, [nc0..nc7] ...)`` exposing columns nc0..nc7."""
    comps = ", ".join(
        f"CAST(concat('0x', substr(md5(coalesce({text_col}, '')), {4 * j + 1}, 4)) "
        f"AS INTEGER) / 32768.0 - 1.0 AS c{j}"
        for j in range(MD5_DIM)
    )
    sq = " + ".join(f"c{j}*c{j}" for j in range(MD5_DIM))
    norm = " ".join(
        f"CASE WHEN nrm > 0 THEN c{j} / nrm ELSE c{j} END AS nc{j},"
        for j in range(MD5_DIM)
    ).rstrip(",")
    return (
        f"comp AS (SELECT *, {comps} FROM {table}),\n"
        f"normed AS (SELECT *, sqrt({sq}) AS nrm FROM comp),\n"
        f"emb AS (SELECT *, {norm} FROM normed)"
    )
