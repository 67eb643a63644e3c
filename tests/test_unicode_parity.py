"""Cross-engine text-unit semantics on NON-BMP input (r5 stretch task):
the char-level queries (char entropy, winnow k-gram fingerprints)
documented a BMP-only assumption — "Spark counts UTF-16 units, DuckDB
codepoints".  Empirically BOTH engines are codepoint-based (Spark's
UTF8String length/substring/split('') all advance by codepoint, as does
DuckDB), including astral-plane chars (surrogate pairs in UTF-16).
These tests pin that parity on non-BMP fixtures so the assumption is
TESTED, not just documented."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from vector_database_api_spark.functions import text as T

# astral-plane chars: 𝄞 U+1D11E (musical clef), 😀 U+1F600 (emoji) —
# both are surrogate pairs in UTF-16, 4 bytes in UTF-8
ROWS = [
    (1, "a\U0001d11eb\U0001d11ea\U0001d11eb repeated clef line here!"),
    (2, "\U0001f600\U0001f600\U0001f600 emoji run with ascii tail xx"),
    (3, "plain ascii control row for the same expressions to chew"),
    (4, "mixéd bmp accents 中文 and \U0001f680 rocket"),
]


def _duck(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    return con


def test_length_split_substring_codepoint_parity(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    con = _duck(ROWS)
    spark_len = {
        r["doc_id"]: r["l"]
        for r in df.select("doc_id", F.length("text").alias("l")).collect()
    }
    duck_len = dict(con.sql("SELECT doc_id, length(text) FROM d").fetchall())
    py_len = {d: len(t) for d, t in ROWS}  # Python len = codepoints
    assert spark_len == duck_len == py_len
    # split('') yields whole codepoints (never surrogate halves)
    chars = {
        r["doc_id"]: [c for c in r["s"] if c != ""]
        for r in df.select(
            "doc_id", F.split("text", "").alias("s")
        ).collect()
    }
    assert chars == {d: list(t) for d, t in ROWS}


def test_char_entropy_math_non_bmp_parity(spark):
    """The exact char-entropy pipeline (explode split chars -> exact
    counts -> (ln n - sum c*ln c / n) / ln 2) produces identical doubles
    on both engines for non-BMP docs."""
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    chars = df.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    cc = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    got = {
        r["doc_id"]: r["h"]
        for r in cc.groupBy("doc_id")
        .agg(
            (
                (F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"))
                / math.log(2.0)
            ).alias("h")
        )
        .collect()
    }
    con = _duck(ROWS)
    want = dict(
        con.sql(
            """
            WITH ch AS (
              SELECT doc_id, unnest(string_split(text, '')) AS ch FROM d
            ),
            cc AS (
              SELECT doc_id, ch, count(*) AS c FROM ch
              WHERE ch != '' GROUP BY doc_id, ch
            )
            SELECT doc_id,
                   (ln(sum(c)) - sum(c * ln(c)) / sum(c)) / ln(2)
            FROM cc GROUP BY doc_id
            """
        ).fetchall()
    )
    assert set(got) == set(want)
    for d in got:
        assert got[d] == want[d], d  # bit-exact, not approx
    # Python ground truth (codepoint counts) agrees too
    for d, t in ROWS:
        n = len(t)
        counts = {}
        for c in t:
            counts[c] = counts.get(c, 0) + 1
        h = (
            math.log(n) - sum(c * math.log(c) for c in counts.values()) / n
        ) / math.log(2.0)
        assert got[d] == pytest.approx(h, abs=1e-12)


def test_winnow_fingerprints_non_bmp_parity(spark):
    """k-gram hashing + winnow minima agree across engines on non-BMP
    text, and a shared substring containing astral chars still collides
    (the detection guarantee survives outside the BMP)."""
    k, w = 12, 6
    shared = "the \U0001f600 shared passage \U0001d11e body"
    rows = [
        (1, "prefix one " + shared + " tail a"),
        (2, "different lead-in " + shared + " other"),
        (3, "unrelated control text with no overlap at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").filter(
        F.length("text") >= k + w - 1
    )
    out = df.select(
        "doc_id", F.expr(T.spark_kgram_hashes("text", k)).alias("hashes")
    ).select(
        "doc_id", F.expr(T.spark_winnow_select("hashes", w)).alias("fps")
    )
    got = {r["doc_id"]: set(r["fps"]) for r in out.collect()}
    con = _duck(rows)
    duck = con.sql(
        f"""
        WITH h AS (
          SELECT doc_id, {T.duck_kgram_hashes('text', k)} AS hashes
          FROM d WHERE length(text) >= {k + w - 1}
        )
        SELECT doc_id, {T.duck_winnow_select('hashes', w)} AS fps FROM h
        """
    ).fetchall()
    want = {d: set(fps) for d, fps in duck}
    assert got == want
    # guarantee: docs 1 and 2 share a >= k+w-1-char substring -> collide
    assert got[1] & got[2]
    assert not (got[1] & got[3])
