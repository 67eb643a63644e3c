"""Text-analysis functions for the LLM-data-pipeline surface.

These generalize the reference's capability class (it only does
``lower``/``contains`` and word counts — SURVEY §2.6/§2.11) into the
operators a 100 TB training-data pipeline needs: tokenization, language ID,
quality scoring, token counting, fingerprinting, shingling, and the hashed
building blocks for MinHash/SimHash dedup.

Every function here is generated as *paired SQL text* — a Spark expression
and a DuckDB expression with identical operation semantics — so the whole
text surface is oracle-checkable.  All of it is JVM-side (no Python UDFs in
the hot path); the 64-bit shingle hash is the first 60 bits of md5, which
both engines compute identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# stopword lists for the five fixture languages (driver documents.lang)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "que", "pour", "dans", "est", "les"],
    "zh": ["de", "shi", "bu", "le", "zai", "ren", "you", "wo", "ta", "zhe"],
}
# deterministic tie-break: fixed priority order (first wins on equal score)
LANG_PRIORITY = ["en", "de", "es", "fr", "zh"]

# BPE-ish token pattern: letter runs | digit runs | single punctuation
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# MinHash modulus: prime > 2^32 so (a*h32 + b) stays within int64 for
# a < 2^30, h32 < 2^32
MINHASH_PRIME = 4294967311


def spark_tokens(col: str) -> str:
    return f"split(lower({col}), ' ')"


def duck_tokens(col: str) -> str:
    return f"string_split(lower({col}), ' ')"


def spark_token_count(col: str) -> str:
    """BPE-ish token count via regexp extraction (both engines use the same
    RE2/Java-compatible pattern).  Spark's SQL parser processes backslash
    escapes inside string literals (DuckDB's does not), so the pattern is
    double-escaped for Spark only."""
    pat = TOKEN_PATTERN.replace("\\", "\\\\")
    return f"size(regexp_extract_all({col}, '{pat}', 0))"


def duck_token_count(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{TOKEN_PATTERN}'))"


def _stopword_score(tokens_expr: str, words: list[str], engine: str) -> str:
    lits = ", ".join(f"'{w}'" for w in words)
    if engine == "spark":
        return f"size(filter({tokens_expr}, t -> t IN ({lits})))"
    return f"len(list_filter({tokens_expr}, t -> t IN ({lits})))"


def _lang_id(col: str, engine: str) -> str:
    toks = spark_tokens(col) if engine == "spark" else duck_tokens(col)
    scores = {
        lang: _stopword_score(toks, words, engine)
        for lang, words in STOPWORDS.items()
    }
    # argmax with fixed priority order: lang L wins if its score is strictly
    # greater than every earlier-priority lang and >= every later one
    cases = []
    for i, lang in enumerate(LANG_PRIORITY):
        conds = []
        for j, other in enumerate(LANG_PRIORITY):
            if other == lang:
                continue
            op = ">" if j < i else ">="
            conds.append(f"{scores[lang]} {op} {scores[other]}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"CASE {' '.join(cases)} ELSE 'und' END"


def spark_lang_id(col: str) -> str:
    """Stopword-vote language ID with deterministic priority tie-break."""
    return _lang_id(col, "spark")


def duck_lang_id(col: str) -> str:
    return _lang_id(col, "duck")


def _quality_score(col: str, engine: str) -> str:
    toks = spark_tokens(col) if engine == "spark" else duck_tokens(col)
    n_tokens = f"size({toks})" if engine == "spark" else f"len({toks})"
    sw = _stopword_score(toks, STOPWORDS["en"], engine)
    if engine == "spark":
        punct = f"size(regexp_extract_all({col}, '[^A-Za-z0-9 ]', 0))"
    else:
        punct = f"len(regexp_extract_all({col}, '[^A-Za-z0-9 ]'))"
    return (
        f"round(0.4 * least(CAST({n_tokens} AS DOUBLE) / 100.0, 1.0)"
        f" + 0.4 * least(5.0 * CAST({sw} AS DOUBLE) / CAST({n_tokens} AS DOUBLE), 1.0)"
        f" + 0.2 * (1.0 - least(CAST({punct} AS DOUBLE) / 50.0, 1.0)), 6)"
    )


def spark_quality_score(col: str) -> str:
    """Heuristic document quality in [0,1]: length, stopword density,
    punctuation noise (the ratios C4/Gopher-style filters use)."""
    return _quality_score(col, "spark")


def duck_quality_score(col: str) -> str:
    return _quality_score(col, "duck")


def spark_fingerprint(col: str) -> str:
    """Canonical-form fingerprint: md5 of sorted distinct tokens — the
    key used for near-exact (word-order/duplication-insensitive) dedup."""
    toks = spark_tokens(col)
    return f"md5(CAST(array_join(array_sort(array_distinct({toks})), ' ') AS BINARY))"


def duck_fingerprint(col: str) -> str:
    toks = duck_tokens(col)
    return f"md5(array_to_string(list_sort(list_distinct({toks})), ' '))"


# ---------------------------------------------------------------------------
# Shingling + 60-bit hashing (MinHash building blocks)
# ---------------------------------------------------------------------------


def spark_word_shingles(col: str, n: int = 3) -> str:
    """Distinct word n-grams joined by '_'."""
    toks = spark_tokens(col)
    return (
        f"array_distinct(transform(sequence(1, greatest(size({toks}) - {n - 1}, 0)), "
        f"i -> array_join(slice({toks}, i, {n}), '_')))"
    )


def duck_word_shingles(col: str, n: int = 3) -> str:
    toks = duck_tokens(col)
    return (
        f"list_distinct(list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), '_')))"
    )


def spark_hash60(expr: str) -> str:
    """First 60 bits of md5 as BIGINT — identical in both engines."""
    return f"CAST(conv(substring(md5(CAST({expr} AS BINARY)), 1, 15), 16, 10) AS BIGINT)"


def duck_hash60(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def minhash_perms(num_perm: int, seed: int) -> list[tuple[int, int]]:
    """Seeded (a, b) parameters; a < 2^30 keeps a*h32 + b inside int64."""
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, 2**30)), int(rng.integers(0, 2**30)))
        for _ in range(num_perm)
    ]


def spark_hashed_shingles(shingles_col: str) -> str:
    """Hash each shingle once (md5 -> 60-bit -> mod 2^32); signatures then
    reuse these integers instead of re-hashing per permutation."""
    return f"transform({shingles_col}, s -> pmod({spark_hash60('s')}, 4294967296))"


def duck_hashed_shingles(shingles_col: str) -> str:
    return f"list_transform({shingles_col}, s -> {duck_hash60('s')} % 4294967296)"


def spark_minhash_signature(hashed_col: str, perms) -> str:
    """MinHash signature array: sig_i = min over hashed shingles of
    (a_i * h32 + b_i) mod PRIME."""
    mins = ", ".join(
        f"array_min(transform({hashed_col}, h -> pmod({a} * h + {b}, {MINHASH_PRIME})))"
        for a, b in perms
    )
    return f"array({mins})"


def duck_minhash_signature(hashed_col: str, perms) -> str:
    mins = ", ".join(
        f"list_min(list_transform({hashed_col}, h -> ({a} * h + {b}) % {MINHASH_PRIME}))"
        for a, b in perms
    )
    return f"[{mins}]"


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken — SIGMOD 2003)
# ---------------------------------------------------------------------------


def spark_kgram_hashes(col: str, k: int = 12) -> str:
    """Array of 60-bit md5 hashes of every character ``k``-gram — stage 1
    of winnowing (Schleimer, Wilkerson, Aiken — SIGMOD 2003).  md5 per
    position replaces the paper's single-threaded rolling hash: each
    position hashes independently (data-parallel, cross-engine
    identical), which is the right trade on a cluster.  Character
    indexing is codepoint-based on BOTH engines including non-BMP
    astral chars (surrogate pairs) — pinned bit-exact by
    tests/test_unicode_parity.py.  Callers must filter
    ``length(text) >= k`` first and MUST materialize this as its own
    column before winnowing, so the array is built once per doc, not
    once per window position (O(L) md5s, not O(L^2)).  ``lower(col)``
    is let-bound through a one-element ``transform`` for the same
    reason — inlined, it re-lowercases the whole string at every
    position (O(L^2) char copies; measured 8x on sf0.1)."""
    kh = spark_hash60(f"substring(txt, p, {k})")
    return (
        f"element_at(transform(array(lower({col})), txt -> "
        f"transform(sequence(1, length(txt) - {k - 1}), p -> {kh})), 1)"
    )


def duck_kgram_hashes(col: str, k: int = 12) -> str:
    txt = f"lower({col})"
    kh = duck_hash60(f"substr({txt}, p, {k})")
    return f"list_transform(range(1, length({txt}) - {k - 1} + 1), p -> {kh})"


def spark_winnow_select(hashes_col: str, w: int = 6) -> str:
    """Stage 2 of winnowing: the distinct minima of every window of ``w``
    consecutive k-gram hashes.  Guarantees at least one shared
    fingerprint for any common substring of length >= k + w - 1 while
    keeping only ~2/(w+1) of the hashes (the paper's density bound).

    ``hashes_col`` is LET-BOUND through a one-element ``transform`` so
    the expression is evaluated ONCE per row even when Catalyst's
    CollapseProject inlines a chained-select hash expression into every
    window position — without the binding, a 300-hash doc recomputes
    the whole O(L) md5 array for each of its ~300 windows (measured:
    422 s vs ~2 s at sf0.01).  Caller filters ``length >= k + w - 1``."""
    return (
        f"element_at(transform(array({hashes_col}), hs -> "
        f"array_distinct(transform("
        f"sequence(1, size(hs) - {w - 1}), "
        f"q -> array_min(slice(hs, q, {w}))))), 1)"
    )


def duck_winnow_select(hashes_col: str, w: int = 6) -> str:
    return (
        f"list_distinct(list_transform("
        f"range(1, len({hashes_col}) - {w - 1} + 1), "
        f"q -> list_aggregate(list_slice({hashes_col}, q, q + {w - 1}), 'min')))"
    )


def word_shingles_udf(n: int = 3):
    """Arrow-batched twin of ``spark_word_shingles``: identical output
    (lower + split-on-space tokens, '_'-joined n-grams, first-occurrence
    distinct) via Python string ops — exact string equality with the SQL
    form, no floating point involved.  ~10x faster than the interpreted
    slice/array_join HOF chain on bulk scans; use it where the shingle
    column feeds further plan stages, keep the SQL form in oracle text."""
    from pyspark.sql import functions as F

    @F.pandas_udf("array<string>")
    def shingles(texts: pd.Series) -> pd.Series:
        def one(t: str) -> list[str]:
            toks = t.lower().split(" ")
            return list(
                dict.fromkeys(
                    "_".join(toks[i : i + n])
                    for i in range(max(len(toks) - n + 1, 0))
                )
            )

        return texts.map(one)

    return shingles
