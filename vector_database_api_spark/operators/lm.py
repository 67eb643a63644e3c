"""Bigram language-model quality operators (the CCNet / KenLM stage).

The reference has no corpus-quality surface at all (its pipeline ends at
vector search, search_service.py); these operators extend the engine's
LLM-data-pipeline tier with the classic "distance to a trusted corpus"
filter (Wenzek et al. 2020, public): train smoothed n-gram counts on a
trusted corpus once, score every candidate document's per-token
cross-entropy against them, and gate admission on the score.  A bigram
LM stands in for the 5-gram KenLM — same pipeline role, same plan
shapes, no external model dependency.

Composition rules (shared with queries.lm_cross_entropy_screen, the
oracle-checked batch twin):

- tokens: lowercase, split on single space, empty tokens dropped —
  the repo-wide tokenizer contract (functions/text.py).
- probability: add-one smoothing, P(w2|w1) = (c2+1)/(c1+V); unseen
  continuation falls back to 1/(c1+V), unseen history to 1/V — one
  coalesce formulation, no special-casing.
- score: H(doc) = -sum(ln P)/(n_bigrams * ln 2) bits per token.

Scale shape: LM tables are vocabulary-bounded keyed aggregates with
map-side combine; scoring is two equi-joins of the doc-bigram fact
against them (broadcast at bench scale, AQE-skew-splittable at 100 TB)
plus combinable per-doc rollups.  Nothing driver-side beyond the 1-row
vocabulary scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_bigrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, w1, bg): one row per positional bigram occurrence — the
    shared fact both LM training and scoring consume.  Narrow explode,
    no shuffle."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(text_col), " ", -1).alias("words"),
    ).filter(F.size("words") >= 2)
    return (
        toks.select(
            "id",
            F.explode(
                F.expr(
                    "transform(sequence(2, size(words)),"
                    " i -> struct(words[i-2] AS w1, words[i-1] AS w2))"
                )
            ).alias("g"),
        )
        .filter((F.col("g.w1") != "") & (F.col("g.w2") != ""))
        .select(
            "id",
            F.col("g.w1").alias("w1"),
            F.concat_ws(" ", "g.w1", "g.w2").alias("bg"),
        )
    )


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """(uni, big): add-one bigram LM count tables over ``docs`` — the
    trusted-corpus training pass.  ``uni`` is (w, c1) history counts,
    ``big`` is (bg, c2) bigram counts; the vocabulary size V is
    ``uni.count()``.  Both are vocabulary-bounded map-side-combined
    aggregates; a serving layer stores them once (see
    streaming.maintenance.build_bigram_lm_artifact) and scores many
    batches against them."""
    fact = doc_bigrams(docs, text_col, id_col)
    uni = fact.groupBy(F.col("w1").alias("w")).agg(
        F.count(F.lit(1)).alias("c1")
    )
    big = fact.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    return uni, big


def doc_cross_entropy(
    docs: DataFrame,
    uni: DataFrame,
    big: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bigrams, h_bits): per-document cross-entropy in bits per
    token against the trained LM.  Documents with < 2 tokens produce no
    bigrams and are absent from the result (the caller decides their
    fate — the streaming gate quarantines them as unscorable)."""
    fact = doc_bigrams(docs, text_col, id_col)
    lp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(vocab_size)).cast(
            "double"
        )
    )
    scored = (
        fact.join(big, "bg", "left")
        .join(uni, fact["w1"] == uni["w"], "left")
        .select("id", lp.alias("lp"))
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.sum("lp") / (F.count(F.lit(1)) * F.log(F.lit(2.0)))).alias(
            "h_bits"
        ),
    )
