"""Scan-time data-quality metrics via ``DataFrame.observe``.

A 100 TB curation job cannot afford a second pass just to count what it
kept; ``observe`` attaches named aggregate metrics to the SAME scan that
produces the output (collected on the driver through the query listener
when the action runs).  This pairs with the curation decision query
(queries.document_filter_decision): the keep/reject verdict is the
output, the keep/reject tallies are free observation metrics.

The reference has no quality/metrics surface at all (SURVEY §2.11);
its only telemetry is per-request wall time (search_service.py:59-66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_keep_counts(decisions: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach keep/reject/short/low-quality counters to a curation
    decision DataFrame (columns: keep BOOLEAN, reject_reasons STRING —
    a comma-joined reason list, '' when kept, per
    queries.document_filter_decision's hashable output contract).
    Returns (df, observation); read ``observation.get`` AFTER an action
    has materialized ``df`` — the metrics ride the same job, no extra
    scan."""
    reasons = F.split(F.col("reject_reasons"), ",")
    obs = Observation("curation")
    observed = decisions.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
        F.sum(
            F.array_contains(reasons, "too_short").cast("bigint")
        ).alias("n_too_short"),
        F.sum(
            F.array_contains(reasons, "low_quality").cast("bigint")
        ).alias("n_low_quality"),
        F.sum(
            F.array_contains(reasons, "repetitive").cast("bigint")
        ).alias("n_repetitive"),
    )
    return observed, obs


def ctfidf_scores(tc: DataFrame, class_col: str = "source") -> DataFrame:
    """(class, term, ctfidf) from a (class, term, cnt) count table —
    class-based TF-IDF (the c-TF-IDF of BERTopic, Grootendorst 2022):
    score = (tf_in_class / class_tokens) * ln(1 + avg_class_tokens /
    corpus_tf).  Shared by the batch topic query
    (queries.source_topic_keywords) and the streamed topic-model
    artifact (streaming.maintenance.topic_model_serving), so streamed
    == batch is an identity of plans, not a tolerance.

    Scale shape: every derived statistic is a combinable aggregate of
    the count table (per-class totals broadcast back — classes are
    enumerable; per-term totals a vocab-bounded shuffle join,
    AQE-splittable; average class size a 1-row broadcast), and the
    score itself is whole-stage arithmetic on integer counts — no
    float accumulation anywhere, so the doubles are reproducible
    bit-for-bit across engines."""
    wc = tc.groupBy(class_col).agg(F.sum("cnt").alias("w_c"))
    ft = tc.groupBy("term").agg(F.sum("cnt").alias("f_t"))
    tot = wc.agg(
        (F.sum("w_c").cast("double") / F.count(F.lit(1))).alias("a")
    )
    return (
        tc.join(F.broadcast(wc), class_col)
        .join(ft, "term")
        .crossJoin(F.broadcast(tot))
        .select(
            class_col,
            "term",
            (
                (F.col("cnt").cast("double") / F.col("w_c").cast("double"))
                * F.log(F.lit(1.0) + F.col("a") / F.col("f_t").cast("double"))
            ).alias("ctfidf"),
        )
    )
