"""observe() metrics ride the producing job and match a direct count."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vector_database_api_spark import queries as q
from vector_database_api_spark.operators.quality import observed_keep_counts


def test_retention_sweep_empty_corpus_returns_no_rows(spark, sf_dir, tmp_path):
    """r10 ADVICE: on an EMPTY documents table the sweep must return 0
    rows like the oracle's `grid CROSS JOIN scored` (the unguarded
    explode emitted 9 kept=0 / NULL-retention rows), and stay 9 rows on
    any non-empty corpus."""
    empty_dir = str(tmp_path / "sf_empty")
    docs = q.load_table(spark, sf_dir, "documents")
    docs.limit(0).write.parquet(os.path.join(empty_dir, "documents.parquet"))
    assert q.quality_retention_sweep(spark, empty_dir).count() == 0
    assert q.quality_retention_sweep(spark, sf_dir).count() == 9


def test_observed_metrics_match_direct_counts(spark, sf_dir):
    decisions = q.document_filter_decision(spark, sf_dir)
    observed, obs = observed_keep_counts(decisions)
    kept_rows = observed.filter(F.col("keep")).count()  # the action

    m = obs.get
    assert m["n_kept"] == kept_rows
    direct = decisions.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("keep").cast("bigint")).alias("k"),
        F.sum(
            F.array_contains(
                F.split(F.col("reject_reasons"), ","), "too_short"
            ).cast("bigint")
        ).alias("s"),
    ).collect()[0]
    assert m["n_docs"] == direct.n
    assert m["n_kept"] == direct.k
    assert m["n_too_short"] == direct.s
    # decisions are non-trivial on the test corpus: something kept,
    # something rejected
    assert 0 < m["n_kept"] < m["n_docs"]
