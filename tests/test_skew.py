"""salted_join / grouped_topk must be row-identical to their plain twins."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_database_api_spark.operators.skew import grouped_topk, salted_join
from vector_database_api_spark.sources.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey")
    salted = salted_join(li, orders, "l_orderkey", salt=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], "k int, v string")
    small = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, w double")
    out = salted_join(big, small, "k", salt=4, how="left").collect()
    got = {(r["k"], r["w"]) for r in out}
    assert got == {(1, 10.0), (2, 20.0), (99, None)}


def _plain_topk(df, gcols, order_col, tie_col, k):
    w = Window.partitionBy(*gcols).orderBy(F.desc(order_col), F.asc(tie_col))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*gcols, "rank", *[c for c in df.columns if c not in gcols])
    )


def test_grouped_topk_matches_plain_window(spark, sf_dir):
    """Per-event_type top-5 by (value DESC, event_id ASC): the salted
    two-phase plan must be row-for-row identical to the single plain
    window, across several shard counts (including shards=1, the
    degenerate no-sharding case)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    plain = _plain_topk(ev, ["event_type"], "value", "event_id", 5)
    expect = sorted(map(tuple, plain.collect()))
    for shards in (1, 4, 16):
        got = grouped_topk(
            ev, "event_type", "value", "event_id", 5, shards=shards
        )
        assert got.columns == plain.columns
        assert sorted(map(tuple, got.collect())) == expect, shards


def test_grouped_topk_hot_group_and_small_groups(spark):
    """One group holding ~all rows (the hot-key case the operator
    exists for) next to groups SMALLER than k and smaller than the
    shard count — every group must still return min(size, k) rows in
    exact order."""
    rows = [("hot", i, float(i % 997)) for i in range(5000)]
    rows += [("tiny", 1, 3.0), ("tiny", 2, 3.0), ("solo", 9, 1.0)]
    df = spark.createDataFrame(rows, "g string, id long, score double")
    got = grouped_topk(df, "g", "score", "id", 4, shards=8)
    out = {}
    for r in got.collect():
        out.setdefault(r["g"], []).append((r["rank"], r["id"], r["score"]))
    for g in out:
        out[g].sort()
    # hot: four ids with score 996.0, tie-broken by id ascending
    assert out["hot"] == [
        (1, 996, 996.0),
        (2, 1993, 996.0),
        (3, 2990, 996.0),
        (4, 3987, 996.0),
    ]
    # groups smaller than k (and than shards) keep all rows, ranked
    assert out["tiny"] == [(1, 1, 3.0), (2, 2, 3.0)]
    assert out["solo"] == [(1, 9, 1.0)]


def test_grouped_topk_rejects_nan_order(spark):
    """r7 ADVICE: NaN ranks GREATEST in the phase-1 desc window but
    -NaN sorts LAST in phase 2's ascending sort_array, so NaN rows
    would be silently mis-ranked vs the plain window.  The operator
    must fail loudly on the first NaN instead."""
    import pytest

    rows = [("g", 1, 1.0), ("g", 2, float("nan")), ("g", 3, 2.0)]
    df = spark.createDataFrame(rows, "g string, id long, score double")
    with pytest.raises(Exception, match="NaN/NULL in order column"):
        grouped_topk(df, "g", "score", "id", 2, shards=4).collect()
    # NaN-free floats are unaffected
    clean = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 2, 3.0)], "g string, id long, score double"
    )
    got = grouped_topk(clean, "g", "score", "id", 2, shards=4).collect()
    assert [(r["rank"], r["id"]) for r in sorted(got, key=lambda r: r["rank"])] == [
        (1, 2),
        (2, 1),
    ]


def test_grouped_topk_rejects_null_order(spark):
    """r9 review: NULL ranks LAST in the phase-1 desc window but a NULL
    -order struct field sorts FIRST in phase 2's ascending sort_array —
    a NULL-scored row would jump from last place to rank 1.  The
    operator must fail loudly instead; callers with legitimately
    NULL-able scores (un-computable evidence) filter or coalesce first
    and own the semantics."""
    import pytest

    rows = [("g", 1, 1.0), ("g", 2, None), ("g", 3, 2.0)]
    df = spark.createDataFrame(rows, "g string, id long, score double")
    with pytest.raises(Exception, match="in order column"):
        grouped_topk(df, "g", "score", "id", 2, shards=4).collect()
    # non-float order types are NULL-checked too
    irows = [("g", 1, 10), ("g", 2, None)]
    idf = spark.createDataFrame(irows, "g string, id long, score long")
    with pytest.raises(Exception, match="NULL in order column"):
        grouped_topk(idf, "g", "score", "id", 2, shards=4).collect()
    # and NULL-free integer orders still work
    iclean = spark.createDataFrame(
        [("g", 1, 10), ("g", 2, 30)], "g string, id long, score long"
    )
    got = grouped_topk(iclean, "g", "score", "id", 2, shards=4).collect()
    assert [
        (r["rank"], r["id"]) for r in sorted(got, key=lambda r: r["rank"])
    ] == [(1, 2), (2, 1)]
