"""salted_join must be row-identical to the plain equi-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_api_spark.operators.skew import salted_join
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
