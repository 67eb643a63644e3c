"""Bloom pre-join (operators/bloom.py): identity with the plain
semi-join, real false-positive handling, bitset shape, and the
JVM-only plan."""

import pytest
from pyspark.sql import functions as F

from vector_database_api_spark.operators import bloom
from vector_database_api_spark.plans.audit import audit_plan
from vector_database_api_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def sides(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    keys = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return orders, keys


def _orderkeys(df):
    return {r["o_orderkey"] for r in df.select("o_orderkey").collect()}


def test_identity_with_plain_semi_join(sides):
    orders, keys = sides
    got = bloom.bloom_semi_join(orders, keys, "o_custkey")
    want = orders.join(keys.distinct(), "o_custkey", "left_semi")
    assert _orderkeys(got) == _orderkeys(want)


def test_false_positives_exist_and_are_removed(sides):
    """An undersized bloom (m=64, k=1) MUST produce false positives on
    this data — proving the exact residual join is load-bearing — and
    the final result must still be the identity."""
    orders, keys = sides
    want = orders.join(keys.distinct(), "o_custkey", "left_semi")
    pre = (
        orders.crossJoin(F.broadcast(bloom.bloom_build(keys, "o_custkey", m=64, k=1)))
        .filter(bloom.bloom_might_contain("o_custkey", m=64, k=1))
    )
    assert pre.count() > want.count()
    got = bloom.bloom_semi_join(orders, keys, "o_custkey", m=64, k=1)
    assert _orderkeys(got) == _orderkeys(want)


def test_bitset_shape_and_determinism(sides):
    _, keys = sides
    a = bloom.bloom_build(keys, "o_custkey", m=1 << 10, k=3).collect()
    b = bloom.bloom_build(keys, "o_custkey", m=1 << 10, k=3).collect()
    assert len(a) == 1
    words = a[0][bloom._BLOOM_COL]
    assert len(words) == (1 << 10) // 64
    assert any(w != 0 for w in words)
    assert a == b


def test_empty_key_set_rejects_everything(spark, sides):
    orders, keys = sides
    empty = keys.filter(F.lit(False))
    got = bloom.bloom_semi_join(orders, empty, "o_custkey")
    assert got.count() == 0


def test_m_must_be_word_aligned(sides):
    _, keys = sides
    with pytest.raises(ValueError):
        bloom.bloom_build(keys, "o_custkey", m=100)


def test_plan_is_jvm_only(sides):
    orders, keys = sides
    a = audit_plan(bloom.bloom_semi_join(orders, keys, "o_custkey"))
    assert a["python_udfs"] == 0 and a["row_python_udfs"] == 0
