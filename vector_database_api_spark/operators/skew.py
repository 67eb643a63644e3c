"""Skew-mitigation join: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by subdividing oversized partitions.  Salting is the explicit
form for the cases AQE can't fix — e.g. one join key holding 10% of a
100 TB fact table, where even a subdivided partition must all meet the
same single dimension row.  The salted shape replicates the small side R
times and scatters the big side's hot keys across R subpartitions, so the
hot key's work spreads over R tasks.

Semantics: exactly an inner equi-join on ``key`` (row-for-row identical
to ``left.join(right, key)``) — pinned by tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Inner/left equi-join on ``key`` with ``salt``-way key splitting.

    The big side gets a uniform random-ish salt derived from a stable
    expression (hash of all columns would be nondeterministic across
    retries with identical rows; monotonically_increasing_id is
    per-partition stable), the small side is exploded ``salt`` times, and
    the join key becomes (key, salt_id) — the hot key's rows land in
    ``salt`` different shuffle partitions instead of one.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type for salted_join: {how}")
    salted_big = big.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt).cast("int")
    )
    salted_small = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")),
    )
    return (
        salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")
    )
