"""Bloom-filter pre-join: broadcast a compact membership summary of the
small side's keys and drop non-matching big-side rows BEFORE the join's
exchange.

Spark already has two related mechanisms: broadcast-hash join (the whole
small side ships to every executor — needs the *rows*, not just a
summary) and the runtime bloom-filter join
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, injected by the
optimizer under its own cost heuristics).  This explicit operator covers
what the optimizer can't see: the filter is placed by the caller (e.g.
ahead of an expensive Arrow/Python seam, or a multi-stage lineage the
runtime rule won't reach into), it is deterministic (seeded ``xxhash64``
— the same family Spark's own ``BloomFilterAggregate`` uses, which is
not exposed to PySpark), and it is sized explicitly.

Layout: a REAL bitset — ``array<bigint>`` of ``m/64`` words, one row,
broadcast.  Probing is ``element_at(words, p div 64) & (1 << p mod 64)``
— O(1) per hash, pure JVM, inside whole-stage codegen; never a linear
``array_contains`` scan and never a Python round-trip.  At the default
``m = 2^16`` the broadcast is 8 KiB regardless of how many keys went in.

False positives are expected and harmless: the exact semi-join that
follows removes them.  The bloom's only job is to shrink the big side's
rows entering that join's shuffle — at 100 TB the fact-side exchange is
the dominant cost, and a ~1% FP rate cuts it by the full non-matching
fraction.  (With ``n`` keys, ``k`` hashes and ``m`` bits the FP rate is
``(1 - e^{-kn/m})^k`` — size ``m ≳ 10·n`` for ~1%.)

Semantics: ``bloom_semi_join(big, keys, key)`` is row-for-row identical
to ``big.join(keys, key, "left_semi")`` — pinned by tests/test_bloom.py
and by the identity oracle of the ``bloom_prefilter_revenue`` registry
query (its DuckDB oracle is the PLAIN semi-join, so the driver's value
hash proves the bloom stage changes nothing).

The reference has no join machinery at all (SURVEY §2.4 — its joins are
dict walks, app/database/storage.py:163-171); this is part of the
100 TB-scale surface the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M = 1 << 16
DEFAULT_K = 3

_BLOOM_COL = "_bloom_words"


def _position_sql(key_expr: str, seed: int, m: int) -> str:
    """Bit position of ``key_expr`` under the ``seed``-th hash: seeded
    xxhash64 folded into [0, m).  pmod keeps it non-negative."""
    return f"pmod(xxhash64({key_expr}, {seed}), {m}L)"


def bloom_build(
    keys: DataFrame, key: str, m: int = DEFAULT_M, k: int = DEFAULT_K
) -> DataFrame:
    """One-row DataFrame ``({_BLOOM_COL}: array<bigint>)`` — the dense
    m-bit bitset (m/64 words) with every key's k positions set.

    Fully distributed build: positions explode map-side, ``bit_or``
    aggregates per word (map-side combine — the shuffle carries at most
    m/64 rows however large the key set is), and the dense array is
    assembled once on the single merged row.
    """
    if m % 64:
        raise ValueError(f"m must be a multiple of 64, got {m}")
    pos = keys.select(
        F.explode(
            F.array(*[F.expr(_position_sql(key, s, m)) for s in range(1, k + 1)])
        ).alias("p")
    )
    words = pos.select(
        (F.col("p") / 64).cast("int").alias("w"),
        F.expr("shiftleft(1L, int(pmod(p, 64)))").alias("bit"),
    ).groupBy("w").agg(F.bit_or("bit").alias("bits"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("wm")
    ).select(
        F.expr(
            f"transform(sequence(0, {m // 64 - 1}),"
            " i -> coalesce(element_at(wm, i), 0L))"
        ).alias(_BLOOM_COL)
    )


def bloom_might_contain(
    key_expr: str, m: int = DEFAULT_M, k: int = DEFAULT_K
) -> Column:
    """Membership probe against the broadcast ``{_BLOOM_COL}`` column:
    all k bits set.  k O(1) word lookups, whole-stage codegen."""
    probes = []
    for s in range(1, k + 1):
        p = _position_sql(key_expr, s, m)
        probes.append(
            f"(element_at({_BLOOM_COL}, int(({p}) div 64) + 1)"
            f" & shiftleft(1L, int(pmod({p}, 64)))) != 0"
        )
    return F.expr(" AND ".join(probes))


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    key: str,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> DataFrame:
    """``big ⋉ keys`` on ``key`` with a bloom pre-filter on the big side.

    Stage 1 broadcasts the 1-row bitset (8 KiB at default m) and drops
    big-side rows failing any probe — a narrow Filter, no exchange.
    Stage 2 is the exact semi-join over the survivors; Catalyst/AQE pick
    its physical strategy (broadcast if ``keys`` is small, shuffle
    otherwise — in the latter case the bloom already removed the
    non-matching fraction of the big side's exchange, which is the whole
    point at scale).
    """
    distinct_keys = keys.select(key).distinct()
    bloom = bloom_build(distinct_keys, key, m, k)
    pre = (
        big.crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain(key, m, k))
        .drop(_BLOOM_COL)
    )
    return pre.join(distinct_keys, key, "left_semi")
