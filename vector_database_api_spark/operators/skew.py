"""Skew mitigation: salted joins and salted per-group top-k.

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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _row_salt(shards: int) -> F.Column:
    """Deterministic per-row shard id in [0, shards): murmur3 of the
    row's monotonically_increasing_id.

    Why the HASH and not ``mono_id % shards`` (the r9 scale smoke's
    empirical layout assertion caught this): mono ids are consecutive
    within a partition, so ``% shards`` cycles 0..shards-1 in row
    order — and when the GROUP key is itself periodic in row order
    (every ``crossJoin(broadcast(Q queries))`` emits the Q qids
    cyclically), salt and group correlate instead of crossing.  At
    Q=32 queries with shards=16, salt = row%16 and qid = row%32 meant
    every qid landed in exactly ONE salt — grouped_topk silently
    degenerated to the unsharded per-group sort it exists to replace
    (the plan still showed the `_salt` key; only the measured
    partition occupancy exposed it: 22/32 tasks, hot ones
    corpus-sized).  Hashing the id keeps retry-determinism (mono ids
    are stable given the partition layout) while decorrelating any
    periodic structure; content is deliberately NOT hashed — value-
    identical rows (the giant duplicate groups salting exists for)
    must spread, not re-concentrate."""
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(shards)).cast(
        "int"
    )


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
    salted_big = big.withColumn("_salt", _row_salt(salt))
    salted_small = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")),
    )
    return (
        salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")
    )


def grouped_topk(
    df: DataFrame,
    group_cols: str | list[str],
    order_col: str,
    tie_col: str,
    k: int,
    shards: int = 16,
) -> DataFrame:
    """EXACT top-``k`` rows per group by (``order_col`` DESC,
    ``tie_col`` ASC) — the skew-safe form of
    ``row_number().over(partitionBy(group))`` for groups that can be
    arbitrarily hot (a viral domain, a giant duplicate cluster).

    The plain window serializes each group onto ONE task (AQE never
    skew-splits windows — the BOUNDED_WINDOW_KEYS rationale), so a
    100M-row group at 100 TB runs on one executor.  This operator
    shards first: phase 1 ranks within (group, ``_salt``) — per-task
    work is group_size/``shards``, the knob to size against the
    hottest expected group — and keeps k rows per shard, an upper
    bound on what can reach the global top-k from that shard.  Phase 2
    reduces the <= shards*k survivors per group with a combinable
    aggregate (sort_array over a collect_list bounded by construction
    — NOT a second window, so no unbounded partition anywhere).  The
    union of shard top-ks contains the group top-k, so the result is
    row-for-row identical to the plain window (pinned by
    tests/test_skew.py, and hash-proven against the plain-window
    DuckDB oracle by queries.py::per_source_topn_salted).

    (``order_col``, ``tie_col``) must be a TOTAL order (the usual
    (score, id) shape) — with boundary ties the shard assignment could
    otherwise pick either twin.  ``order_col`` must be numeric,
    non-NULL, and non-NaN: phase 2 sorts struct(-order, tie)
    ascending, the direction-normalizing trick that keeps the reduce a
    plain sort_array — and NaN breaks that normalization (r7 ADVICE:
    Spark's desc window ranks NaN GREATEST, so phase 1 keeps it first,
    but -NaN is still NaN and sorts LAST in phase 2's ascending
    sort_array, silently mis-ranking or dropping NaN rows relative to
    the plain window).  NULL breaks it the same way in the OPPOSITE
    direction (r9 review: the desc window ranks NULLS LAST, but a NULL
    ``-order`` struct field sorts FIRST in phase 2's ascending
    sort_array — a NULL-scored row would jump from last to rank 1).
    Rather than diverge silently, a float/double ``order_col`` is
    NaN-checked and every ``order_col`` is NULL-checked in the phase-1
    projection, and the job FAILS on the first offending row (the
    check rides the existing scan — no extra pass; exact-total-order
    inputs pay one isnan/isnull per row).  Callers whose score can
    legitimately be NULL (un-computable evidence) must filter or
    coalesce it first and decide the semantics themselves.  Shard assignment is :func:`_row_salt`
    (hashed monotonically_increasing_id) — deterministic under
    retries, immune to value-identical rows landing in one shard
    (hashing row CONTENT would re-concentrate exactly the giant
    duplicate groups this exists for), and immune to group keys that
    are PERIODIC in row order (see _row_salt: the unhashed ``mono %
    shards`` form degenerated to one shard per group on crossJoin-
    broadcast inputs).  Output: group columns,
    ``rank`` (1-based), and every non-group input column."""
    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    payload = [c for c in df.columns if c not in gcols]
    # total-order contract, enforced: raise_error fires on the first
    # NaN/NULL row instead of letting phases 1 and 2 disagree on it
    # (desc window: NaN first, NULL last; phase-2 ascending sort_array
    # of struct(-order, ...): NaN last, NULL first — both diverge)
    bad = F.isnull(F.col(order_col))
    what = "NULL"
    if dict(df.dtypes).get(order_col) in ("float", "double"):
        bad = bad | F.isnan(F.col(order_col))
        what = "NaN/NULL"
    df = df.withColumn(
        order_col,
        F.when(
            bad,
            F.raise_error(
                f"grouped_topk: {what} in order column '{order_col}' — "
                "no consistent rank across the two phases; filter or "
                "coalesce un-computable scores before the top-k"
            ),
        ).otherwise(F.col(order_col)),
    )
    salted = df.withColumn("_salt", _row_salt(shards))
    shard_w = Window.partitionBy(*gcols, "_salt").orderBy(
        F.desc(order_col), F.asc(tie_col)
    )
    pruned = (
        salted.withColumn("_r", F.row_number().over(shard_w))
        .filter(F.col("_r") <= k)
        .drop("_r", "_salt")
    )
    packed = F.struct(
        (-F.col(order_col)).alias("_neg_ord"),
        F.col(tie_col).alias("_tie"),
        F.struct(*[F.col(c) for c in payload]).alias("_row"),
    )
    return (
        pruned.groupBy(*gcols)
        .agg(F.slice(F.sort_array(F.collect_list(packed)), 1, k).alias("_top"))
        .select(*gcols, F.posexplode("_top").alias("_pos", "_item"))
        .select(
            *gcols,
            (F.col("_pos") + 1).alias("rank"),
            F.col("_item._row.*"),
        )
    )
