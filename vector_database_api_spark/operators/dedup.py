"""Deduplication operators for the LLM-data-pipeline surface.

The reference dedups nothing (its only set op is the LSH candidate
union-distinct, indexes.py:143-149); these operators extend its capability
class to what a 100 TB corpus pipeline needs (BASELINE.json north star):

- exact dedup — content-hash groupBy; ONE shuffle on the hash key, the only
  strategy that scales to arbitrary corpus size.
- MinHash + banded LSH near-dup — shingle -> 60-bit hash -> seeded
  permutations -> band buckets -> candidate pair join -> exact Jaccard
  verify.  Everything is generated SQL (JVM-side in Spark, mirrored into
  DuckDB for the oracle); candidate generation is an equi-join on
  (band_idx, band_value), i.e. shuffle-by-bucket, never an all-pairs
  comparison.
- SimHash — 64-bit sign fingerprint of token hashes; Hamming-adjacent
  pairs found via band equi-join on 16-bit quarters.
- embedding near-dup — cosine >= threshold pairs inside blocking keys
  (all-pairs only *within* a block; block by a cheap key such as label,
  language, or an LSH bucket).

Each operator is a pure DataFrame -> DataFrame function; the paired DuckDB
SQL generators live beside them for the oracle registry.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_database_api_spark.functions import text as T
from vector_database_api_spark.functions.vector import cosine_similarity


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the lowest-id row per exact content hash (deterministic
    keep-first; ``dropDuplicates`` would keep an arbitrary row).

    Implemented as ONE combinable aggregate — ``min_by(struct(*), id)``
    per hash — NOT ``row_number`` over ``Window.partitionBy(hash)``:
    a window partition runs on a single task and AQE never skew-splits
    windows, so a 100k-way duplicate group (the expected case in a web
    corpus — PLANS.md's round-1 MinHash lesson) would serialize onto
    one executor.  ``min_by`` partial-aggregates map-side, so each map
    task forwards ONE candidate row per (hash) it sees — the shuffle
    carries surviving candidates, not the whole duplicate group."""
    h = F.md5(F.col(text_col).cast("binary"))
    keep = F.min_by(F.struct(*df.columns), F.col(id_col)).alias("_keep")
    return (
        df.groupBy(h.alias("_h"))
        .agg(keep)
        .select("_keep.*")
    )


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 32,
    seed: int = 42,
) -> DataFrame:
    """(id, shingles, sig): distinct word n-gram shingles and the seeded
    MinHash signature.  Narrow projection — no shuffle."""
    perms = T.minhash_perms(num_perm, seed)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.expr(T.spark_word_shingles(text_col, shingle_n)).alias("shingles"),
        )
        .withColumn("hashed", F.expr(T.spark_hashed_shingles("shingles")))
        .withColumn("sig", F.expr(T.spark_minhash_signature("hashed", perms)))
        .drop("hashed")
    )


def minhash_near_dup_pairs(
    df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    seed: int = 42,
    jaccard_threshold: float = 0.5,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs: banded-LSH candidates, exact-Jaccard verified.

    Returns (id_a, id_b, jaccard) with id_a < id_b.  The pair join is an
    equi-join on (band_idx, band_val) — at 100 TB the shuffle is by bucket
    and each bucket's pair expansion is local to its group; skew in a hot
    bucket is handled by AQE skew-join splitting.

    ``sigs`` is an optional pre-built :func:`minhash_signatures` table
    (columns id/shingles/sig, same num_perm).  A serving layer that runs
    many queries over the same corpus should build it once, persist it,
    and pass it in — this function itself never persists, so the caller
    owns the cache lifecycle (no leaked storage per invocation).
    """
    rows_per_band = num_perm // bands
    if sigs is None:
        if df is None:
            raise ValueError("minhash_near_dup_pairs needs df or sigs")
        sigs = minhash_signatures(df, text_col, id_col, shingle_n, num_perm, seed)

    banded = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        f"array_join(slice(sig, {b * rows_per_band + 1}, {rows_per_band}), '_')"
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    sa = sigs.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (
        F.size("sh_a").cast("double") + F.size("sh_b").cast("double") - inter
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def duck_minhash_near_dup_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    seed: int = 42,
    jaccard_threshold: float = 0.5,
) -> str:
    """DuckDB mirror of :func:`minhash_near_dup_pairs` (same seeds, same
    hash pipeline, same band layout)."""
    rows_per_band = num_perm // bands
    perms = T.minhash_perms(num_perm, seed)
    band_selects = " UNION ALL ".join(
        f"SELECT id, {b} AS band_idx, "
        f"array_to_string(list_slice(sig, {b * rows_per_band + 1}, "
        f"{b * rows_per_band + rows_per_band}), '_') AS band_val FROM sigs"
        for b in range(bands)
    )
    return f"""
    WITH base AS (
      SELECT {id_col} AS id,
             {T.duck_word_shingles(text_col, shingle_n)} AS shingles
      FROM {table}
    ),
    hashed AS (
      SELECT id, shingles, {T.duck_hashed_shingles('shingles')} AS h FROM base
    ),
    sigs AS (
      SELECT id, shingles, {T.duck_minhash_signature('h', perms)} AS sig FROM hashed
    ),
    banded AS ({band_selects}),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.id < b.id
    ),
    verified AS (
      SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
             (CAST(len(sa.shingles) AS DOUBLE) + CAST(len(sb.shingles) AS DOUBLE)
              - CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)) AS jaccard
      FROM cand c
      JOIN sigs sa ON c.id_a = sa.id
      JOIN sigs sb ON c.id_b = sb.id
    )
    SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {jaccard_threshold}
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    compute: str = "udf",
) -> DataFrame:
    """(id, simhash): sign fingerprint — bit b is 1 iff the sum over tokens
    of (+1 if token-hash bit b set else -1) is >= 0.  Token hash is the
    shared 60-bit md5 (so only the low 60 of ``bits`` are meaningful;
    we use 60).

    ``compute="udf"`` (default) runs an Arrow-batched pandas UDF: one
    numpy bit-vote matrix per document instead of 60 interpreted
    higher-order aggregations.  All arithmetic is integer, so the output
    is BIT-IDENTICAL to the ``"hof"`` expression form (and to the DuckDB
    oracle) — tested — while ~10x faster; same pattern as
    ``lsh.srp_hash_udf``.  ``compute="hof"`` keeps the pure-JVM
    expression form."""
    bits = min(bits, 60)
    if compute == "udf":
        return df.select(
            F.col(id_col).alias("id"),
            _simhash_udf(bits)(F.col(text_col)).alias("simhash"),
        )
    toks = T.spark_tokens(text_col)
    # stage token hashes once; the 60 bit-vote expressions then reuse them
    # instead of re-running md5 per bit
    staged = df.select(
        F.col(id_col).alias("id"),
        F.expr(f"transform({toks}, t -> {T.spark_hash60('t')})").alias("th"),
    )
    bit_exprs = ", ".join(
        f"CASE WHEN aggregate(th, 0L, (acc, h) -> acc + "
        f"(CASE WHEN (h >> {b}) % 2 = 1 THEN 1L ELSE -1L END)) >= 0 "
        f"THEN '1' ELSE '0' END"
        for b in range(bits)
    )
    return staged.select("id", F.expr(f"concat({bit_exprs})").alias("simhash"))


def _simhash_udf(bits: int):
    """Vectorized SimHash: md5 per token (same bytes as the SQL
    ``spark_hash60``/``duck_hash60`` pair), numpy bit-unpack, integer
    vote sum — exact, no float anywhere."""
    @F.pandas_udf("string")
    def sig(texts: pd.Series) -> pd.Series:
        shifts = np.arange(bits, dtype=np.uint64)
        one = np.uint64(1)
        out = []
        for t in texts:
            toks = t.lower().split(" ")
            hs = np.fromiter(
                (
                    int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
                    for tok in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            bitm = (hs[:, None] >> shifts) & one
            votes = (2 * bitm.astype(np.int64) - 1).sum(axis=0)
            out.append("".join("1" if v >= 0 else "0" for v in votes))
        return pd.Series(out)

    return sig


def duck_simhash_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
) -> str:
    bits = min(bits, 60)
    toks = T.duck_tokens(text_col)
    hashed = f"list_transform({toks}, t -> {T.duck_hash60('t')})"
    bit_exprs = "||".join(
        f"(CASE WHEN list_sum(list_transform(th, h -> "
        f"CASE WHEN (h >> {b}) % 2 = 1 THEN 1 ELSE -1 END)) >= 0 "
        f"THEN '1' ELSE '0' END)"
        for b in range(bits)
    )
    return (
        f"WITH staged AS (SELECT {id_col} AS id, {hashed} AS th FROM {table}) "
        f"SELECT id, {bit_exprs} AS simhash FROM staged"
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    max_hamming: int = 3,
    bits: int = 60,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) for pairs with SimHash Hamming distance <=
    ``max_hamming``, found by a banded equi-join instead of all-pairs.

    With ``bands`` equal-width bands, any pair within ``bands - 1``
    differing bits shares at least one identical band (pigeonhole), so for
    ``max_hamming <= bands - 1`` the banded join is LOSSLESS: it returns
    exactly the brute-force all-pairs answer while shuffling only on
    (band_idx, band_value).  The oracle exploits this — DuckDB brute-forces
    all pairs and the results must match bit-for-bit.
    """
    if max_hamming > bands - 1:
        raise ValueError(
            f"banding is lossy for max_hamming={max_hamming} > bands-1={bands - 1}"
        )
    bits = min(bits, 60)
    if bits % bands != 0:
        raise ValueError(f"bits={bits} must divide evenly into bands={bands}")
    width = bits // bands

    if sigs is None:
        # Spread thin inputs before the hashing UDF (a single small parquet
        # file arrives as one partition locally; at scale the input is
        # already partitioned and this is a no-op).
        spark = df.sparkSession
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
        # Signatures are tiny next to the text (60 B/doc); callers that run
        # several queries over the same corpus should pre-build + persist
        # them (serving cache) and pass ``sigs`` — this function never
        # persists, so no storage leaks per invocation.
        sigs = simhash(df, text_col=text_col, id_col=id_col, bits=bits)

    # Candidates carry ONLY the id pair: the distinct() shuffle moves two
    # longs per row, and signatures re-attach via a hash join against the
    # persisted (small) signature table for the verify.
    banded = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[F.substring("simhash", b * width + 1, width) for b in range(bands)]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # Hamming distance as whole-stage-codegen arithmetic: per band,
    # parse the bit substring to a long (conv base 2) and popcount the
    # XOR — 4 JVM expressions per pair instead of a 60-step interpreted
    # higher-order aggregate (measured ~15x faster on the verify stage).
    ham = F.expr(
        " + ".join(
            f"bit_count(CAST(conv(substring(sig_a, {b * width + 1}, {width}), 2, 10) AS BIGINT) ^ "
            f"CAST(conv(substring(sig_b, {b * width + 1}, {width}), 2, 10) AS BIGINT))"
            for b in range(bands)
        )
    ).cast("bigint")
    verified = (
        cand.join(
            sigs.select(F.col("id").alias("id_a"), F.col("simhash").alias("sig_a")),
            "id_a",
        )
        .join(
            sigs.select(F.col("id").alias("id_b"), F.col("simhash").alias("sig_b")),
            "id_b",
        )
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
    )
    return verified.select("id_a", "id_b", "hamming")


def duck_simhash_near_dup_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 60,
) -> str:
    """Brute-force all-pairs oracle for :func:`simhash_near_dup_pairs` —
    the banded Spark plan must reproduce this exactly (see losslessness
    note there)."""
    bits = min(bits, 60)
    sig = duck_simhash_sql(table=table, text_col=text_col, id_col=id_col, bits=bits)
    return f"""
    WITH sigs AS ({sig}),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             CAST(list_sum(list_transform(generate_series(1, {bits}), i ->
               CASE WHEN substr(a.simhash, i, 1) <> substr(b.simhash, i, 1)
               THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
      FROM sigs a JOIN sigs b ON a.id < b.id
    )
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= {max_hamming}
    """


# ---------------------------------------------------------------------------
# Connected components over the near-dup pair graph
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
    strategy: str = "auto",
    driver_edge_threshold: int = 1_000_000,
) -> DataFrame:
    """(id, component) for every node in the undirected pair graph;
    ``component`` is the minimum node id reachable from ``id``.

    This turns near-duplicate PAIRS into near-duplicate CLUSTERS — the
    step a real dedup pipeline needs between pair generation
    (:func:`minhash_near_dup_pairs` / :func:`simhash_near_dup_pairs`) and
    canonical-row selection ("keep one doc per cluster").  The reference
    has no graph surface at all (SURVEY §2.11).

    Algorithm: distributed min-label propagation with pointer jumping.
    Each round every node (a) takes the min of its own label and its
    neighbors' labels (one shuffle: edge ⋈ label, groupBy dst, min), then
    (b) path-compresses by replacing its label with its LABEL's label
    (one self-join on the label table) — the pointer-jumping step that
    turns O(diameter) convergence into O(log diameter).  Long near-dup
    chains (a~b~c~... with drifting similarity) are common in real
    corpora, so diameter is not bounded by clique size.  Lineage is
    truncated every round with ``localCheckpoint`` so plans stay flat.
    Same primitive family as alternating large-star/small-star (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14);
    every step is a keyed join/groupBy, so it scales with the cluster.

    Invariant: a node's label is always the id of some node in its own
    component and only ever decreases, so the fixpoint (no change in a
    round) is exactly component = min reachable id.

    ``strategy``: the near-dup pair graph is orders of magnitude smaller
    than the corpus (only rows WITH a near-duplicate appear), so
    ``"auto"`` runs driver-side union-find when the edge count fits
    comfortably (``driver_edge_threshold``) — one O(E α(E)) pass instead
    of ~12 distributed rounds of job-scheduling overhead — and the
    distributed loop above it.  Both produce the identical min-label
    result (tested); ``"distributed"`` / ``"driver"`` force a path.
    """
    if strategy not in ("auto", "distributed", "driver"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy != "distributed":
        # Persist so the threshold count + collect share one pass — but
        # ONLY unpersist what we persisted: when the caller hands in an
        # already-cached frame (the shared simhash-pairs serving
        # artifact), persist() is a no-op on the SAME DataFrame and an
        # unconditional unpersist() would silently drop the caller's
        # cache.  That exact leak made every post-components read of the
        # pairs artifact rebuild it (~2.3 s at sf0.1) — the recurring
        # simhash_near_dup bench spike of rounds 4-6, misdiagnosed as
        # box noise until round 6 reproduced it deterministically.
        lvl = edges.storageLevel
        caller_cached = lvl.useMemory or lvl.useDisk or lvl.useOffHeap
        if not caller_cached:
            edges = edges.persist()
        n_edges = edges.count()
        if strategy == "driver" or n_edges <= driver_edge_threshold:
            try:
                return _driver_union_find(edges, src_col, dst_col)
            finally:
                if not caller_cached:
                    edges.unpersist()
    bidir = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .persist()
    )
    bidir.count()
    if strategy != "distributed" and not caller_cached:
        # the auto-path persist above the threshold gate is no longer
        # needed once bidir is materialized; dropping it here keeps the
        # distributed path leak-free too
        edges.unpersist()
    labels = (
        bidir.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            bidir.join(labels, bidir.src == labels.id)
            .select(F.col("dst").alias("id"), F.col("comp").alias("nbr_comp"))
            .groupBy("id")
            .agg(F.min("nbr_comp").alias("nbr_comp"))
        )
        stepped = (
            labels.withColumnRenamed("comp", "old")
            .join(nbr_min, "id", "left")
            .select(
                "id",
                "old",
                F.least(F.col("old"), F.coalesce("nbr_comp", "old")).alias("mid"),
            )
            # checkpoint before the self-join below: without it the
            # subtree is inlined once per reference and plans grow
            # multiplicatively across rounds (measured: round times
            # explode past 80 s by round 10 on a 700-node graph)
            .localCheckpoint()
        )
        # pointer jump through THIS round's labels: comp <- mid(mid(v)).
        # Jumping through the stale pre-step labels compresses nothing
        # (measured: same round count as plain propagation).
        lookup = stepped.select(
            F.col("id").alias("mid"), F.col("mid").alias("jumped")
        )
        new_labels = (
            stepped.join(lookup, "mid", "left")
            .select(
                "id",
                "old",
                F.least(F.col("mid"), F.coalesce("jumped", "mid")).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("comp") != F.col("old")).count()
        labels = new_labels.select("id", "comp")
        if changed == 0:
            break
    bidir.unpersist()
    return labels.select(F.col("id"), F.col("comp").alias("component"))


def union_find_labels(pairs) -> dict:
    """Pure union-find kernel (path compression + union-by-min) over an
    iterable of (a, b) pairs; returns {node: min id reachable}.  The
    union-by-min rule keeps the smaller id as the root, so the final root
    IS the component's minimum — identical to the distributed fixpoint.
    Property-tested against brute-force reachability in
    tests/test_properties.py."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {v: find(v) for v in parent}


def _driver_union_find(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Driver-side path: collect the (small, by precondition) edge list,
    run the pure kernel, ship labels back as a DataFrame."""
    spark = edges.sparkSession
    rows = edges.select(src_col, dst_col).collect()
    labels = union_find_labels((r[0], r[1]) for r in rows)
    schema = edges.select(
        F.col(src_col).alias("id"), F.col(src_col).alias("component")
    ).schema
    return spark.createDataFrame(list(labels.items()), schema)


def duck_connected_components_sql(pairs_sql: str) -> str:
    """DuckDB oracle for :func:`connected_components`: recursive CTE
    enumerating (node, reachable-node) pairs over the bidirected edge set,
    then min per node.  Exact fixpoint — UNION dedups, so recursion
    terminates on the finite closure.

    ``MATERIALIZED`` on the pair/edge CTEs is load-bearing: DuckDB
    re-evaluates a non-materialized CTE referenced from a recursive one
    on EVERY iteration, so an 88 s pair computation (SimHash at sf0.1)
    times diameter rounds ran for >15 min; materialized it runs once.
    Pure optimizer hint — byte-identical results at every SF."""
    return f"""
    WITH RECURSIVE p AS MATERIALIZED ({pairs_sql}),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM p
      UNION
      SELECT id_b AS src, id_a AS dst FROM p
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
    )
    SELECT id, min(r) AS component FROM reach GROUP BY id
    """


# ---------------------------------------------------------------------------
# Embedding near-dup (cosine within blocking keys)
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "id",
    block_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold.

    With ``block_col`` the pair expansion happens only within equal block
    values (shuffle on the block key, local all-pairs per block) — the
    scalable shape; without it, a full cross pair join (small inputs only).
    """
    from vector_database_api_spark.functions.vector import dot_product, norm2

    # Spread thin inputs first: a single-file corpus arrives as ONE
    # partition, which would serialize the quadratic pair stage (the
    # small side broadcasts, so the join inherits this side's layout).
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)

    # stage each row's squared norm ONCE (O(n*d)); the quadratic pair stage
    # then runs a single dot-product aggregate per pair instead of three.
    # The arithmetic (and therefore the bit pattern vs the oracle, which
    # recomputes norms inline) is unchanged — only the evaluation count is.
    staged = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm2(vec_col).alias("n2"),
        *([F.col(block_col).alias("blk")] if block_col else []),
    )
    a = staged.select(
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("n2").alias("na2"),
        *(["blk"] if block_col else []),
    )
    b = staged.select(
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("n2").alias("nb2"),
        *(["blk"] if block_col else []),
    )
    joined = a.join(b, on="blk") if block_col else a.crossJoin(b)
    cosine = F.when(
        (F.col("na2") == 0.0) | (F.col("nb2") == 0.0), F.lit(0.0)
    ).otherwise(
        dot_product("va", "vb") / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2")))
    )
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def assign_clusters(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "id",
) -> DataFrame:
    """(id, cluster_id): nearest-centroid assignment by raw-vector L2 with
    lowest-cluster-id tie-break — the IVF coarse-assignment shape
    (ivf.py::assign_to_centroids' semantics as a pure JVM min-struct
    aggregate).  ``centroids`` = (cluster_id, cvec), broadcast: the
    corpus never shuffles for assignment."""
    from vector_database_api_spark.functions.vector import euclidean_distance

    return (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .crossJoin(F.broadcast(centroids))
        .groupBy("id")
        .agg(
            F.min(
                F.struct(
                    euclidean_distance("v", "cvec").alias("d"),
                    F.col("cluster_id").alias("cluster_id"),
                )
            ).alias("m")
        )
        .select("id", F.col("m.cluster_id").alias("cluster_id"))
    )


def semdedup_decision(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding
    corpus, then within each cluster drop every item that has a
    lower-id neighbor at cosine >= threshold (greedy keep-first — the
    same canonical-survivor rule as the text dedup family).

    Returns (id, cluster_id, keep).  Composition of existing scale
    shapes: broadcast centroid assignment (no corpus shuffle) +
    ``embedding_near_dup_pairs(block_col="cluster_id")`` (all-pairs only
    WITHIN a cluster — at real scale the cluster count grows with the
    corpus so blocks stay small, the paper's k=50k posture) + an anti-join
    flag.  The reference has no semantic dedup; this extends its
    embedding surface (app/utils/embedding.py) to the curation pipeline.
    """
    assigned = assign_clusters(df, centroids, vec_col=vec_col, id_col=id_col)
    with_cluster = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).join(assigned, "id")
    pairs = embedding_near_dup_pairs(
        with_cluster,
        vec_col="v",
        id_col="id",
        block_col="cluster_id",
        threshold=threshold,
    )
    dupes = pairs.select(F.col("id_b").alias("id")).distinct()
    return (
        assigned.join(
            dupes.withColumn("dup", F.lit(True)), "id", "left"
        )
        .select(
            "id",
            "cluster_id",
            F.coalesce(~F.col("dup"), F.lit(True)).alias("keep"),
        )
    )


def assign_clusters_topp(
    df: DataFrame,
    centroids: DataFrame,
    p: int = 2,
    vec_col: str = "embedding",
    id_col: str = "id",
) -> DataFrame:
    """(id, cluster_id, probe_rank): each vector's p NEAREST centroids by
    raw-vector L2 with lowest-cluster-id tie-break — the multi-probe
    generalization of :func:`assign_clusters` (probe_rank 1 row equals
    its output).  Broadcast centroids; the corpus never shuffles for
    assignment; the window partitions by the vector id, so per-row state
    is the centroid count, not the corpus."""
    from pyspark.sql.window import Window

    from vector_database_api_spark.functions.vector import euclidean_distance

    w = Window.partitionBy("id").orderBy("d", "cluster_id")
    return (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .crossJoin(F.broadcast(centroids))
        .select(
            "id",
            "cluster_id",
            euclidean_distance("v", "cvec").alias("d"),
        )
        .withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= p)
        .select("id", "cluster_id", "probe_rank")
    )


# ---------------------------------------------------------------------------
# Exact substring-span dedup (positional window dedup)
# ---------------------------------------------------------------------------


def _spark_pos_windows(col: str, w: int) -> str:
    """ALL word w-gram windows of ``col`` in position order (NOT
    distinct — a span repeated inside one document contributes one
    window per occurrence, which is what span-fraction accounting
    needs; contrast text.spark_word_shingles, which dedups)."""
    toks = T.spark_tokens(col)
    return (
        f"transform(sequence(1, greatest(size({toks}) - {w - 1}, 0)), "
        f"i -> array_join(slice({toks}, i, {w}), '_'))"
    )


def _duck_pos_windows(col: str, w: int) -> str:
    toks = T.duck_tokens(col)
    return (
        f"list_transform(range(1, greatest(len({toks}) - {w - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {w - 1}), '_'))"
    )


def span_occurrences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = "source",
    w: int = 8,
) -> DataFrame:
    """(span, id[, grp], occ) — one row per (window text, document):
    the span OCCURRENCE TABLE a span-dedup pipeline stores (the index
    artifact, like the MinHash signature table).  The window explode is
    narrow; the (span, id) groupBy is map-side combinable and collapses
    within-doc repeats, so every downstream stage shuffles one row per
    (span, doc) instead of one per window occurrence.  Both span
    queries derive from this one table — build it once, persist it."""
    win = F.expr(_spark_pos_windows(text_col, w))
    cols = [F.col(id_col).alias("id")]
    if group_col is not None:
        cols.append(F.col(group_col).alias("grp"))
    exploded = df.select(*cols, F.explode(win).alias("span"))
    aggs = [F.count(F.lit(1)).alias("occ")]
    if group_col is not None:
        aggs.insert(0, F.first("grp").alias("grp"))
    return exploded.groupBy("span", "id").agg(*aggs)


def span_dup_profile(
    df: DataFrame = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    w: int = 8,
    occ: DataFrame | None = None,
) -> DataFrame:
    """Exact substring-span dedup profile, rolled up per ``group_col``:
    for every document, every positional word ``w``-gram window; a window
    is DUPLICATED when its exact text occurs in >= 2 distinct documents
    (the span-level dedup signal of Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — doc-level dedup misses
    boilerplate spans embedded in otherwise-unique pages; word windows
    stand in for the paper's 50-token windows).

    Returns (group, n_docs, n_windows, n_dup_windows, dup_fraction).

    Scale shape: everything derives from the (span, id, occ) occurrence
    table (``span_occurrences`` — pass a persisted one via ``occ`` to
    share it across queries).  The doc-frequency of a span is a
    ``groupBy("span").count()`` — the partial aggregate combines
    map-side — joined back on ``span``, filtered to nd >= 2 first so
    the join's build side holds only the (rare) duplicated spans.
    Deliberately NOT a window over ``partitionBy("span")``: a window
    partition is processed by a single task and AQE never skew-splits
    windows, so one viral boilerplate span (the exact thing this
    operator exists to find) would serialize its whole row set onto one
    executor; the shuffle JOIN on ``span`` IS AQE-skew-splittable.  The
    per-doc and per-group rollups reduce monotonically.  Nothing is
    ever pairwise — cost is linear in corpus tokens at any scale.
    """
    if occ is None:
        occ = span_occurrences(df, text_col, id_col, group_col, w)
    dup_spans = (
        occ.groupBy("span")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("span", F.lit(True).alias("is_dup"))
    )
    per_doc = (
        occ.join(dup_spans, "span", "left")
        .groupBy("id")
        .agg(
            F.first("grp").alias("grp"),
            F.sum("occ").alias("n_windows"),
            F.sum(
                F.when(F.col("is_dup"), F.col("occ")).otherwise(F.lit(0))
            ).alias("n_dup"),
        )
    )
    return (
        per_doc.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_windows").alias("n_windows"),
            F.sum("n_dup").alias("n_dup_windows"),
            F.round(
                F.sum("n_dup").cast("double") / F.sum("n_windows"), 6
            ).alias("dup_fraction"),
        )
    )


def duck_span_dup_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    w: int = 8,
) -> str:
    """DuckDB mirror of :func:`span_dup_profile` (same tokenizer, same
    window layout, BIGINT-cast sums for dtype parity)."""
    return f"""
    WITH win AS (
      SELECT {id_col} AS id, {group_col} AS grp,
             unnest({_duck_pos_windows(text_col, w)}) AS span
      FROM {table}
    ),
    sd AS (SELECT span, count(DISTINCT id) AS nd FROM win GROUP BY span),
    per AS (
      SELECT win.id, any_value(win.grp) AS grp,
             count(*) AS n_windows,
             sum(CASE WHEN sd.nd >= 2 THEN 1 ELSE 0 END) AS n_dup
      FROM win JOIN sd USING (span)
      GROUP BY win.id
    )
    SELECT grp AS {group_col},
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_windows) AS BIGINT) AS n_windows,
           CAST(sum(n_dup) AS BIGINT) AS n_dup_windows,
           round(CAST(sum(n_dup) AS DOUBLE) / CAST(sum(n_windows) AS DOUBLE), 6)
             AS dup_fraction
    FROM per GROUP BY grp
    """


def span_hot_spans(
    df: DataFrame = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    top: int = 15,
    occ: DataFrame | None = None,
) -> DataFrame:
    """The most-replicated exact spans: (span, n_docs, n_occurrences),
    deterministic top-``top`` by (n_docs desc, n_occurrences desc, span).
    The triage view a curation team reads before writing span-removal
    rules; over the (span, id, occ) occurrence table the rows are
    already unique per (span, doc), so doc-frequency is a plain count —
    one keyed agg -> TakeOrderedAndProject."""
    if occ is None:
        occ = span_occurrences(df, text_col, id_col, None, w)
    return (
        occ.groupBy("span")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("occ").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "span")
        .limit(top)
    )


def duck_span_hot_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    top: int = 15,
) -> str:
    return f"""
    WITH win AS (
      SELECT {id_col} AS id,
             unnest({_duck_pos_windows(text_col, w)}) AS span
      FROM {table}
    )
    SELECT span, CAST(count(DISTINCT id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM win GROUP BY span
    HAVING count(DISTINCT id) >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, span
    LIMIT {top}
    """


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — MOSS).
# Shared by the batch artifact build (queries._cached_winnow_fingerprints)
# and the streaming upkeep (streaming.maintenance.winnow_fp_batch_processor):
# both paths derive the SAME (doc_id, source, nf, f) occurrence rows, so
# streamed == rebuilt is a schema-level guarantee, pinned by pytest.
# ---------------------------------------------------------------------------


def winnow_fingerprints(
    docs: DataFrame, k: int = 12, w: int = 6
) -> DataFrame:
    """(doc_id, source, fps) per document — the zero-shuffle HOF chain:
    hash every character k-gram (cross-engine 60-bit md5), keep each
    w-window's minimum (guaranteed detection of shared substrings of
    length >= k + w - 1 chars).  Docs shorter than k + w - 1 carry no
    window and are dropped.

    Callers that reference ``fps`` more than once (size + explode) must
    persist this frame first: un-persisted, CollapseProject inlines the
    whole HOF chain into EACH reference — a measured 2x of the md5 work
    (PLANS.md, the let-binding rule)."""
    return (
        docs.filter(F.length("text") >= k + w - 1)
        .select("doc_id", "source", "text")
        .select(
            "doc_id",
            "source",
            F.expr(T.spark_kgram_hashes("text", k)).alias("hashes"),
        )
        .select(
            "doc_id",
            "source",
            F.expr(T.spark_winnow_select("hashes", w)).alias("fps"),
        )
    )


def winnow_occurrences(fp: DataFrame) -> DataFrame:
    """Explode a fingerprint frame into (doc_id, source, nf, f)
    occurrence rows; nf keeps the doc's FULL fingerprint count so
    downstream containment denominators stay honest even after a hot
    cap drops rows."""
    return fp.select(
        "doc_id",
        "source",
        F.size("fps").alias("nf"),
        F.explode("fps").alias("f"),
    )


def winnow_hot_cap(ex: DataFrame, max_df: int = 32) -> DataFrame:
    """Drop occurrence rows of viral fingerprints (document frequency >
    ``max_df`` per (source, f)): a boilerplate fingerprint makes any
    pair join's OUTPUT quadratic in its bucket — AQE splits a skewed
    join's input but nothing shrinks its output — and carries no
    near-dup signal (the super-frequent-shingle drop MinHash pipelines
    use).  Applied at artifact build for the batch store and
    merge-on-read for the streamed store, so the cap always reflects
    the FULL corpus seen so far."""
    hot = (
        ex.groupBy("source", "f")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > max_df)
        .select("source", "f")
    )
    return ex.join(F.broadcast(hot), ["source", "f"], "left_anti")


# ---------------------------------------------------------------------------
# Exact-substring dedup (r10): the one public dedup family the winnowing
# span machinery above SAMPLES rather than solves exactly.  Lee et al.
# 2022 ("Deduplicating Training Data Makes Language Models Better",
# github.com/google-research/deduplicate-text-datasets) find maximal
# exact duplicate runs with a corpus-wide suffix array — a single-machine
# construction Spark cannot host.  The Spark-native equivalent is
# seed-and-extend over a POSITIONAL k-gram inverted index: index every
# character position's k-gram hash (O(total chars) rows — the same
# asymptotics as suffix-array construction, distributed instead of
# single-node), equi-join positions sharing a hash (never all-pairs: a
# pair with no common k-gram never materializes, and viral boilerplate
# grams are df-capped exactly like winnow_hot_cap), then chain matched
# seeds into maximal runs per (pair, diagonal): positions of a common
# run of length R sit at R-k+1 CONSECUTIVE offsets on one diagonal
# (pos_a - pos_b constant), so the classic pos - row_number() island
# trick recovers each maximal run and its exact length |island|+k-1.
# Relation to winnowing (winnow_fingerprints): winnowing keeps ~2/(w+1)
# of these rows and only guarantees detection of runs >= k+w-1 with
# approximate extent; this family keeps full density and reports EXACT
# maximal run lengths >= k — the r9 verdict's "optional #7" capability.
# ---------------------------------------------------------------------------


def kgram_positions(docs: DataFrame, k: int = 20) -> DataFrame:
    """(doc_id, source, pos, h): the 60-bit md5 of the character k-gram
    at every position of every doc (0-based).  The hash array is
    materialized as its own column BEFORE the posexplode (the
    let-binding rule — inlined, the O(L) md5 chain re-evaluates per
    position, O(L^2))."""
    return (
        docs.filter(F.length("text") >= k)
        .select(
            "doc_id",
            "source",
            F.expr(T.spark_kgram_hashes("text", k)).alias("hashes"),
        )
        .select(
            "doc_id",
            "source",
            F.posexplode("hashes").alias("pos", "h"),
        )
    )


def prune_for_pairing(grams: DataFrame, max_df: int) -> DataFrame:
    """Occurrence rows whose (source, h) occurrence count is in
    [2, ``max_df``].  The lower bound is LOSSLESS for pairing — a gram
    occurring once can never seed a pair, and most positions of real
    text are unique, so this is the big artifact shrink (measured ~10x
    at sf0.1).  The upper bound is the viral-boilerplate POLICY cap: a
    gram in every templated page makes the pair join's OUTPUT quadratic
    in its bucket (nothing AQE can split), same rationale as
    winnow_hot_cap.  The counts side is corpus-sized (one row per
    distinct gram), so this is a shuffled semi-join, not a broadcast —
    paid once at artifact build."""
    freq = (
        grams.groupBy("source", "h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter((F.col("c") >= 2) & (F.col("c") <= max_df))
        .select("source", "h")
    )
    return grams.join(freq, ["source", "h"], "left_semi")


def exact_substring_runs(
    grams: DataFrame, k: int, max_df: int | None = 32
) -> DataFrame:
    """Maximal exact common substring runs between document pairs:
    (source, doc_id, doc_id_b, diag, run_start, run_start_b, run_len)
    with doc_id < doc_id_b and run_len the EXACT character length of
    the maximal common run.  ``grams`` is :func:`kgram_positions`
    output (or the streamed equivalent).

    Plan shape at 100 TB: :func:`prune_for_pairing` (singleton-lossless
    + viral-cap, skipped with ``max_df=None`` for pre-pruned artifact
    input), one shuffle on (source, h) for the seed join, one shuffle
    on the pair keys for the island window — whose partitions are
    (doc_id, doc_id_b, diag), bounded by ONE document's positions, so
    no partition outgrows a doc however large the corpus."""
    kept = grams if max_df is None else prune_for_pairing(grams, max_df)
    a = kept.select(
        "source", "h", F.col("doc_id"), F.col("pos").alias("pos_a")
    )
    b = kept.select(
        "source",
        "h",
        F.col("doc_id").alias("doc_id_b"),
        F.col("pos").alias("pos_b"),
    )
    seeds = (
        a.join(b, ["source", "h"])
        .filter(F.col("doc_id") < F.col("doc_id_b"))
        .select(
            "source",
            "doc_id",
            "doc_id_b",
            (F.col("pos_a") - F.col("pos_b")).alias("diag"),
            "pos_a",
            "pos_b",
        )
    )
    # island id: consecutive seed positions on one diagonal share
    # pos_a - row_number(); each (pair, diag, pos_a) is unique (one
    # pos_b per diagonal), so row_number over pos_a is collision-free
    iw = Window.partitionBy("doc_id", "doc_id_b", "diag").orderBy("pos_a")
    islands = seeds.withColumn(
        "_island", F.col("pos_a") - F.row_number().over(iw)
    )
    return islands.groupBy(
        "source", "doc_id", "doc_id_b", "diag", "_island"
    ).agg(
        F.min("pos_a").alias("run_start"),
        F.min("pos_b").alias("run_start_b"),
        (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias("run_len"),
    ).drop("_island")


def self_repetition_runs(grams: DataFrame, k: int) -> DataFrame:
    """WITHIN-document repeated runs — the other half of the Lee et al.
    dedup (their pipeline also collapses internal repeats; tandem or
    templated repetition is a strong low-quality signal, RefinedWeb's
    repetition filters measure the same thing at word level):
    (source, doc_id, diag, run_start, run_len) where the document's
    substring at ``run_start`` reappears ``diag`` characters later,
    for ``run_len`` (maximal, exact).  ``grams`` is the SAME pruned
    positional artifact the cross-doc pairing uses — the [>=2]
    occurrence prune is lossless here too (a self-repeat means the
    gram occurs >= 2 times), and the df cap bounds the self-join fan
    per gram at <= C(32,2) pairs, which is also the quadratic guard
    for degenerate all-one-char documents (their grams exceed the cap
    and drop).  The island window partitions by (doc_id, diag) —
    bounded by one document's positions (the co-key rule)."""
    a = grams.select(
        "source", "doc_id", "h", F.col("pos").alias("pos_a")
    )
    b = grams.select("doc_id", "h", F.col("pos").alias("pos_b"))
    seeds = (
        a.join(b, ["doc_id", "h"])
        .filter(F.col("pos_a") < F.col("pos_b"))
        .select(
            "source",
            "doc_id",
            (F.col("pos_b") - F.col("pos_a")).alias("diag"),
            "pos_a",
        )
    )
    iw = Window.partitionBy("doc_id", "diag").orderBy("pos_a")
    islands = seeds.withColumn(
        "_island", F.col("pos_a") - F.row_number().over(iw)
    )
    return islands.groupBy("source", "doc_id", "diag", "_island").agg(
        F.min("pos_a").alias("run_start"),
        (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias("run_len"),
    ).drop("_island")
