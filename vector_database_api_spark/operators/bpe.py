"""Byte-pair-encoding merge induction — the vocabulary-learning step of
a tokenizer training pipeline (Sennrich et al. 2016), expressed as pure
DataFrame composition so the same corpus scan that powers vocab stats can
learn merge rules.

Beyond-reference operator (the reference has no text analytics at all).
BPE learning is inherently SEQUENTIAL in rounds (merge choice r feeds
the representation of round r+1), and the r7-era fully-unrolled DAG hid
an exponential: each round's plan referenced the previous round's rep
subtree twice (once under the broadcast argmax build, once as the merge
probe), so plan shuffle count DOUBLED per round (measured 16/84/368 at
rounds 2/4/6) — fatal long before the thousands of rounds a real
tokenizer runs.  Since round 8 each round is MATERIALIZED: the 1-row
argmax merge is collected (bounded driver data — the merge decision IS
the model being learned) and inlined as literals, and the rep table's
lineage is truncated with an eager ``localCheckpoint`` so round r+1's
plan starts from stored blocks, never from round r's lineage.  Plans,
shuffles, and compute are all LINEAR in rounds (pinned by
tests/test_bpe.py); the rep data itself never leaves the executors.
Each round is:

1. pair statistics: explode adjacent symbol pairs of every distinct
   word's current representation, weighted by corpus word frequency —
   ONE keyed aggregation with map-side combine (the corpus itself is
   touched once ever, to build the word-frequency table; rounds operate
   on the distinct-word table, which is vocabulary-sized).
2. argmax merge: deterministic best pair by (count desc, pair asc) — a
   1-row DataFrame broadcast into
3. merge application: a left-to-right FOLD over the symbol list
   (``aggregate`` in Spark, ``list_reduce`` in DuckDB) rebuilding the
   separator-wrapped representation; the step merges the current symbol
   into the accumulator's LAST symbol iff (last, current) == (a, b).
   That is exactly single-pass greedy BPE — on a run "a a a a" with
   merge (a,a) it yields (aa, aa), never re-merging a just-created
   symbol — and the separator suffix check makes symbol boundaries
   unambiguous (last symbol "xa" never matches pair-left "a").  A plain
   string ``replace`` of "·a·b·" is NOT equivalent: it consumes the
   shared trailing separator and skips adjacent occurrences (tested).

The word representation is built with regexp_replace('(.)' -> '$1·'),
so only ASCII-lowercase words are admitted (filter ^[a-z]+$) — one
codepoint per symbol by construction on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_api_spark.functions import text as T

SEP = "·"  # '·' — never appears in ^[a-z]+$ words


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over ASCII-lowercase words of length >= 2 — the single
    corpus-wide scan; everything after operates on this vocabulary-sized
    table."""
    return (
        df.select(F.explode(F.expr(T.spark_tokens(text_col))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]{2,}$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_rep(word_col: str = "word") -> F.Column:
    # "abc" -> "·a·b·c·"
    return F.concat(
        F.lit(SEP), F.regexp_replace(F.col(word_col), "(.)", "$1" + SEP)
    )


def _pair_stats(reps: DataFrame) -> DataFrame:
    """(a, b, c): adjacent-symbol pair counts weighted by word frequency.
    Symbols come from splitting the rep on the separator and dropping the
    empty edge elements."""
    syms = F.expr(f"filter(split(rep, '{SEP}'), x -> x <> '')")
    # zip the symbol list with its shift-by-one (Spark's sequence(1, 0)
    # DESCENDS rather than being empty, so an index-based transform blows
    # up on single-symbol reps; the slice/zip_with form is total)
    pairs = F.expr(
        "zip_with(slice(syms, 1, greatest(size(syms) - 1, 0)), "
        "slice(syms, 2, greatest(size(syms) - 1, 0)), "
        "(x, y) -> struct(x AS a, y AS b))"
    )
    return (
        reps.select("cnt", syms.alias("syms"))
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("c"))
    )


def _best_pair(stats: DataFrame):
    """Deterministic argmax merge by (c desc, a, b), collected as
    ``(a, b, c)`` or ``None`` when no pairs remain.  Kept as
    TakeOrdered (orderBy + limit(1)) deliberately: an
    ``agg(min(struct(-c, a, b)))`` single-row form was measured at 4
    jobs/round under AQE (every shuffle stage runs as its own job)
    vs 3/round for this one — tests/test_bpe.py pins the per-round
    job count, which is the clock at thousands of merge rounds."""
    rows = stats.orderBy(F.desc("c"), "a", "b").limit(1).collect()
    if not rows:
        return None
    return rows[0]["a"], rows[0]["b"], rows[0]["c"]


def _merge_fold_literal(a: str, b: str) -> F.Column:
    """The boundary-safe greedy merge fold with the learned pair
    inlined as literals (symbols are ^[a-z]+$ by construction, so the
    literals need no escaping)."""
    return F.expr(
        f"aggregate(filter(split(rep, '{SEP}'), x -> x <> ''), '{SEP}', "
        f"(acc, x) -> CASE WHEN endswith(acc, '{SEP}{a}{SEP}') "
        f"AND x = '{b}' "
        f"THEN substring(acc, 1, length(acc) - {len(a)} - 1) "
        f"|| '{a}{b}{SEP}' "
        f"ELSE acc || x || '{SEP}' END)"
    )


def bpe_merge_rounds(
    df: DataFrame | None = None,
    text_col: str = "text",
    rounds: int = 3,
    wf: DataFrame | None = None,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Learn the first ``rounds`` BPE merges of the corpus.

    Returns (round, merge_left, merge_right, pair_count) — one row per
    learned merge, ordered by round.  Each round runs ONE
    vocabulary-sized pair-stats aggregation, collects the 1-row argmax
    (the merge decision — bounded driver data; a trained tokenizer is
    exactly this list), inlines it as literals into the merge fold, and
    eagerly ``localCheckpoint``s the new rep table so the next round's
    plan starts from stored executor blocks.  Plans, shuffles, and
    compute are LINEAR in ``rounds`` (see module docstring for the
    exponential the unrolled form hid); the rep table itself never
    leaves the executors.

    ``wf`` is an optional pre-built :func:`word_frequencies` table — the
    per-corpus artifact a tokenizer-training service stores; callers that
    serve repeated BPE queries should build + persist it once and pass
    it in (round 1 reads it once; an unpersisted wf costs one extra
    corpus scan).  Intermediate rep checkpoints are transient executor
    blocks, released by Spark's context cleaner.

    Durability trade-off (r8 ADVICE): ``localCheckpoint`` truncates
    lineage into NON-REPLICATED executor blocks, so losing any executor
    mid-training (node failure, dynamic-allocation decommission) makes
    earlier rounds' rep data unrecoverable and fails the whole
    multi-round job — acceptable for short interactive round counts,
    not for a thousands-of-rounds production train on preemptible
    nodes.  For those, pass ``reliable_checkpoint=True``: each round's
    rep table is then written through the configured Spark checkpoint
    directory (``sparkContext.setCheckpointDir`` — HDFS/S3 in a
    cluster), making every round restartable at the cost of one
    vocabulary-sized (NOT corpus-sized) write per round.  Raises
    early if no checkpoint dir is configured.  Storage obligation:
    Spark deletes reliable checkpoints only with
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (a
    startup conf) and only on GC of the RDD reference — otherwise each
    round's vocabulary-sized checkpoint stays on the cluster store
    after the job; set that conf or prune the checkpoint dir in the
    pipeline's cleanup step (r9 review).
    """
    if wf is None:
        if df is None:
            raise ValueError("bpe_merge_rounds needs df or wf")
        wf = word_frequencies(df, text_col)
    spark = wf.sparkSession
    if reliable_checkpoint and spark.sparkContext.getCheckpointDir() is None:
        raise ValueError(
            "bpe_merge_rounds(reliable_checkpoint=True) needs "
            "sparkContext.setCheckpointDir(...) configured first"
        )
    reps = wf.select("word", "cnt", _initial_rep().alias("rep"))
    results: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        best = _best_pair(_pair_stats(reps))
        if best is None:
            # no adjacent pairs left: the unrolled form's empty cross
            # join annihilated reps and produced no further merge rows
            break
        a, b, c = best
        results.append((r, a, b, c))
        reps = reps.select(
            "word", "cnt", _merge_fold_literal(a, b).alias("rep")
        )
        if r < rounds:
            reps = (
                reps.checkpoint(eager=True)
                if reliable_checkpoint
                else reps.localCheckpoint(eager=True)
            )
    return spark.createDataFrame(
        results,
        "round int, merge_left string, merge_right string, pair_count bigint",
    )


def _duck_learn_cte_chain(
    table: str = "documents", text_col: str = "text", rounds: int = 3
) -> str:
    """The learning CTE chain (``wf``/``r0`` .. ``p{r}``/``b{r}``/``r{r}``)
    shared by :func:`duck_bpe_merge_sql` and :func:`duck_bpe_tokenize_sql`
    — exposed as its own helper so the tokenize oracle composes the chain
    directly instead of string-splitting generated SQL (r5 ADVICE: a
    formatting change in the merge SQL silently truncated the prefix)."""
    toks = T.duck_tokens(text_col)
    parts = [
        f"""
    wf AS (
      SELECT w AS word, count(*) AS cnt
      FROM (SELECT unnest({toks}) AS w FROM {table})
      WHERE regexp_matches(w, '^[a-z]{{2,}}$')
      GROUP BY w
    ),
    r0 AS (
      SELECT word, cnt,
             '{SEP}' || regexp_replace(word, '(.)', '\\1{SEP}', 'g') AS rep
      FROM wf
    )"""
    ]
    for r in range(1, rounds + 1):
        prev = f"r{r - 1}"
        parts.append(
            f"""
    p{r} AS (
      SELECT p.a, p.b, CAST(sum(cnt) AS BIGINT) AS c
      FROM (
        SELECT cnt,
               unnest(list_transform(range(1, greatest(len(syms) - 1, 0) + 1),
                      i -> struct_pack(a := syms[i], b := syms[i + 1]))) AS p
        FROM (SELECT cnt,
                     list_filter(string_split(rep, '{SEP}'), x -> x <> '') AS syms
              FROM {prev})
      )
      GROUP BY p.a, p.b
    ),
    b{r} AS (SELECT a, b, c FROM p{r} ORDER BY c DESC, a, b LIMIT 1),
    r{r} AS (
      SELECT word, cnt,
             list_reduce(
               list_prepend('{SEP}',
                 list_filter(string_split(rep, '{SEP}'), x -> x <> '')),
               (acc, x) -> CASE
                 WHEN ends_with(acc, '{SEP}' || b{r}.a || '{SEP}')
                      AND x = b{r}.b
                 THEN substr(acc, 1, length(acc) - length(b{r}.a) - 1)
                      || b{r}.a || b{r}.b || '{SEP}'
                 ELSE acc || x || '{SEP}' END) AS rep
      FROM {prev} CROSS JOIN b{r}
    )"""
        )
    return "WITH " + ",".join(parts)


def duck_bpe_merge_sql(
    table: str = "documents", text_col: str = "text", rounds: int = 3
) -> str:
    """DuckDB mirror of :func:`bpe_merge_rounds`: identical tokenizer,
    representation, pair statistics, argmax tie-break, and left-to-right
    ``replace`` merge semantics, with the rounds unrolled as CTE stages."""
    finals = "\n    UNION ALL ".join(
        f"SELECT {r} AS round, a AS merge_left, b AS merge_right, c AS pair_count FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return _duck_learn_cte_chain(table, text_col, rounds) + "\n    " + finals


def bpe_final_reps(
    wf: DataFrame, rounds: int = 3, reliable_checkpoint: bool = False
) -> DataFrame:
    """APPLY side of the tokenizer lifecycle: the vocabulary's final
    symbol representation after learning + applying ``rounds`` merges —
    (word, cnt, rep).  Same unrolled DAG as :func:`bpe_merge_rounds`
    (each round's argmax merge enters the next fold via a broadcast
    1-row cross join); this returns the post-merge representations
    instead of the merge list, i.e. the trained tokenizer MODEL a
    serving pipeline persists and joins against incoming text.  Same
    round-materialized, linear-plan discipline as
    :func:`bpe_merge_rounds` (collect the 1-row argmax, inline as
    literals, checkpoint the rep lineage) AND the same durability
    trade-off/knob: ``reliable_checkpoint=True`` for
    executor-loss-survivable rounds — this is the long-running
    production path, so it carries the same option (r9 review); the
    returned frame is the final checkpointed rep table."""
    spark = wf.sparkSession
    if reliable_checkpoint and spark.sparkContext.getCheckpointDir() is None:
        raise ValueError(
            "bpe_final_reps(reliable_checkpoint=True) needs "
            "sparkContext.setCheckpointDir(...) configured first"
        )
    reps = wf.select("word", "cnt", _initial_rep().alias("rep"))
    for r in range(rounds):
        best = _best_pair(_pair_stats(reps))
        if best is None:
            # unrolled-form parity: an empty argmax cross-join
            # annihilated the rep table
            return reps.where(F.lit(False))
        a, b = best[0], best[1]
        reps = reps.select(
            "word", "cnt", _merge_fold_literal(a, b).alias("rep")
        )
        if r < rounds - 1:
            reps = (
                reps.checkpoint(eager=True)
                if reliable_checkpoint
                else reps.localCheckpoint(eager=True)
            )
    return reps


def duck_bpe_tokenize_sql(
    table: str = "documents", text_col: str = "text", rounds: int = 3
) -> str:
    """DuckDB mirror of the tokenize-profile query: learn ``rounds``
    merges exactly as :func:`duck_bpe_merge_sql`, then apply the final
    representations back to the corpus word stream and report per-source
    token statistics (integer-exact; the chars/token ratio is one
    IEEE division of exact counts)."""
    toks = T.duck_tokens(text_col)
    # the learning CTE chain, composed from the shared helper (never
    # re-derived by splitting generated SQL)
    return (
        _duck_learn_cte_chain(table, text_col, rounds)
        + f""",
    nsym AS (
      SELECT word,
             length(word) AS n_chars,
             len(list_filter(string_split(rep, '{SEP}'), x -> x <> ''))
               AS n_sym
      FROM r{rounds}
    ),
    fact AS (
      SELECT source, w AS word
      FROM (SELECT source, unnest({toks}) AS w FROM {table})
      WHERE regexp_matches(w, '^[a-z]{{2,}}$')
    )
    SELECT f.source,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n.n_chars) AS BIGINT) AS n_chars,
           CAST(sum(n.n_sym) AS BIGINT) AS n_tokens,
           round(CAST(sum(n.n_chars) AS DOUBLE) / sum(n.n_sym), 4)
             AS chars_per_token
    FROM fact f JOIN nsym n ON f.word = n.word
    GROUP BY f.source ORDER BY f.source"""
    )
