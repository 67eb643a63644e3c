"""Property-based tests that DO run Spark plans per example — reserved
for the two operators whose correctness argument is subtle enough to
deserve a model check against a trivially-correct Python reference:

- the round-materialized BPE merge learner (rewritten in round 8 from
  the unrolled DAG: the greedy boundary-safe fold with the argmax pair
  inlined as literals must equal single-pass greedy BPE for ANY corpus);
- grouped_topk (the skew-safe salted per-group top-k: the shard-prune +
  combinable-reduce pipeline must be row-identical to the plain ranking
  window for ANY groups/scores/ties layout).

Example counts are kept small (each example is a Spark job); the wide
random sweep of pure kernels lives in test_properties.py.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


# -- BPE reference: single-pass greedy merge, argmax by (c desc, a, b) ---


def _ref_bpe_merges(word_counts: dict[str, int], rounds: int):
    reps = {w: [ch for ch in w] for w in word_counts}
    merges = []
    for r in range(1, rounds + 1):
        stats: dict[tuple[str, str], int] = {}
        for w, syms in reps.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + word_counts[w]
        if not stats:
            break
        (a, b), c = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, a, b, c))
        for w, syms in reps.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            reps[w] = out
    return merges


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=2, max_size=7),
        min_size=1,
        max_size=12,
    ),
    counts=st.lists(st.integers(1, 9), min_size=12, max_size=12),
    rounds=st.integers(1, 3),
)
@settings(max_examples=25, deadline=None)
def test_bpe_merges_match_reference_greedy(spark, words, counts, rounds):
    """The literal-inlined merge fold + 1-row argmax collect equals
    single-pass greedy BPE (pair stats weighted by word frequency,
    argmax by (count desc, pair asc), left-to-right non-re-merging
    application) for ANY small corpus."""
    from vector_database_api_spark.operators.bpe import bpe_merge_rounds

    wc: dict[str, int] = {}
    for w, c in zip(words, counts):
        wc[w] = wc.get(w, 0) + c
    wf = spark.createDataFrame(list(wc.items()), "word string, cnt long")
    got = [
        (r["round"], r["merge_left"], r["merge_right"], r["pair_count"])
        for r in bpe_merge_rounds(wf=wf, rounds=rounds).collect()
    ]
    assert got == _ref_bpe_merges(wc, rounds)


# -- grouped_topk vs the plain ranking window ----------------------------


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),
            st.integers(0, 6),  # small score domain forces ties
        ),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(1, 4),
    shards=st.integers(1, 5),
)
@settings(max_examples=25, deadline=None)
def test_grouped_topk_matches_reference_for_any_layout(
    spark, rows, k, shards
):
    """grouped_topk == row_number().over(partitionBy(group).orderBy(
    score desc, id asc)) <= k for ANY group sizes, tie patterns, k, and
    shard count (ids unique ⇒ total order, the operator's contract)."""
    from vector_database_api_spark.operators.skew import grouped_topk

    data = [(g, i, float(s)) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "g string, id long, score double")
    got = sorted(
        (r["g"], r["rank"], r["id"], r["score"])
        for r in grouped_topk(df, "g", "score", "id", k, shards=shards)
        .collect()
    )
    expect = []
    by_group: dict[str, list] = {}
    for g, i, s in data:
        by_group.setdefault(g, []).append((-s, i))
    for g, items in by_group.items():
        for rank, (negs, i) in enumerate(sorted(items)[:k], 1):
            expect.append((g, rank, i, -negs))
    assert got == sorted(expect)
