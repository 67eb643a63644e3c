"""Driver-side re-ranking over BOUNDED top-k pools.

MMR (maximal marginal relevance) and its helpers operate on a collected
relevance pool — 20-100 rows regardless of corpus size — so the greedy
selection is O(k'^2) coordinator work, the same bounded-driver
adjudication as RRF fusion (`operators/bm25.py::rrf_fuse`).  The
arithmetic replays the engines' exact double semantics (sequential
left-to-right cosine fold, identical to ``functions/vector.py`` and the
DuckDB fragments), so the oracle-checked registry query
(`queries.py::mmr_diversified_topk`) and the served path
(`service.py::search_diversified`) share these functions verbatim.
"""

from __future__ import annotations

import math


def seq_cosine(a: list, b: list) -> float:
    """Exact replay of cosine_similarity / duck_cosine: sequential
    left-to-right double accumulation, dot/(sqrt(na)*sqrt(nb)); 0.0 on a
    zero norm (V1 semantics)."""
    dot = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    na = 0.0
    for x in a:
        na += float(x) * float(x)
    nb = 0.0
    for y in b:
        nb += float(y) * float(y)
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / (math.sqrt(na) * math.sqrt(nb))


def pairwise_cosines(vec: dict) -> dict:
    """All ordered-pair cosines of a bounded id->vector pool."""
    return {
        (i, j): seq_cosine(vec[i], vec[j]) for i in vec for j in vec if i != j
    }


def mmr_greedy(
    rel: dict,
    sim: dict,
    k: int,
    lam: float = 0.7,
    one_minus_lam: float = 0.3,
) -> list[tuple[int, object, float]]:
    """Greedy MMR over a bounded pool: round 1 picks argmax lam*rel
    (ties by id ascending); round n scores lam*rel -
    one_minus_lam*max(sim to selected).  Returns [(rank, id, mmr_score)]
    — the exact double math both engines replay (the registry oracle
    unrolls these rounds as CTEs).

    ``one_minus_lam`` is a SEPARATE literal, not computed as 1-lam:
    1.0 - 0.7 is 0.30000000000000004 in IEEE doubles while the engines
    evaluate the literal 0.3 — computing it would silently break the
    bit-exact oracle hash."""
    if not rel:
        return []
    picked: list[tuple[int, object, float]] = []
    chosen: list = []
    first = min(rel, key=lambda d: (-rel[d], d))
    picked.append((1, first, lam * rel[first]))
    chosen.append(first)
    for n in range(2, min(k, len(rel)) + 1):
        best = None
        for d in rel:
            if d in chosen:
                continue
            ms = max(sim[(d, c)] for c in chosen)
            score = lam * rel[d] - one_minus_lam * ms
            if best is None or (score, _neg(d)) > (best[1], _neg(best[0])):
                best = (d, score)
        picked.append((n, best[0], best[1]))
        chosen.append(best[0])
    return picked


def _neg(d):
    """Tie-break helper: prefer the SMALLER id at equal score for both
    int and str ids (an int negates; a str can't, so wrap it in a
    reversed-comparison key)."""
    if isinstance(d, (int, float)):
        return -d
    return _ReversedStr(d)


class _ReversedStr:
    __slots__ = ("s",)

    def __init__(self, s: str):
        self.s = s

    def __lt__(self, other) -> bool:
        return self.s > other.s

    def __gt__(self, other) -> bool:
        return self.s < other.s

    def __eq__(self, other) -> bool:
        return self.s == other.s


def autocut(scores: list[float]) -> int:
    """Weaviate-style autocut over a DESCENDING score list: the number of
    results to keep = position of the largest adjacent score gap
    (earliest on ties).  Lists with fewer than 2 entries keep everything
    (no gaps to cut at).  O(k) over a collected top-k — bounded
    coordinator work, the rrf_fuse adjudication.  Shared verbatim by the
    oracle-checked registry query (`queries.py::autocut_topk`) and the
    served path (`service.py::search_autocut`)."""
    best_gap, cut = None, len(scores)
    for i in range(len(scores) - 1):
        gap = scores[i] - scores[i + 1]
        if best_gap is None or gap > best_gap:
            best_gap, cut = gap, i + 1
    return cut
