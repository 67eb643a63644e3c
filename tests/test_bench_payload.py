"""bench.py's stdout contract: ONE bounded JSON line (the driver's capture
buffer front-truncates long tails, which silently broke round 1's series).
Pure-Python tests — no Spark session."""

from __future__ import annotations

import json

import bench


def test_payload_is_bounded_and_keeps_slowest():
    timings = {f"query_{i:03d}": round(0.01 * i, 4) for i in range(200)}
    payload = bench.bounded_payload(timings, sf=0.1)
    line = json.dumps(payload)
    assert len(line) <= bench.MAX_LINE_BYTES + 200
    # totals cover ALL queries even when the per-query map is truncated
    assert payload["n_queries"] == 200
    assert payload["value"] == round(sum(timings.values()), 4)
    assert payload["max_sec"] == max(timings.values())
    # the kept entries are exactly the slowest ones
    kept = payload["queries"]
    assert kept
    cutoff = min(kept.values())
    dropped = [v for k, v in timings.items() if k not in kept]
    assert all(v <= cutoff for v in dropped)
    assert payload["queries_omitted"] == 200 - len(kept)


def test_payload_anchor_normalized_fields():
    """r11 (verdict item 2): the stdout line carries anchor-normalized
    totals and per-kept-query tm ratios so the driver's round-over-round
    diff can read ratios instead of cold-box seconds — additions-only,
    still one bounded line."""
    timings = {f"query_{i:03d}": round(0.01 * i, 4) for i in range(200)}
    payload = bench.bounded_payload(timings, sf=0.1, anchor_tm=0.4)
    line = json.dumps(payload)
    assert len(line) <= bench.MAX_LINE_BYTES + 200
    assert payload["total_anchor_units"] == round(payload["value"] / 0.4, 2)
    # ratios align 1:1 with the kept queries, in insertion order
    ratios = payload["tm_ratios_slowest"]
    assert len(ratios) == len(payload["queries"])
    for (name, sec), ratio in zip(payload["queries"].items(), ratios):
        assert ratio == round(sec / 0.4, 2), name
    # and the no-anchor form stays exactly the old shape
    bare = bench.bounded_payload(timings, sf=0.1)
    assert "total_anchor_units" not in bare
    assert "tm_ratios_slowest" not in bare
    # additions must never displace the pre-r11 fields (the first cut
    # of this feature silently dropped band_breaches from the line)
    full = bench.bounded_payload(
        timings, sf=0.1, anchor_median=0.4, anchor_tm=0.4, n_band_breaches=0
    )
    for key in ("anchor_median_sec", "anchor_trimmed_mean_sec",
                "band_breaches", "total_anchor_units", "tm_ratios_slowest"):
        assert key in full, key


def test_payload_small_suite_fits_entirely():
    timings = {"a": 1.0, "b": 2.0}
    payload = bench.bounded_payload(timings, sf=0.01)
    assert payload["queries"] == {"b": 2.0, "a": 1.0}
    assert payload["queries_omitted"] == 0


def test_headline_names_resolve_in_registry():
    from vector_database_api_spark import queries as q

    registry = set(q.spark_queries()) | set(q.demo_queries())
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert not missing, missing


def test_anchor_is_a_headline_query():
    assert bench.ANCHOR in bench.HEADLINE


def test_every_headline_query_has_a_plan_audit_row():
    """A new bench query can never ship unaudited: PLANS_AUDIT.md (the
    tools/plan_report.py output committed at the repo root) must carry a
    row for every bench.HEADLINE name.  Round 3 shipped
    cross_source_contamination — the round's slowest query — with no
    audit row because the audit refresh predated the query; this pins
    the refresh into the gate."""
    import os

    path = os.path.join(os.path.dirname(bench.__file__), "PLANS_AUDIT.md")
    audited = set()
    with open(path) as f:
        for line in f:
            if line.startswith("| ") and " | " in line:
                audited.add(line.split("|")[1].strip())
    missing = [n for n in bench.HEADLINE if n not in audited]
    assert not missing, f"bench queries missing from PLANS_AUDIT.md: {missing}"


def test_coordinator_fusion_legs_have_audit_rows():
    """Queries that fuse COLLECTED legs on the driver run their
    data-sized plans inside collect(), invisible to an audit of the
    returned frame (r5 verdict: hybrid_rrf_fusion read "0 shuffles").
    Every such query must expose its legs via queries.AUDIT_SUBPLANS,
    and the committed PLANS_AUDIT.md must carry one "query:leg" row per
    leg."""
    import os

    from vector_database_api_spark import queries as q

    # the fusion queries on the bench surface must be registered
    for name in (
        "hybrid_rrf_fusion",
        "hybrid_rrf_filtered",
        "mmr_diversified_topk",
    ):
        assert name in q.AUDIT_SUBPLANS, name
        assert q.AUDIT_SUBPLANS[name], name

    path = os.path.join(os.path.dirname(bench.__file__), "PLANS_AUDIT.md")
    audited = set()
    with open(path) as f:
        for line in f:
            if line.startswith("| ") and " | " in line:
                audited.add(line.split("|")[1].strip())
    expected = [
        f"{name}:{leg}"
        for name, legs in q.AUDIT_SUBPLANS.items()
        if name in bench.HEADLINE
        for leg in legs
    ]
    missing = [n for n in expected if n not in audited]
    assert not missing, f"fusion legs missing from PLANS_AUDIT.md: {missing}"


def test_trimmed_anchor_mean_drops_tails():
    """r10 band normalization: a single spiked (or lucky) anchor read
    must not move the denominator — the exact failure that made the r9
    driver window breach a day-old band (reads 0.26-0.43 in ONE
    window, median-normalized ratio 4.33 vs the builder's 3.68)."""
    quiet = [0.30] * 15
    spiked = quiet + [1.2, 0.05]  # one spike, one lucky read
    tm_quiet = bench.trimmed_anchor_mean(quiet)
    tm_spiked = bench.trimmed_anchor_mean(spiked)
    assert abs(tm_quiet - 0.30) < 1e-9
    assert abs(tm_spiked - 0.30) < 1e-9  # both tails trimmed entirely
    # small windows (< 5 reads) fall back to the plain mean
    assert abs(bench.trimmed_anchor_mean([0.2, 0.4]) - 0.3) < 1e-12


def test_bands_pass_on_both_recorded_windows():
    """Every band must hold on the committed window (BENCH_FULL_latest
    .json) under the trimmed-mean rule — the committed-window replay
    the r9 verdict asked for.  A breach here is a real perf regression
    or a band set too tight; investigate, don't widen silently."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(bench.__file__), "tools"))
    import band_check

    path = os.path.join(
        os.path.dirname(bench.__file__), "BENCH_FULL_latest.json"
    )
    assert band_check.check(path) == 0


def test_banded_queries_are_headline():
    assert set(bench.BANDS) <= set(bench.HEADLINE)
