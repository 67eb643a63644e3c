"""bench.select_redraws — the end-of-suite redraw selection rules.

Pure-function tests (no Spark): rule 1 (per-query anchor ratio >
REDRAW_RATIO) and rule 2 (round 8: nearest anchor read > PATCH_FACTOR x
window anchor median — patch detection).  The synthetic series below
reproduces the r7 committed-window failure mode: anchor read #11 spiked
to ~5x the median and every query timed beside it recorded inflated
seconds with IN-BAND ratios, so the ratio rule alone re-drew nothing.
"""

import bench


def _window(anchor_reads, assignments):
    """Build (timings, nearest_anchor) from {name: (sec, anchor_idx)}."""
    timings = {n: sec for n, (sec, _) in assignments.items()}
    nearest = {n: anchor_reads[i] for n, (_, i) in assignments.items()}
    return timings, nearest


QUIET = [0.34, 0.35, 0.33, 0.34, 0.36, 0.34, 0.35, 0.34, 0.33, 0.34]


def test_ratio_rule_still_fires():
    anchors = list(QUIET)
    timings, nearest = _window(
        anchors,
        {
            "fast": (0.30, 0),
            "slow_real": (1.20, 1),  # ratio 3.43 > 3.2 on a quiet anchor
        },
    )
    assert bench.select_redraws(timings, nearest, anchors) == ["slow_real"]


def test_patch_rule_catches_inband_ratio_beside_spiked_anchor():
    # r7 shape: anchor #10 spikes to 1.619 (median 0.34); the queries
    # attached to it read 2-4x their quiet seconds but their ratios are
    # 1.2-1.8 — in-band, invisible to the ratio rule.
    anchors = QUIET + [1.619]
    timings, nearest = _window(
        anchors,
        {
            "quiet_q": (0.40, 3),        # ratio 1.18, quiet anchor — keep
            "patched_a": (2.82, 10),     # ratio 1.74 — in-band, but patched
            "patched_b": (2.28, 10),     # ratio 1.41 — in-band, but patched
        },
    )
    got = bench.select_redraws(timings, nearest, anchors)
    assert got == ["patched_a", "patched_b"]


def test_patch_and_ratio_do_not_double_select():
    anchors = QUIET + [1.619]
    timings, nearest = _window(
        anchors,
        {"both_rules": (6.0, 10)},  # ratio 3.7 AND spiked anchor
    )
    assert bench.select_redraws(timings, nearest, anchors) == ["both_rules"]


def test_quiet_window_selects_nothing():
    anchors = list(QUIET)
    timings, nearest = _window(
        anchors,
        {f"q{i}": (0.3 + 0.05 * i, i % len(anchors)) for i in range(8)},
    )
    assert bench.select_redraws(timings, nearest, anchors) == []


def test_suite_order_preserved():
    # selection returns timings insertion order, not severity order
    anchors = QUIET + [1.0]
    timings, nearest = _window(
        anchors,
        {
            "first": (1.5, 10),
            "second": (2.9, 10),
        },
    )
    assert bench.select_redraws(timings, nearest, anchors) == [
        "first",
        "second",
    ]
