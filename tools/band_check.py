"""Replay the performance-band check against a persisted bench window.

Reads BENCH_FULL_latest.json (or the path given as argv[1]), recomputes
every band ratio as query_seconds / trimmed_anchor_mean(anchor_reads)
(bench.trimmed_anchor_mean — the r10 normalization rule; rationale in
its docstring), and exits nonzero on any breach of bench.BANDS.  Usage::

    python tools/band_check.py [BENCH_FULL_latest.json]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from bench import BANDS, trimmed_anchor_mean


def check(path: str) -> int:
    with open(path) as fh:
        win = json.load(fh)
    tm = trimmed_anchor_mean(win["anchor_reads"])
    breaches = []
    for name, band in sorted(BANDS.items()):
        sec = win["queries"].get(name)
        if sec is None:
            print(f"SKIP {name}: not in window")
            continue
        ratio = sec / tm
        mark = "BREACH" if ratio > band else "ok"
        print(f"{mark:6s} {name}: {ratio:.2f} (band <= {band}, {sec:.3f}s)")
        if ratio > band:
            breaches.append(name)
    print(
        f"anchor trimmed mean {tm:.4f}s over {len(win['anchor_reads'])} "
        f"reads; {len(breaches)} breach(es)"
    )
    return 1 if breaches else 0


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL_latest.json"
    sys.exit(check(path))
