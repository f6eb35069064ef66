"""Regenerate BASELINE.md's standing per-query table from a bench JSON line.

Usage:
    python bench.py > /tmp/bench.json          # run ALONE (JVM contention)
    python scripts/update_baseline.py /tmp/bench.json

Replaces everything from the '## Standing per-query baseline' heading down;
the intro keeps the round-1 comparison notes.
"""

from __future__ import annotations

import json
import sys

BASELINE = "BASELINE.md"
HEADING = "## Standing per-query baseline"

INTRO_NOTES = """(round 1: 43.714 s over 36; every round-1 query is at or
below its round-1 time — the biggest drops were `event_props_json`
6.75→0.45 s (single JSON parse), `repetition_stats` 3.89→0.41 s
(zero-shuffle fold), `dedup_minhash_lsh` 5.16→2.0 s (24/6 banding),
`embedding_near_dup` 3.79→0.84 s (distributed block matmul),
`data_mix_by_source` 1.89→0.34 s (literal-map rate lookup))."""


def main() -> None:
    bench = json.load(open(sys.argv[1]))
    qs = sorted(bench["queries"].items(), key=lambda kv: -kv[1])
    half = (len(qs) + 1) // 2
    lines = ["| query | r2 sec | query | r2 sec |", "|---|---|---|---|"]
    for i in range(half):
        left = qs[i]
        right = qs[i + half] if i + half < len(qs) else ("", "")
        rv = f"{right[1]}" if right[0] else ""
        lines.append(f"| {left[0]} | {left[1]} | {right[0]} | {rv} |")
    text = open(BASELINE).read()
    head, _, _ = text.partition(HEADING)
    section = (
        f"{HEADING} (round 2, sf=0.1, local[32])\n\n"
        f"Round-2 recorded wall-clock — **{bench['value']} s total over "
        f"{len(qs)}\nheadline queries** {INTRO_NOTES}\n\n"
        + "\n".join(lines)
        + "\n"
    )
    open(BASELINE, "w").write(head + section)
    print(f"BASELINE.md: {bench['value']} s over {len(qs)} queries")


if __name__ == "__main__":
    main()
