"""Regenerate BASELINE.md's standing per-query table from a bench JSON line.

Usage:
    python bench.py                            # run ALONE (JVM contention);
                                               # also writes BENCH_LOCAL.json
    python scripts/update_baseline.py BASELINE_STANDING.json [round-label]

BASELINE_STANDING.json is the committed source of the standing table (the
per-query min across marker-verified solo runs plus side-probe entries for
queries added after a re-record); edit it and re-run this script so
BASELINE.md stays exactly regenerable. Passing a raw BENCH_LOCAL.json
works too but replaces the whole table with that single run.

Replaces everything from the '## Standing per-query baseline' heading down;
the intro keeps the cross-round comparison notes.
"""

from __future__ import annotations

import json
import sys

BASELINE = "BASELINE.md"
HEADING = "## Standing per-query baseline"

INTRO_NOTES = """History: round 1 43.714 s over 36 queries; round 2 38.722 s
over 79 (biggest drops: `event_props_json` 6.75→0.45 s single JSON parse,
`repetition_stats` 3.89→0.41 s zero-shuffle fold, `dedup_minhash_lsh`
5.16→2.0 s 24/6 banding, `embedding_near_dup` 3.79→0.84 s distributed block
matmul). Round 4 re-record: the machine slowed ~1.8× uniformly between the
r2 and r4 measurements (every query shifted together, none algorithmically
regressed — isolated reruns confirm), so the standing table is re-measured
under current conditions to keep the driver's 2×-bar comparison meaningful.
Round 5 re-record: bench.py now times each query as the min of two full
executions (one-shot timing billed first-run codegen/analysis plus transient
GC/IO hiccups to whichever query hit them — r4's `returned_items_top20`
2.37× and `median_price_by_priority` 1.93× flags re-measured at baseline
steady-state on 5-rep solo probes; min-of-2 records plan cost), so the
standing table is re-measured under the same policy.
Round 7 re-record: seven r6 queries had no standing entry (the r6
contention window blocked recording them), ambient drifted ~1.25×
uniformly since the r5 table (untouched doc_token_stats/doc_rolling_hash
probed 1.0× vs TODAY's ambient, quality gate's r5-identical plan probed
0.71 s vs its 0.57 s entry), and the flat events_anomaly_zscore left the
headline set (bucketed variant promoted). bench.py now embeds
single/multi-thread contention markers (`marker_st`/`marker_mt`
[pre, post]) in every artifact; this table was recorded with both at
their fast values (st ~0.07-0.09 s, mt ~0.10-0.19 s on current BLAS).
Standing entries are the per-query MIN across TWO marker-verified solo
bench runs (69.3 s and 79.1 s totals): even min-of-2-within-a-run lets a
multi-second transient burst land on one query per run, and the burst
ROAMS between runs (run A: simhash_hamming_pairs 5.20 s / orders_cube
0.50 s; run B: 1.99 s / 4.09 s — each 5-rep-probe-confirmed transient,
steady-state at the lower value). The min-across-runs is the plan cost;
single future runs should expect 1-2 such outliers and read the markers
before believing any per-query flag. Four queries joined the headline
set after the re-record (`dedup_semantic_kmeans`, `paragraph_dedup_stats`,
`dsir_affinity_top64`, `bpe_merge_top32`); their entries are min-of-2
solo probes under the same policy (scale_probe.py session: warm tables,
noop sink), so single-run outlier expectations apply to them too.
Round 8 re-record: three queries joined the headline set
(`bpe_train_merges`, `doc_dup_spans_merged`, `dedup_semantic_hier` —
entries are min across two marker-verified solo runs, totals 76.72 s and
79.27 s with st 0.065-0.077 / mt 0.10-0.15), `dsir_affinity_top64`'s
entry was re-recorded from the same two runs because its implementation
changed (fused one-fold hash stream + aggregated checkpoint: sf0.1 pays
~0.2 s for a 4.32×→1.69×/decade scale-curve fix, SCALE.md), and every
other entry kept its historical min (ambient was ~1.0× vs the r7 table:
comparable-query total measured 69.0 s vs 70.5 s standing, zero per-query
flags over 1.3×).
Late-round-8 re-record: eleven queries joined the headline set
(`part_affinity_rules`, `doc_winnow_stats`, `winnow_dup_pairs`,
`copurchase_pagerank`, `part_copurchase_triangles`,
`dedup_containment_pairs`, `embedding_rp_stats`,
`purchase_prior_state_pit`, `bination_trade_volume`,
`part_affinity_triples`, `part_name_linkage`). Standing entries are the
per-query MIN across two fresh marker-verified solo runs (104.68 s
st [.066,.083] mt [.101,.129]; 106.39 s st [.062,.060] mt [.100,.087]),
the prior standing table for pre-existing queries (no old query's
implementation changed this session), and the min-of-2 solo
scale_probe.py sf0.1 values for the new queries. The usual 1-2 roaming
multi-second transients per run apply (doc_dup_span_stats 1.36× in one
fresh run, steady at its standing value in probes).
Second late-round-8 extension: the eight TPC-H Q4/Q6/Q9/Q11/Q12/Q13/
Q16/Q20 shapes (`priority_late_orders` … `top_share_suppliers`) joined
the headline set; their entries are the per-query MIN across two
marker-verified solo runs (119.59 s st [.074,.072] mt [.080,.112];
133.21 s st [.072,.077] mt [.095,.131]) with every pre-existing entry
kept at its historical min.
Round 9 extension: five queries joined the headline set — the four
round-9 additions (`png_profile_stats`, `dedup_clusters_star`,
`gif_decode_stats`, `user_value_theilsen`; per-query MIN across two
marker-verified solo runs, 149.54 s st [.076,.061] mt [.116,.103] and a
second run under the same policy) and `bmp_decode_stats` (min of its
first marker-verified solo bench value, 1.095 s at 145.01 s total
st [.083,.075] mt [.142,.212], and a 5-rep solo probe min 1.406 s).
Every pre-existing entry kept its historical min; that run's four
1.5–1.7× single-run flags (`sales_per_year`, `nation_rank_top2`,
`supplier_return_ratio`, `dedup_minhash_lsh`) all re-probed at or near
standing on warm-session min-of-2 (`dedup_minhash_lsh` remains the one
documented repeat-transient: 5-rep probes span 2.2–7.7 s around its
1.16 s plan-cost min with no plan change).
Second round-9 extension: five queries joined the headline set
(`tiff_decode_stats`, `adpcm_audio_stats`, `part_distance_sssp`,
`jpeg_exif_stats`, `avi_video_stats`), entries the per-query MIN across
two marker-bracketed solo 3-rep probe sessions (pre/post st
0.076–0.090 / mt 0.112–0.225; the two full bench runs attempted in
between landed in contended windows — mt 0.33–0.57 — and were
discarded per the repo's contention policy). `dedup_clusters_star`
re-recorded 6.535 → 4.418 s from the same sessions because its
implementation changed (shingle materialization + SHUFFLE_HASH
self-join + lazy CC checkpoints); `avi_video_stats`' entry reflects
its fixture-encode memoization. Every other entry kept its historical
min. The media transformer gates (`media_resize_stats` 1.23 s,
`video_frame_sample_stats` 3.168 s) joined under the same
min-across-two-probe-sessions policy. `user_value_theilsen`
re-recorded 3.307 → 3.705 s: its per-user point collection is now
bounded by a row_number window BEFORE the aggregation buffer (the
sf0.1 cost buys away an unbounded per-entity collect_list — the same
scale-over-bench-points tradeoff as DSIR's r8 re-record).
`ico_decode_stats` joined late (0.908 s, min across two marker-verified
probe sessions; 0.78×/decade). The round's closing marker-verified full
solo run (161.82 s / 157, st [.084,.062] mt [.173,.205], 1.09× the
then-standing table) lowered 23 entries to their new mins per the
min-across-runs policy — notably `dedup_clusters_star` 4.418 → 3.657 s
and `tiff_decode_stats` 3.972 → 3.250 s; its 17 sub-second 1.5–2.4×
single-run flags are the documented ambient scatter (every multi-second
query ran AT or BELOW standing in the same run)."""


def main() -> None:
    bench = json.load(open(sys.argv[1]))
    label = sys.argv[2] if len(sys.argv) > 2 else "round 4"
    qs = sorted(bench["queries"].items(), key=lambda kv: -kv[1])
    half = (len(qs) + 1) // 2
    lines = ["| query | sec | query | sec |", "|---|---|---|---|"]
    for i in range(half):
        left = qs[i]
        right = qs[i + half] if i + half < len(qs) else ("", "")
        rv = f"{right[1]}" if right[0] else ""
        lines.append(f"| {left[0]} | {left[1]} | {right[0]} | {rv} |")
    text = open(BASELINE).read()
    head, _, _ = text.partition(HEADING)
    section = (
        f"{HEADING} ({label}, sf={bench['sf']}, local[32])\n\n"
        f"Recorded wall-clock — **{bench['value']} s total over "
        f"{len(qs)}\nheadline queries**, solo run (no concurrent JVMs).\n\n"
        f"{INTRO_NOTES}\n\n"
        + "\n".join(lines)
        + "\n"
    )
    open(BASELINE, "w").write(head + section)
    print(f"BASELINE.md: {bench['value']} s over {len(qs)} queries ({label})")


if __name__ == "__main__":
    main()
