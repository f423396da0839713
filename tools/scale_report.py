#!/usr/bin/env python3
"""Compose a scale-proof report from two BENCH_full.json files.

Usage: python3 tools/scale_report.py <base_full.json> <scale_full.json> <out.json>

Failures are FIRST-CLASS: every query that recorded -1 at either SF is
named in an explicit `failures` list per column AND surfaced in the
headline — never silently folded out of totals (the round-10 report
recorded q_ch_bits/q_ch_ip as -1 in per_query only, and the headline
claimed "no superlinear query" while two queries were missing).
"""
import json
import sys


def main():
    base_p, scale_p, out_p = sys.argv[1:4]
    base = json.load(open(base_p))
    scale = json.load(open(scale_p))
    bq, sq = base["queries"], scale["queries"]
    shared = sorted(set(bq) & set(sq))
    b_fail = sorted([q for q in shared if bq[q] < 0])
    s_fail = sorted([q for q in shared if sq[q] < 0])
    ok = [q for q in shared if bq[q] >= 0 and sq[q] >= 0]
    b_total = round(sum(bq[q] for q in ok), 2)
    s_total = round(sum(sq[q] for q in ok), 2)
    ratios = {
        q: round(sq[q] / max(bq[q], 0.05), 2)
        for q in ok
    }
    # superlinear = grew faster than the 10x data AND is expensive
    # enough for the ratio to be signal rather than job-overhead noise
    superlinear = {
        q: {"base_sec": round(bq[q], 2), "scale_sec": round(sq[q], 2),
            "ratio": ratios[q]}
        for q in ok if ratios[q] > 10.0 and sq[q] > 3.0
    }
    iterative = {
        q: {"base_sec": round(bq[q], 2), "scale_sec": round(sq[q], 2),
            "ratio": ratios[q]}
        for q in ("dedup_clusters", "dedup_incremental", "ann_ivf",
                  "ann_pq", "pipeline_clean") if q in ok
    }
    slowest = dict(sorted(
        ((q, round(sq[q], 2)) for q in ok),
        key=lambda kv: -kv[1])[:10])
    report = {
        "metric": "scale_proof",
        "data": "scale SF = tools/ScaleData.scala replicate of the base "
                "SF x10 (key offsets; documents word-salted per copy, "
                "embeddings rotated per copy, so duplicate density stays "
                "constant as SF grows)",
        "machine": "local[32], shared box, run-to-run noise +/-40%",
        "headline": {
            "queries_compared": len(ok),
            "failures_base": b_fail,
            "failures_scale": s_fail,
            "base_total_sec": b_total,
            "scale_total_sec": s_total,
            "total_ratio_for_10x_data":
                round(s_total / b_total, 2) if b_total else None,
        },
        "superlinear_over_3s": superlinear,
        "iterative_shapes": iterative,
        "slowest_at_scale": slowest,
        "per_query_ratio": ratios,
        "per_query_base_sec": {q: round(bq[q], 3) for q in shared},
        "per_query_scale_sec": {q: round(sq[q], 3) for q in shared},
    }
    with open(out_p, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[scale_report] {out_p}: {len(ok)} queries, "
          f"base {b_total}s -> scale {s_total}s "
          f"(x{report['headline']['total_ratio_for_10x_data']}), "
          f"failures base={b_fail} scale={s_fail}, "
          f"superlinear>3s={sorted(superlinear)}")


if __name__ == "__main__":
    main()
