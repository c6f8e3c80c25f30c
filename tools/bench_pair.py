#!/usr/bin/env python3
"""Run-pair agreement stats over two BENCH_FULL-format records — the
health check BASELINE.md holds the harness to: two consecutive full
runs must agree per query up to documented noise.

Usage: python3 tools/bench_pair.py <runA.json> <runB.json>

Prints: common-query totals and delta, median per-query |A-B|/min,
the fraction of queries within 25 %, and every query outside the band
with both runs' recorded spreads (a move inside spreadA+spreadB is
measured VM noise).
"""
import json
import statistics
import sys


def load(p):
    d = json.load(open(p))
    out = {}
    out_sha = d.get("classes_sha")
    load.shas.append(out_sha)
    for k, v in d["queries"].items():
        if isinstance(v, dict):
            out[k] = (float(v["sec"]), float(v.get("spread_sec", 0)))
        else:
            out[k] = (float(v), 0.0)
    return out


load.shas = []


def main():
    a = load(sys.argv[1])
    b = load(sys.argv[2])
    # a pair is only meaningful on byte-identical code: round 12's pair
    # straddled an in-round plan fix, so one query's "regression" was a
    # code diff, not noise. Records carry an MD5 over every .class file.
    sa, sb = load.shas
    if sa and sb and sa != sb:
        print(f"REFUSING pair: classes_sha mismatch ({sa[:12]}... vs "
              f"{sb[:12]}...) — the two runs benched different code; "
              "re-run both from one classes snapshot")
        sys.exit(1)
    if not (sa and sb):
        print("warning: classes_sha missing from a record — cannot "
              "prove the pair benched identical code (pre-round-13 "
              "record?)")
    common = sorted(set(a) & set(b))
    ok = [k for k in common if a[k][0] >= 0 and b[k][0] >= 0]
    if not ok:
        print(f"no common successful queries ({len(common)} common, "
              f"{len(a)} in A, {len(b)} in B) — nothing to compare")
        return
    tot_a = sum(a[k][0] for k in ok)
    tot_b = sum(b[k][0] for k in ok)
    rel = {k: abs(a[k][0] - b[k][0]) / max(min(a[k][0], b[k][0]), 1e-9)
           for k in ok}
    med = statistics.median(rel.values())
    within = sum(1 for r in rel.values() if r <= 0.25) / len(ok)
    print(f"{len(ok)} common queries (of {len(common)}); totals "
          f"{tot_a:.1f}s vs {tot_b:.1f}s "
          f"({abs(tot_b - tot_a) / max(tot_a, 1e-9) * 100:.1f}% apart)")
    print(f"median per-query |A-B|/min: {med * 100:.1f}%")
    print(f"within 25%: {within * 100:.1f}%")
    outside = [(k, a[k], b[k]) for k in ok if rel[k] > 0.25]
    outside.sort(key=lambda x: -abs(x[1][0] - x[2][0]))
    for k, (av, asp), (bv, bsp) in outside:
        noise = "inside spreads" if abs(av - bv) <= asp + bsp \
            else "OUTSIDE spreads"
        print(f"  {k}: {av:.3f}s vs {bv:.3f}s "
              f"(spreads {asp:.3f}+{bsp:.3f}) {noise}")
    failed = [k for k in common if a[k][0] < 0 or b[k][0] < 0]
    if failed:
        print(f"FAILED in a run: {', '.join(failed)}")


if __name__ == "__main__":
    main()
