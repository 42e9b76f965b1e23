#!/usr/bin/env python3
"""Per-query scaling exponents between the committed sf0.1 bench detail and
an sf1 (10x) detail run: exp = log10(t_sf1 / t_sf0.1) per decade of data.
Queries still in the overhead-dominated regime (both samples under the floor)
are reported separately — a ratio between two fixed-overhead samples is not
a scaling measurement.

Usage: tools/sf1_exponents.py BENCH_DETAIL_sf0.1.json BENCH_DETAIL_sf1.json
"""
import json
import math
import sys

FLOOR_SEC = 1.0  # below this on BOTH sides, overhead dominates

def main() -> None:
    base = json.load(open(sys.argv[1]))
    sf1 = json.load(open(sys.argv[2]))
    b, s = base["queries_steady"], sf1["queries_steady"]
    common = sorted(set(b) & set(s))
    scaled, overhead = [], []
    for q in common:
        t0, t1 = b[q], s[q]
        exp = math.log10(max(t1, 1e-3) / max(t0, 1e-3))
        if t0 < FLOOR_SEC and t1 < FLOOR_SEC:
            overhead.append((q, t0, t1))
        else:
            scaled.append((exp, q, t0, t1))
    scaled.sort(reverse=True)
    print(f"{len(common)} common queries; {len(overhead)} overhead-dominated "
          f"(<{FLOOR_SEC}s at both scales), {len(scaled)} measurable\n")
    print(f"{'query':<28} {'sf0.1':>8} {'sf1':>8} {'exp/decade':>10}")
    for exp, q, t0, t1 in scaled:
        print(f"{q:<28} {t0:>8.3f} {t1:>8.3f} {exp:>10.2f}")
    tot0 = sum(b[q] for q in common)
    tot1 = sum(s[q] for q in common)
    print(f"\nsteady totals over common queries: {tot0:.1f}s -> {tot1:.1f}s "
          f"(x{tot1 / tot0:.2f}, exponent {math.log10(tot1 / tot0):.2f}/decade)")

if __name__ == "__main__":
    main()
