"""sf0.1 -> sf1 growth table from the suite-wide artifacts.

Joins BENCH_full_sf1_r10.json (per-id sf1 medians, scripts/
bench_full_sf1.py) against an sf0.1 record bench (BENCH_full_r*.json)
and reports, per id, the growth ratio

    growth = sf1_median / (sf01_median * 10)

i.e. measured cost vs perfect data-linear scaling (sf1 carries 10x the
rows of sf0.1). growth <= 1 is at-or-better-than-linear; the flag
threshold is deliberately loose (default 1.5) because sub-second sf0.1
medians are dominated by fixed per-query overhead (plan + JVM dispatch,
~0.1-0.3 s) that does NOT scale with data — those ids mechanically show
growth << 1, and conversely an id moving 0.2 s -> 4 s may be fixed-cost
noise rather than a scan. Every flagged id needs an attributed reason
in BASELINE.md (re-measured isolated via bench_subset when in doubt).

Usage: python scripts/sf1_growth_report.py BENCH_full_sf1_r10.json \
           BENCH_full_r09_record.json [flag_ratio=1.5]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    sf1_path, sf01_path = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sf1 = json.load(open(sf1_path))
    sf01 = json.load(open(sf01_path))
    q1 = sf1["queries"]
    q0 = sf01["queries"]  # bench.py format: qid -> median seconds

    rows = []
    for qid, r in sorted(q1.items()):
        if qid not in q0:
            continue
        base = q0[qid]
        med = r["median"] if isinstance(r, dict) else r
        growth = med / (base * 10) if base > 0 else float("inf")
        rows.append((growth, qid, base, med))

    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > flag and r[3] > 1.0]
    print(f"# sf1 growth: {len(rows)} ids joined, "
          f"{len(flagged)} flagged (> {flag}x linear AND > 1 s at sf1)")
    print("| id | sf0.1 med | sf1 med | growth vs linear |")
    print("|---|---|---|---|")
    for g, qid, b, m in rows[:40]:
        mark = " **FLAG**" if (g > flag and m > 1.0) else ""
        print(f"| {qid} | {b:.3f} | {m:.3f} | {g:.2f}x{mark} |")
    print("\nmedian growth:",
          f"{sorted(r[0] for r in rows)[len(rows) // 2]:.2f}x")
    tot1 = sum(r[3] for r in rows)
    tot0 = sum(r[2] for r in rows)
    print(f"total (joined ids): sf0.1 {tot0:.1f}s -> sf1 {tot1:.1f}s "
          f"= {tot1 / (tot0 * 10):.2f}x of linear")


if __name__ == "__main__":
    main()
