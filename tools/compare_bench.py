"""Compare two bench JSON records query-by-query.

Usage: python tools/compare_bench.py BASE.json NEW.json [expected_ratio]

Prints per-query raw ratios sorted descending, plus geomean. The
optional expected_ratio (e.g. 10 for an sf0.1 → sf1 comparison) marks
queries whose growth exceeds it — the super-linear suspects.
"""

from __future__ import annotations

import json
import math
import sys


def main():
    base = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    expected = float(sys.argv[3]) if len(sys.argv) > 3 else None
    bq, nq = base["queries"], new["queries"]
    common = sorted(set(bq) & set(nq))
    rows = []
    for q in common:
        if bq[q] <= 0:
            continue
        rows.append((nq[q] / bq[q], q, bq[q], nq[q]))
    rows.sort(reverse=True)
    logs = []
    for ratio, q, b, n in rows:
        flag = ""
        if expected is not None and ratio > expected:
            flag = f"  << >{expected:g}x"
        print(f"{ratio:8.2f}x  {q:35s} {b:8.2f}s -> {n:8.2f}s{flag}")
        logs.append(math.log(ratio))
    if logs:
        print(f"\ngeomean over {len(logs)} common queries: "
              f"{math.exp(sum(logs) / len(logs)):.2f}x")
    for tag in ("calibration_range_sum_2e8_sec", "calibration_lineitem_scan_sec"):
        print(f"{tag}: {base.get(tag)} -> {new.get(tag)}")
    print(f"total: {base['value']:.1f}s -> {new['value']:.1f}s")


if __name__ == "__main__":
    main()
