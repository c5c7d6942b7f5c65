"""Condense a tools/check_oracles.py log into the per-round gate
artifact (ORACLE_GATE_{tag}_r{N}.json shape the judge reads).

Usage: python tools/gate_artifact.py <log> <metric> <round> [note] > out.json
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    log, metric, rnd = sys.argv[1], sys.argv[2], int(sys.argv[3])
    note = sys.argv[4] if len(sys.argv) > 4 else ""
    spark_t: dict[str, float] = {}
    oracle_t: dict[str, float] = {}
    fails: list[str] = []
    n_pass = 0
    vacuous = 0
    in_vacuous = False
    for line in open(log):
        m = re.match(
            r"PASS (\S+): \d+ rows \(spark ([\d.]+)s, oracle ([\d.]+)s\)", line
        )
        if m:
            n_pass += 1
            spark_t[m.group(1)] = float(m.group(2))
            oracle_t[m.group(1)] = float(m.group(3))
            continue
        if line.startswith("FAIL "):
            fails.append(line.split()[1].rstrip(":"))
            continue
        if line.startswith("WARNING: vacuous"):
            in_vacuous = True
            continue
        if in_vacuous:
            if line.startswith("  "):
                vacuous += 1
            else:
                in_vacuous = False
    top = lambda d, k: dict(sorted(d.items(), key=lambda kv: -kv[1])[:k])
    print(
        json.dumps(
            {
                "metric": metric,
                "round": rnd,
                "n_queries": n_pass + len(fails),
                "n_pass": n_pass,
                "n_fail": len(fails),
                "fails": fails,
                "vacuous_warnings": vacuous,
                "oracles_over_30s_budget": sum(
                    1 for t in oracle_t.values() if t > 30.0
                ),
                "slowest_spark_sec": top(spark_t, 10),
                "slowest_oracle_sec": top(oracle_t, 5),
                "note": note,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
