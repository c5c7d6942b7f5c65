"""Dump .explain('formatted') for bench queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plan.py <sf_dir> <tag>/<suffix> <query> [query...]

e.g. python tools/dump_plan.py /root/testdata/sf0.1 r15/before dedup_semantic_cells

Plan capture only — builds the DataFrame the way bench.py does and
writes the formatted physical plan; the query is not executed (mutation
gates still run their store writes at build time, as in any harness).
Diagnostic tooling, not part of the driver contract.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    sf_dir = sys.argv[1]
    tag, suffix = sys.argv[2].split("/", 1)
    names = sys.argv[3:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from dd_graphdb_spark import get_spark
    from dd_graphdb_spark.suites import all_queries

    spark = get_spark("dump-plan")
    qs, _ = all_queries(hygiene=False)
    outdir = os.path.join(repo, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
