"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at the
given scale factor, compares row count, column names, and
order-insensitive values. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

#: per-oracle DuckDB time budget (seconds): with 160+ registered queries
#: the driver's 50-query window cannot afford one slow oracle
ORACLE_BUDGET_S = 30.0


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(round(float(v), 9))
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def _live_spark_jvms() -> list[str]:
    """Other live Spark driver JVMs on this host (r15: the gate is
    solo-by-construction — the r14 full-registry sf1 run was kernel-
    OOM-killed while THREE 32-thread Spark JVMs shared the host; a
    truncated log with exit 0 is worse than refusing to start)."""
    import glob as _glob
    import os as _os

    hits = []
    for p in _glob.glob("/proc/[0-9]*/cmdline"):
        try:
            raw = open(p, "rb").read()
        except OSError:
            continue
        cmd = raw.replace(b"\0", b" ").decode(errors="replace")
        argv0 = cmd.split(" ", 1)[0]
        if argv0.rsplit("/", 1)[-1] == "java" and "org.apache.spark" in cmd:
            hits.append(f"pid {p.split('/')[2]}: ...{cmd[:160]}")
    return hits


def main():
    args = sys.argv[1:]
    resumed: set[str] = set()
    excluded: set[str] = set()
    force = False
    if "--force" in args:
        force = True
        args.remove("--force")
    jvms = _live_spark_jvms()
    if jvms and not force:
        print(
            "ERROR: refusing to start while other Spark JVMs are live on "
            "this host (full-registry gates need the machine to "
            "themselves — r14's sf1 run was kernel-OOM-killed by JVM "
            "contention). Wait for these to finish, or pass --force:"
        )
        for h in jvms:
            print(f"  {h}")
        sys.exit(3)
    # --resume <log>: skip queries already PASSed in a previous run's
    # log (full-registry runs at sf1 take hours and have been killed by
    # kernel OOM mid-run — r14; progress lives in the log, reuse it).
    # --exclude <name>: skip a query entirely (e.g. a gate whose CORRECT
    # output is too large to collect-and-hash at this scale — document
    # the exclusion in the round artifact).
    import re as _re

    while args and args[0] in ("--resume", "--exclude"):
        flag, val = args[0], args[1]
        args = args[2:]
        if flag == "--resume":
            for line in open(val):
                m = _re.match(r"PASS (\S+?):", line)
                if m:
                    resumed.add(m.group(1))
        else:
            excluded.add(val)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from __spark_entry__ import oracle_sql, queries
    from dd_graphdb_spark import get_spark

    spark = get_spark("oracle-check")
    qs, os_ = queries(), oracle_sql()

    con = duckdb.connect()
    import os as _os

    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        p = f"{sf_dir}/{t}.parquet"
        if _os.path.isdir(p):  # Spark-written dirs (.scale replicas)
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    unknown = only - qs.keys()
    if unknown:
        # a typo'd filter otherwise yields "0 pass, 0 fail" + exit 0 —
        # a false green from the correctness-gate replica
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)

    n_pass = n_fail = 0
    oracle_times: dict[str, tuple[float, float]] = {}
    vacuous: dict[str, str] = {}
    n_skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in resumed or name in excluded:
            n_skipped += 1
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {str(ex)[:300]}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in os_:
            if not srows:
                vacuous[name] = "0 rows (rows-only gate)"
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({t_spark:.1f}s)")
            continue
        t1 = time.time()
        try:
            ddf = con.execute(os_[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            n_fail += 1
            continue
        t_oracle = time.time() - t1
        oracle_times[name] = (t_spark, t_oracle)
        dcols = list(ddf.columns)
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duckdb={sorted(dcols)}")
            n_fail += 1
            continue
        drows = ddf.to_dict("records")
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            n_fail += 1
            continue
        cols = sorted(scols)
        s_norm = normalize(srows, cols)
        d_norm = normalize(drows, cols)
        if s_norm != d_norm:
            diffs = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
            continue
        # vacuity audit: two engines agreeing on NOTHING (0 rows), or on
        # a result with no variation (>1 identical rows), is not
        # correctness evidence — this class has been found by hand three
        # times (gql_with_passthrough, edges_between_lookup,
        # anti_join_customers_without_orders). Deliberate 1-row scalar
        # gates (db_stats, recall gates) are not flagged.
        if not s_norm:
            vacuous[name] = "0 rows"
        elif len(s_norm) > 1 and len(set(s_norm)) == 1:
            vacuous[name] = f"{len(s_norm)} identical rows"
        print(
            f"PASS {name}: {len(srows)} rows "
            f"(spark {t_spark:.1f}s, oracle {t_oracle:.1f}s)"
        )
        n_pass += 1
    if vacuous:
        print("\nWARNING: vacuous-looking green results (verify the query "
              "constrains anything at this sf):")
        for n, why in sorted(vacuous.items()):
            print(f"  {n}: {why}")
    slow = {n: t for n, t in oracle_times.items() if t[1] > ORACLE_BUDGET_S}
    if slow:
        # a single slow DuckDB oracle is a gate-latency/timeout hazard
        # (VERDICT r5: one 534s oracle nearly flaked the driver window)
        print(f"\nWARNING: oracles over the {ORACLE_BUDGET_S:.0f}s budget:")
        for n, (_, to) in sorted(slow.items(), key=lambda kv: -kv[1][1]):
            print(f"  {n}: {to:.1f}s")
    skipped = f", {n_skipped} skipped (resume/exclude)" if n_skipped else ""
    print(f"\n{n_pass} pass, {n_fail} fail{skipped}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
