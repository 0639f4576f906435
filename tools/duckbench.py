#!/usr/bin/env python3
"""DuckDB side of the graft-vs-DuckDB pair (PERF.md methodology):
run every oracle SQL from a graft.Verify dump against the same parquet
tables, 32 threads, N sequential passes, report per-query MIN across
passes and their sum — the same discipline Bench applies to graft.

Usage: python3 tools/duckbench.py <sfDir> <verifyOutDir> [passes=3] [query ...]
(DUCK_MEM bounds the buffer pool — at sf1 the unbounded default let one
heavy oracle starve the rest; spill goes to a per-process temp dir.)
"""
import json, os, sys, tempfile, time

import duckdb


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    try:
        passes = int(rest[0]) if rest else 3
        only = set(rest[1:])
    except ValueError:
        # a query name in the passes slot: default passes, filter on all
        passes, only = 3, set(rest)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    # unique auto-named spill dir, removed on exit (no stale /tmp spill)
    spill = tempfile.TemporaryDirectory(prefix="duck_spill_")
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('DUCK_THREADS', '32')}")
    con.execute(f"SET memory_limit TO '{os.environ.get('DUCK_MEM', '48GB')}'")
    con.execute(f"SET temp_directory TO '{spill.name}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    load0 = os.getloadavg()[0]
    best = {}
    for p in range(passes):
        for name, sql in sorted(oracle.items()):
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                best[name] = -1.0
                print(f"FAIL {name}: {e}", file=sys.stderr)
                continue
            dt = time.monotonic() - t0
            if best.get(name, -1.0) >= 0:
                best[name] = min(best.get(name, dt), dt)
            elif name not in best:
                best[name] = dt
    load1 = os.getloadavg()[0]
    ok = {k: v for k, v in best.items() if v >= 0}
    slowest = dict(sorted(ok.items(), key=lambda kv: -kv[1])[:12])
    print(json.dumps({
        "metric": "duckdb_oracle_total_minpass",
        "value": round(sum(ok.values()), 3),
        "unit": "sec",
        "n_queries": len(ok),
        "n_failed": len(best) - len(ok),
        "passes": passes,
        "loadavg": [round(load0, 1), round(load1, 1)],
        "slowest": {k: round(v, 3) for k, v in slowest.items()},
        "sf": sf_dir,
    }))


if __name__ == "__main__":
    main()
