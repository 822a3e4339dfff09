#!/usr/bin/env python3
"""DuckDB side of the graft-vs-DuckDB head-to-head.

Usage: python3 tools/headtohead.py <sfDir> <oracle_sql.json> [runs]

Times each oracle SQL in DuckDB (views over <sfDir>/*.parquet), warm: one
untimed run, then median of `runs` (default 3) timed runs — mirroring
Bench.scala's steady-state discipline. Prints one JSON line:
{"engine":"duckdb","sf":...,"total":...,"queries":{...}}.

Queries whose SQL reads staged parquet under /tmp/graft_stage (the LSH
restagings) are timed like any other — the staged files must exist, i.e. run
graft.Verify (sf0.01) / graft.Bench (sf0.1) first.
"""
import sys, os, json, time, statistics

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(oracle_path) as f:
        oracle = json.load(f)
    times, failed = {}, {}
    for name, sql in sorted(oracle.items()):
        try:
            con.sql(sql).fetchall()  # warm (footers, catalogs)
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                samples.append(time.perf_counter() - t0)
            times[name] = round(statistics.median(samples), 4)
        except Exception as e:
            failed[name] = str(e).split("\n")[0][:120]
    out = {"engine": "duckdb", "sf": sf_dir, "runs_per_query": runs,
           "n_queries": len(times), "total": round(sum(times.values()), 3),
           "queries": times}
    if failed:
        out["failed"] = failed
    print(json.dumps(out))


if __name__ == "__main__":
    main()
