#!/usr/bin/env python3
"""Interleaved graft-vs-DuckDB matched pairs (round-15 stretch directive).

The day-level pair history swings (r14: 1.18x-1.33x in one day; r13 quiet
0.91x) because each engine's FULL sweep samples a different ambient window.
This runner alternates CHUNKS — graft chunk 1 (one JVM via the exported
classpath), DuckDB chunk 1, graft chunk 2, ... — so each pair of per-query
medians shares a ~2-minute window, and reports the per-query ratio
distribution instead of a single cross-window total.

Usage: python3 tools/interleaved.py [sfDir] [chunks] [runs]
Writes BENCH_PAIRED.json: {"chunks":N, "total_graft":..., "total_duck":...,
"ratio_median":..., "ratio_p25":..., "ratio_p75":..., "queries":{name:
{"graft":s,"duck":s,"ratio":r}}}.

Prereq: staged rows exist for sfDir (run Verify/Bench there first);
serialize with anything else touching the same SF (staging contention).
"""
import json, os, statistics, subprocess, sys, time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CHUNKS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
RUNS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def classpath():
    cp_file = "/tmp/graft_cp.txt"
    if not os.path.exists(cp_file):
        out = subprocess.run(
            ["sbt", "-error", "export Compile/fullClasspath"],
            capture_output=True, text=True, cwd="/root/repo").stdout
        cp = [l for l in out.splitlines() if "/" in l][-1].strip()
        with open(cp_file, "w") as f:
            f.write(cp)
    return open(cp_file).read().strip()


def graft_chunk(names, cp):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=SF, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_RUNS=str(RUNS),
               SPARK_GRAFT_ONLY=",".join(names))
    out = subprocess.run(
        ["java", "-Xmx100g", "-cp", cp, "graft.Bench"],
        capture_output=True, text=True, env=env, cwd="/root/repo").stdout
    line = [l for l in out.splitlines() if l.startswith('{"metric"')][-1]
    return json.loads(line)["queries"]


def main():
    cp = classpath()
    oracle = json.load(open("/tmp/verify_out/oracle_sql.json")) \
        if os.path.exists("/tmp/verify_out/oracle_sql.json") else None
    if oracle is None:
        sys.exit("run graft.Verify first to dump oracle_sql.json")
    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    names = sorted(oracle.keys())
    size = (len(names) + CHUNKS - 1) // CHUNKS
    chunks = [names[i:i + size] for i in range(0, len(names), size)]
    g_times, d_times = {}, {}
    for i, chunk in enumerate(chunks):
        print(f"[chunk {i + 1}/{len(chunks)}] graft {len(chunk)}q ...",
              flush=True)
        g_times.update(graft_chunk(chunk, cp))
        print(f"[chunk {i + 1}/{len(chunks)}] duckdb ...", flush=True)
        for name in chunk:
            sql = oracle[name]
            try:
                con.sql(sql).fetchall()
                samples = []
                for _ in range(RUNS):
                    t0 = time.perf_counter()
                    con.sql(sql).fetchall()
                    samples.append(time.perf_counter() - t0)
                d_times[name] = round(statistics.median(samples), 4)
            except Exception as e:
                print(f"  duck FAIL {name}: {str(e)[:100]}", flush=True)

    paired = {n: {"graft": g_times[n], "duck": d_times[n],
                  "ratio": round(g_times[n] / d_times[n], 3)
                  if d_times[n] > 0 else None}
              for n in names if n in g_times and n in d_times}
    ratios = sorted(v["ratio"] for v in paired.values() if v["ratio"])
    out = {"sf": SF, "chunks": len(chunks), "runs_per_query": RUNS,
           "n_paired": len(paired),
           "total_graft": round(sum(v["graft"] for v in paired.values()), 2),
           "total_duck": round(sum(v["duck"] for v in paired.values()), 2),
           "ratio_median": ratios[len(ratios) // 2],
           "ratio_p25": ratios[len(ratios) // 4],
           "ratio_p75": ratios[3 * len(ratios) // 4],
           "queries": paired}
    with open("BENCH_PAIRED.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))


if __name__ == "__main__":
    main()
