#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--strict-types]

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB with
views over <sfDir>/*.parquet, load the Spark result parquet, compare columns
(sorted by name), dtypes (loosely), and values (float rtol 1e-5 / atol 1e-8,
rows sorted).

--strict-types additionally compares the ARROW TYPES column by column and
fails on any divergence. The driver's gate hashes values exactly, so a type
that DuckDB silently widens (sum over INTEGER -> HUGEINT/decimal128, integer
division, count arithmetic) is a latent hash failure even when every value
matches loosely — q_sessionize burned round 6 on exactly this class. Pin the
oracle SQL with explicit casts until this mode is clean.
"""
import sys, os, json, glob, math

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files])


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, bytes):
        return v.hex()
    return v


def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-8 + 1e-5 * abs(b)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    try:
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return abs(float(a) - float(b)) <= 1e-8 + 1e-5 * abs(float(b))
    except Exception:
        pass
    return a == b


def type_mismatches(spark_tbl, duck):
    """Column-by-column arrow-type comparison. Timestamp/date representations
    that hash identically through the driver (both microsecond instants) are
    treated as equal; everything else must match exactly."""
    def canon(t):
        import re
        s = str(t)
        # spark writes timestamps as timestamp[us, tz=UTC] (session tz UTC);
        # duckdb arrow emits timestamp[us] — same instant, same hash
        s = s.replace(", tz=UTC", "")
        # arrow list FIELD names are serialization detail: spark writes
        # list<element: T>, duckdb emits list<l: T> — same type
        return re.sub(r"list<\w+:", "list<item:", s)
    out = []
    for c in spark_tbl.column_names:
        st = canon(spark_tbl.schema.field(c).type)
        dt = canon(duck.schema.field(c).type)
        if st != dt:
            out.append(f"{c}: spark={st} duck={dt}")
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    strict = "--strict-types" in sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    results = {}
    for name, sql in sorted(oracle.items()):
        spath = os.path.join(out_dir, name)
        spark_tbl = load_spark_result(spath)
        if spark_tbl is None:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            duck = con.sql(sql).arrow()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        scols, dcols = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if scols != dcols:
            results[name] = f"SCHEMA_MISMATCH: spark={scols} duck={dcols}"
            continue
        if spark_tbl.num_rows != duck.num_rows:
            results[name] = f"ROWCOUNT_MISMATCH: spark={spark_tbl.num_rows} duck={duck.num_rows}"
            continue
        def sort_key(r):
            # non-float columns first (queries always carry a deterministic
            # key), coarsely-rounded floats last — ulp noise can't reorder
            stable = tuple(str(x) for x in r if not isinstance(x, float))
            floats = tuple(f"{x:.2e}" for x in r if isinstance(x, float))
            return (stable, floats)
        srows = sorted((tuple(norm(row[c]) for c in scols)
                        for row in spark_tbl.to_pylist()), key=sort_key)
        drows = sorted((tuple(norm(row[c]) for c in dcols)
                        for row in duck.to_pylist()), key=sort_key)
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            if not all(eq(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr)
                break
        results[name] = "OK" if bad is None else f"VALUE_MISMATCH at sorted-row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}"
        if strict and results[name] == "OK":
            tm = type_mismatches(spark_tbl, duck)
            if tm:
                results[name] = "TYPE_MISMATCH: " + "; ".join(tm)
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, r in sorted(results.items()):
        mark = "PASS" if r == "OK" else "FAIL"
        print(f"[{mark}] {name}" + ("" if r == "OK" else f": {r}"))
    print(f"\n{n_ok}/{len(results)} queries match")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
