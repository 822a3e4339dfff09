#!/usr/bin/env python3
"""Zipfian-skew variant of the 10x scale probe (round-15 directive #2).

tools/scale10.py unions sf0.1 with SHIFTED keys, so every key keeps the
uniform sf0.1 frequency; real corpora are zipfian. This derives
/tmp/scale10_skew from /tmp/scale10 at IDENTICAL volume but with hot keys,
so (skew time) / (uniform time) isolates the distribution effect:

  - lineitem: one hot l_orderkey owning ~20% of rows (skewed shuffle join
    for q_salted_join), and l_returnflag collapsed to ~80% 'N' (hot group
    for q_quantile_modes / hot window partition for q_rank_window);
  - orders:   one hot o_custkey owning ~20% of rows (q_join_agg's
    orders-customer shuffle join);
  - events:   ~20% of events collapsed into ONE wall-clock hour (hot
    group_by_dynamic bucket for q_gbd_*);
  - documents: a ~2k-doc near-identical boilerplate cluster (17 one-token
    variants), the hot-LSH-band case for q_minhash_pairs — its candidate
    output is QUADRATIC in the cluster by definition (all-pairs semantics),
    so the cluster is sized to stress, not to blow up the result set.

All remaps are deterministic (key arithmetic, no random()) so reruns probe
the same distribution. Never committed as test data; outputs live in /tmp.

Usage: python3 tools/skew10.py [src] [out]
"""
import os, shutil, sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10_skew"

COPY = ["region", "nation", "customer", "supplier", "part", "embeddings"]


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in COPY:
        shutil.copy(os.path.join(SRC, f"{t}.parquet"), os.path.join(OUT, f"{t}.parquet"))

    def build(table, sql):
        con.sql(f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    hot_okey = con.sql(f"SELECT min(l_orderkey) FROM '{SRC}/lineitem.parquet'").fetchone()[0]
    build("lineitem", f"""
        SELECT CASE WHEN l_orderkey % 5 = 3 THEN {hot_okey} ELSE l_orderkey END AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax,
               CASE WHEN (l_orderkey + l_linenumber) % 10 < 6 THEN 'N' ELSE l_returnflag END
                 AS l_returnflag,
               l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet'""")

    hot_ck = con.sql(f"SELECT min(o_custkey) FROM '{SRC}/orders.parquet'").fetchone()[0]
    build("orders", f"""
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 3 THEN {hot_ck} ELSE o_custkey END AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet'""")

    t0 = con.sql(f"SELECT min(ts) FROM '{SRC}/events.parquet'").fetchone()[0]
    build("events", f"""
        SELECT event_id,
               CASE WHEN event_id % 5 = 3
                    THEN TIMESTAMP '{t0}' + (event_id % 3600) * INTERVAL 1 SECOND
                    ELSE ts END AS ts,
               user_id, event_type, value, props
        FROM '{SRC}/events.parquet'""")

    build("documents", f"""
        SELECT doc_id,
               CASE WHEN doc_id % 25 = 7
                    THEN 'shared boilerplate page variant ' || (doc_id % 17)::VARCHAR ||
                         ' all rights reserved terms of service apply to every visitor' ||
                         ' of this website contact support for assistance thank you'
                    ELSE text END AS text,
               lang, source, n_chars
        FROM '{SRC}/documents.parquet'""")


if __name__ == "__main__":
    main()
