#!/usr/bin/env python3
"""Build a one-off ~10x fact-table scale probe under /tmp/scale10 (never
committed): union each FACT table 10 times with shifted keys (timestamps
shifted per replica so temporal windows stay dense, document text lightly
perturbed per replica so the near-dup structure amplifies without becoming
pure exact duplication), dims copied as-is — so FK joins fan out 10x per
dim row, the realistic direction of growth.

Usage: python3 tools/scale10.py [outdir] [replicas]
"""
import os, shutil, sys

import duckdb

SF = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10

DIMS = ["region", "nation", "customer", "supplier", "part"]


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        shutil.copy(os.path.join(SF, f"{t}.parquet"), os.path.join(OUT, f"{t}.parquet"))

    def rep(table, select_tpl):
        parts = [select_tpl.format(i=i, src=f"'{SF}/{table}.parquet'") for i in range(R)]
        sql = " UNION ALL ".join(parts)
        con.sql(f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    # orderkeys shift consistently across orders/lineitem so the join keeps
    # its 1:N structure; custkey/partkey/suppkey stay (10x fan-out per dim)
    okey = con.sql(f"SELECT max(o_orderkey)+1 FROM '{SF}/orders.parquet'").fetchone()[0]
    rep("orders",
        "SELECT o_orderkey + {i}*" + str(okey) + " AS o_orderkey, o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate + INTERVAL ({i}) MINUTE AS o_orderdate, o_orderpriority "
        "FROM {src}")
    rep("lineitem",
        "SELECT l_orderkey + {i}*" + str(okey) + " AS l_orderkey, l_partkey, l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        "l_linestatus, l_shipdate FROM {src}")
    ekey = con.sql(f"SELECT max(event_id)+1 FROM '{SF}/events.parquet'").fetchone()[0]
    rep("events",
        "SELECT event_id + {i}*" + str(ekey) + " AS event_id, "
        "ts + INTERVAL ({i}) SECOND AS ts, user_id, event_type, value, props FROM {src}")
    dkey = con.sql(f"SELECT max(doc_id)+1 FROM '{SF}/documents.parquet'").fetchone()[0]
    rep("documents",
        "SELECT doc_id + {i}*" + str(dkey) + " AS doc_id, "
        "CASE WHEN {i} = 0 THEN text ELSE text || ' r{i}' END AS text, "
        "lang, source, n_chars FROM {src}")
    vkey = con.sql(f"SELECT max(vec_id)+1 FROM '{SF}/embeddings.parquet'").fetchone()[0]
    rep("embeddings",
        "SELECT vec_id + {i}*" + str(vkey) + " AS vec_id, embedding, label FROM {src}")


if __name__ == "__main__":
    main()
