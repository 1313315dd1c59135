#!/usr/bin/env python3
"""Build a key-shifted N-fold copy of a testdata SF dir for scale
probes (driver-side tool, like check_oracle.py — not library code).

Each copy i shifts every entity key by i*OFFSET consistently across
fact/dim tables, so cardinalities scale with volume and referential
integrity holds; tiny dims (region, nation) stay single-copy. Text and
embeddings duplicate exactly — an adversarial-but-realistic shape for
the dedup families (every doc gains N-1 identical twins).

Usage: scale_testdata.py <src_sf_dir> <dst_dir> [copies=10]
"""
import sys, os, duckdb

src, dst = sys.argv[1], sys.argv[2]
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10**8
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

# (table, [key columns to shift])
SHIFTED = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey", "c_nationkey=0"],  # =0: do not shift
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE = ["region", "nation"]

for t in SINGLE:
    p = f"{src}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"COPY (SELECT * FROM '{p}') TO '{dst}/{t}.parquet'")
        print(f"{t}: single copy")

for t, keys in SHIFTED.items():
    p = f"{src}/{t}.parquet"
    if not os.path.exists(p):
        continue
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{p}'").fetchall()]
    shift = {k.split("=")[0]: not k.endswith("=0") for k in keys}
    selects = []
    for i in range(copies):
        exprs = ", ".join(
            f"({c} + {i * OFF}) AS {c}" if shift.get(c, False) else c
            for c in cols)
        selects.append(f"SELECT {exprs} FROM '{p}'")
    con.sql(f"COPY ({' UNION ALL '.join(selects)}) TO '{dst}/{t}.parquet'")
    n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows ({copies} copies)")
print("done:", dst)
