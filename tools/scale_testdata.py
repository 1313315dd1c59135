#!/usr/bin/env python3
"""Build a key-shifted N-fold copy of a testdata SF dir for scale
probes (driver-side tool, like check_oracle.py — not library code).

Each copy i shifts every entity key by i*OFFSET consistently across
fact/dim tables, so cardinalities scale with volume and referential
integrity holds; tiny dims (region, nation) stay single-copy. Text and
embeddings duplicate exactly — an adversarial-but-realistic shape for
the dedup families (every doc gains N-1 identical twins).

Usage: scale_testdata.py <src_sf_dir> <dst_dir> [copies=10] [--perturb-emb[=eps]]

--perturb-emb (round-14 verdict ask #2): embedding copies i>0 get
deterministic bounded multiplicative noise (component j of copy i is
x * (1 + eps*u), u = hash(vec_id, i, j)-derived in [-1, 1]) instead of
byte-identical clones. The exact-clone corpus is DEGENERATE for recall
measurement — the engine's exact-clone collapse serves clone edges by
identity, so recall reads 1.0 by construction above 2k vectors. With
eps = 0.25 the siblings sit at cos ~0.99: near-but-not-identical, so
LSH probing + NN-descent must actually FIND them, giving an honest
>=sf1 recall row. Only the embeddings table changes; every other
table keeps the default shape.
"""
import sys, os, duckdb

argv = [a for a in sys.argv[1:] if not a.startswith("--")]
flags = [a for a in sys.argv[1:] if a.startswith("--")]
src, dst = argv[0], argv[1]
copies = int(argv[2]) if len(argv) > 2 else 10
perturb_eps = None
for f in flags:
    if f.startswith("--perturb-emb"):
        perturb_eps = float(f.split("=")[1]) if "=" in f else 0.25
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
        def expr(c):
            if shift.get(c, False):
                return f"({c} + {i * OFF}) AS {c}"
            if (t == "embeddings" and c == "embedding"
                    and perturb_eps is not None and i > 0):
                # deterministic bounded noise per (vec_id, copy, dim)
                return (
                    f"list_transform(embedding, (x, j) -> (x * (1 + "
                    f"{perturb_eps} * (((hash(vec_id * 131071 + "
                    f"{i} * 524287 + j) % 2001)::BIGINT - 1000) / "
                    f"1000.0)))::FLOAT) AS embedding")
            return c
        exprs = ", ".join(expr(c) for c in cols)
        selects.append(f"SELECT {exprs} FROM '{p}'")
    con.sql(f"COPY ({' UNION ALL '.join(selects)}) TO '{dst}/{t}.parquet'")
    n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows ({copies} copies)")
print("done:", dst)
