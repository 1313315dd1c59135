#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate: read each
Verify.scala parquet dump, run the matching oracle SQL in DuckDB over the
same testdata parquet, and compare (schema column names, row count, and
exact values after sorting columns by name).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        out.append(tuple(repr(v) for v in row))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                n_fail += 1
                continue
            g = canon(got.itertuples(index=False, name=None))
            w = canon(want.itertuples(index=False, name=None))
            if g != w:
                bad = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
                print(f"FAIL {name}: value mismatch at rows {bad}")
                for i in bad:
                    print(f"   spark : {g[i]}")
                    print(f"   duckdb: {w[i]}")
                n_fail += 1
                continue
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
