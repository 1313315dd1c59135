#!/usr/bin/env python3
"""Parallelism-invariance diff between two graft.Verify output dirs
(e.g. a local[1]/1-shuffle-partition run vs the default local[8] run):
for every query dumped in BOTH dirs, compare column names and the
ordered row values (the declared queries are deterministically ORDER
BY'd, so any layout-dependent arithmetic or ordering shows up as a
value/order mismatch).

Usage: python3 tools/diff_verify.py <outDirA> <outDirB>
"""
import os
import sys
import duckdb


def canon(rows):
    return [tuple(repr(v) for v in row) for row in rows]


def main(a_dir, b_dir):
    con = duckdb.connect()
    names = sorted(
        n for n in os.listdir(a_dir)
        if os.path.isdir(os.path.join(a_dir, n))
        and os.path.isdir(os.path.join(b_dir, n)))
    only_a = sorted(
        n for n in os.listdir(a_dir)
        if os.path.isdir(os.path.join(a_dir, n))
        and not os.path.isdir(os.path.join(b_dir, n)))
    only_b = sorted(
        n for n in os.listdir(b_dir)
        if os.path.isdir(os.path.join(b_dir, n))
        and not os.path.isdir(os.path.join(a_dir, n)))
    n_same = n_diff = 0
    if only_a or only_b:
        # a query dumped on one side only means that run crashed or
        # skipped it — that is a FAILED invariance check, not a warning
        print(f"DIFF asymmetric dumps: only_a={only_a} only_b={only_b}")
        n_diff += len(only_a) + len(only_b)
    for name in names:
        try:
            a = con.execute(
                f"SELECT * FROM read_parquet('{a_dir}/{name}/*.parquet')").df()
            b = con.execute(
                f"SELECT * FROM read_parquet('{b_dir}/{name}/*.parquet')").df()
            a = a[sorted(a.columns)]
            b = b[sorted(b.columns)]
            if list(a.columns) != list(b.columns):
                print(f"DIFF {name}: columns {list(a.columns)} != {list(b.columns)}")
                n_diff += 1
                continue
            if len(a) != len(b):
                print(f"DIFF {name}: rows {len(a)} != {len(b)}")
                n_diff += 1
                continue
            ca = canon(a.itertuples(index=False, name=None))
            cb = canon(b.itertuples(index=False, name=None))
            if ca != cb:
                bad = [i for i, (x, y) in enumerate(zip(ca, cb)) if x != y][:3]
                print(f"DIFF {name}: values at rows {bad}")
                for i in bad:
                    print(f"   a: {ca[i]}")
                    print(f"   b: {cb[i]}")
                n_diff += 1
                continue
            n_same += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_diff += 1
    print(f"\n{n_same} identical, {n_diff} different (of {len(names)})")
    return 1 if n_diff else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
