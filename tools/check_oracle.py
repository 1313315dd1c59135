#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate: read each
Verify.scala parquet dump, run the matching oracle SQL in DuckDB over the
same testdata parquet, and compare (schema column names, row count, and
exact values after sorting columns by name).

Optional per-query budget (for sf0.1+ sweeps): most of the 179 oracle
SQLs replay in seconds at any SF, but a handful are quadratic BY
CONSTRUCTION in the oracle formulation (all-pairs cosine / levenshtein
re-derivations whose Spark implementations use banded candidate
generation precisely to avoid that shape), and at 600k-row scale those
run for hours. With a budget set, the ORACLE SQL execution (not the
read of Spark's own dump) is interrupted past the budget and recorded
as SKIP — distinct from FAIL — so one infeasible replay cannot starve
the rest; skipped keys keep full hash coverage at the driver's verify
SFs. An optional done-file (newline-separated keys) resumes a partial
run.

Usage: check_oracle.py <sfDir> <verifyOutDir> [budgetSec] [doneFile]
"""
import json
import sys
import threading
import time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        out.append(tuple(repr(v) for v in row))
    return out


def main(sf_dir, out_dir, budget_s=None, done_file=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    done = set()
    if done_file:
        done = {l.strip() for l in open(done_file) if l.strip()}
    n_pass = n_fail = n_skip = n_prior = 0
    skipped = []
    for name, sql in sorted(oracle.items()):
        if name in done:
            n_prior += 1
            continue
        t0 = time.time()
        try:
            # Spark's own dump is read UNBUDGETED — the budget bounds
            # the oracle replay, not the harness's input
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            timer = None
            if budget_s:
                timer = threading.Timer(budget_s, con.interrupt)
                timer.start()
            try:
                want = con.execute(sql).df()
            finally:
                if timer:
                    timer.cancel()
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}",
                      flush=True)
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}", flush=True)
                n_fail += 1
                continue
            g = canon(got.itertuples(index=False, name=None))
            w = canon(want.itertuples(index=False, name=None))
            if g != w:
                bad = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
                print(f"FAIL {name}: value mismatch at rows {bad}", flush=True)
                for i in bad:
                    print(f"   spark : {g[i]}")
                    print(f"   duckdb: {w[i]}")
                n_fail += 1
                continue
            print(f"PASS {name} ({len(got)} rows, {time.time()-t0:.1f}s)",
                  flush=True)
            n_pass += 1
        except duckdb.InterruptException:
            print(f"SKIP {name}: oracle exceeded {budget_s:.0f}s budget",
                  flush=True)
            skipped.append(name)
            n_skip += 1
        except Exception as e:
            # a timer interrupt can surface as a generic duckdb error
            if budget_s and "INTERRUPT" in str(e).upper():
                print(f"SKIP {name}: oracle exceeded {budget_s:.0f}s budget",
                      flush=True)
                skipped.append(name)
                n_skip += 1
            else:
                print(f"ERROR {name}: {e}", flush=True)
                n_fail += 1
    tail = f", {n_skip} skipped over budget: {skipped}" if budget_s else ""
    prior = f" (+{n_prior} prior)" if done_file else ""
    print(f"\n{n_pass} pass{prior}, {n_fail} fail{tail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else None
    done = sys.argv[4] if len(sys.argv) > 4 else None
    sys.exit(main(sys.argv[1], sys.argv[2], budget, done))
