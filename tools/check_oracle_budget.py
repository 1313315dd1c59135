#!/usr/bin/env python3
"""check_oracle.py with a per-query wall-clock budget — the sf0.1 (and
larger) oracle sweeps: DuckDB replays most of the 179 oracle SQLs in
seconds at any SF, but a handful are quadratic BY CONSTRUCTION in the
oracle formulation (all-pairs cosine / levenshtein re-derivations whose
Spark implementations use banded candidate generation precisely to avoid
that shape), and at 600k-row scale those run for hours. This runner
interrupts any oracle exceeding the budget, records it as
SKIP(budget) — distinct from FAIL — and moves on, so one infeasible
replay cannot starve the other 170+ comparisons. The skipped keys keep
full hash coverage at the driver's verify SFs (sf0.001/sf0.01).

Usage: check_oracle_budget.py <sfDir> <verifyOutDir> [budgetSec]
         [alreadyPassedFile]
  budgetSec        per-query wall budget (default 600)
  alreadyPassedFile optional newline list of keys to skip as
                    already-verified in a prior partial run
"""
import json
import sys
import threading
import time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    return [tuple(repr(v) for v in row) for row in rows]


def main(sf_dir, out_dir, budget_s=600.0, done_file=None):
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
        timer = threading.Timer(budget_s, con.interrupt)
        timer.start()
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
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
            timer.cancel()
            # an interrupt can surface as a generic duckdb error too
            if "INTERRUPT" in str(e).upper():
                print(f"SKIP {name}: oracle exceeded {budget_s:.0f}s budget",
                      flush=True)
                skipped.append(name)
                n_skip += 1
            else:
                print(f"ERROR {name}: {e}", flush=True)
                n_fail += 1
        finally:
            timer.cancel()
    print(f"\n{n_pass} pass (+{n_prior} prior), {n_fail} fail, "
          f"{n_skip} skipped over budget: {skipped}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 600.0
    done = sys.argv[4] if len(sys.argv) > 4 else None
    sys.exit(main(sys.argv[1], sys.argv[2], budget, done))
