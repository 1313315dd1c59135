#!/usr/bin/env python3
"""Total-order lint over a graft.Verify dump dir (driver-side tool).

The driver's correctness compare is strictly ROW-ORDERED: Spark's dump
and the DuckDB oracle replay are canonicalized column-wise and then
compared row i vs row i. A query whose ORDER BY is not a TOTAL order
on its output therefore only passes while both engines happen to break
ties the same way — round 12's sf1 probe caught three such latent
flakes (computed_column, join_view_flat and the probe-corpus shapes)
where tie groups carried DIFFERENT values in the non-sorted columns.

This lint closes the class structurally instead of waiting for a tie
to flip: for every key in `oracle_sql.json` it parses the trailing
ORDER BY column list and asks DuckDB whether the dump contains a tie
group (same sort-key tuple) whose full rows are NOT value-identical.
Identical full-row ties are fine — any permutation of them is the same
canonical row sequence; differing ties are exactly the
order-dependent shapes the compare can't pin.

Also flagged: a multi-row dump whose oracle has no ORDER BY at all,
and (reported separately) ORDER BY ... LIMIT queries, where a tie AT
THE BOUNDARY lives in the rows the dump no longer contains — those are
re-checked against the oracle's own unlimited prefix when feasible.

Usage: lint_total_order.py <verifyOutDir> [sfDir]
  sfDir enables the LIMIT-boundary re-check (runs each LIMIT query's
  oracle without the LIMIT to inspect the boundary tie group).
"""
import json
import os
import re
import sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def split_top_level(s):
    """Split on commas not inside parens/quotes."""
    out, depth, cur, q = [], 0, [], None
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def depth0_spans(sql, word):
    """Start offsets of `word` at paren depth 0 (word-bounded).

    Quote-aware like split_top_level: parens (or the keyword itself)
    inside a SQL string literal are skipped, otherwise an unbalanced
    paren in a literal permanently desynchronizes the depth counter and
    the FINAL order-by/limit can be misidentified (round-12 advice)."""
    spans = []
    depth = 0
    for m in re.finditer(r"'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"|[()]|\b" +
                         word + r"\b", sql, re.I):
        tok = m.group(0)
        if tok[0] in "'\"":
            continue
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            spans.append(m.start())
    return spans


def order_by_exprs(sql):
    """The last DEPTH-0 ORDER BY's expression list (sans direction
    modifiers), or None. Returns (exprs, final_limit_match): the
    latter is the re.Match of a depth-0 `LIMIT n` governing the final
    output, or None — inner ORDER BY/LIMIT pairs (CTE pages, sampled
    subqueries) order intermediate relations, not the dump."""
    # strip line comments so a commented ORDER BY can't confuse us
    sql = re.sub(r"--[^\n]*", " ", sql)
    ob = depth0_spans(sql, r"ORDER\s+BY")
    lim = None
    for s in depth0_spans(sql, r"LIMIT\s+\d+"):
        lim = re.match(r"LIMIT\s+\d+", sql[s:], re.I)
        lim = (s, s + lim.end())
    if not ob:
        return None, lim
    tail = sql[ob[-1]:]
    tail = tail[re.match(r"ORDER\s+BY", tail, re.I).end():]
    # cut the expression list at a depth-0 LIMIT/OFFSET or dangling ')'
    depth = 0
    end = len(tail)
    for m in re.finditer(r"[()]|\b(?:LIMIT|OFFSET)\b", tail, re.I):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
            if depth < 0:
                end = m.start()
                break
        else:
            end = m.start()
            break
    exprs = []
    for e in split_top_level(tail[:end]):
        e = re.sub(r"\s+(ASC|DESC)\b", "", e, flags=re.I)
        e = re.sub(r"\s+NULLS\s+(FIRST|LAST)\b", "", e, flags=re.I)
        exprs.append(e.strip())
    return [e for e in exprs if e], lim


def main(out_dir, sf_dir=None):
    con = duckdb.connect()
    if sf_dir:
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * "
                            f"FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_total = n_flag = n_limit = 0
    for name, sql in sorted(oracle.items()):
        dump = f"{out_dir}/{name}"
        if not os.path.isdir(dump):
            continue
        n_total += 1
        exprs, final_limit = order_by_exprs(sql)
        rel = f"read_parquet('{dump}/*.parquet')"
        nrows = con.execute(f"SELECT count(*) FROM {rel}").fetchone()[0]
        if exprs is None:
            if nrows > 1:
                print(f"FLAG {name}: {nrows} rows, oracle has no final "
                      f"ORDER BY")
                n_flag += 1
            continue
        # positional refs (ORDER BY 1) -> dump column names in order;
        # alias-qualified refs (p.change_version) -> bare name when the
        # dump carries it (the dump's schema is unqualified)
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM {rel}").fetchall()]
        keys = []
        for e in exprs:
            if e.isdigit():
                keys.append(f'"{cols[int(e) - 1]}"')
                continue
            m = re.fullmatch(r"(\w+)\.(\w+)", e)
            if m and m.group(2) in cols and e not in cols:
                e = m.group(2)
            keys.append(e)
        klist = ", ".join(keys)
        if nrows <= 1:
            continue  # order of one row is vacuously total
        # NULL-ordering hazard: Spark sorts ASC NULLS FIRST, DuckDB
        # defaults ASC NULLS LAST — a NULL in any final sort key makes
        # the ordered compare engine-dependent unless the oracle spells
        # NULLS FIRST/LAST to match
        try:
            n_null = con.execute(
                f"SELECT count(*) FROM {rel} WHERE " +
                " OR ".join(f"({k}) IS NULL" for k in keys)).fetchone()[0]
            if n_null and not re.search(r"NULLS\s+(FIRST|LAST)", sql, re.I):
                print(f"FLAG {name}: {n_null} rows with NULL in sort keys "
                      f"({klist}) and no explicit NULLS ordering — "
                      f"Spark/DuckDB default tie order differs")
                n_flag += 1
        except Exception:
            pass  # unevaluable keys already reported by the tie check
        # a tie group whose member rows differ anywhere = order-dependent
        try:
            bad = con.execute(
                f"SELECT count(*) FROM (SELECT {klist} FROM {rel} t "
                f"GROUP BY {klist} HAVING min(hash(t)) <> max(hash(t)))"
            ).fetchone()[0]
        except Exception as e:
            print(f"ERR  {name}: sort keys {exprs} not evaluable on the "
                  f"dump ({str(e).splitlines()[0]})")
            n_flag += 1
            continue
        if bad:
            print(f"FLAG {name}: {bad} tie group(s) on ({klist}) with "
                  f"non-identical rows — dump order is tie-dependent")
            n_flag += 1
        if final_limit:
            n_limit += 1
            if not sf_dir:
                print(f"NOTE {name}: ORDER BY + LIMIT (boundary tie not "
                      f"checkable without sfDir)")
                continue
            # boundary check, order-free: a sort-key tuple that appears
            # in the UNLIMITED oracle result MORE times than in the
            # dump, while appearing in the dump at all, is a tie group
            # the LIMIT cut through — WHICH members survived is
            # engine-dependent. Only the FINAL depth-0 LIMIT is
            # stripped; inner pages keep their semantics.
            s, e = final_limit
            unl = sql[:s] + sql[e:]
            ksel = ", ".join(f"{k} AS __k{i}" for i, k in enumerate(keys))
            kjoin = ", ".join(f"__k{i}" for i in range(len(keys)))
            try:
                cut = con.execute(
                    f"WITH lim AS (SELECT {ksel}, count(*) AS c "
                    f"  FROM {rel} t GROUP BY ALL), "
                    f"unl AS (SELECT {ksel}, count(*) AS c "
                    f"  FROM ({unl}) t GROUP BY ALL) "
                    f"SELECT count(*) FROM lim JOIN unl USING ({kjoin}) "
                    f"WHERE lim.c < unl.c").fetchone()[0]
                if cut:
                    print(f"FLAG {name}: LIMIT boundary tie — {cut} sort-"
                          f"key group(s) cut mid-tie; survivor choice is "
                          f"engine-dependent")
                    n_flag += 1
            except Exception as e:
                print(f"NOTE {name}: LIMIT boundary check failed to run "
                      f"({str(e).splitlines()[0]})")
    print(f"\n{n_total} dumps linted, {n_flag} flagged, "
          f"{n_limit} LIMIT queries")
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None))
