#!/usr/bin/env python3
"""Engine-OUTSIDE recall measurement for the approximate kNN graph
(round-13 verdict ask #3): llm_knn_graph is approximate by contract
(the LSH + NN-descent trade), so its edges carry no hash oracle — but
the EDGES the engine exported (graft.Verify side effect, the pagerank
edge-export template) can be scored against DuckDB's OWN exact kNN,
computed entirely outside the engine from embeddings.parquet.

Definition mirrors KnnGraphSpec exactly: per source vector, the exact
top-k partners by (round(1e6*cosine) DESC, id ASC); recall = fraction
of those exact edges present in the engine's graph, summed over the
(sampled) sources. e6 quantization matches the engine's cosineE6, so
tie handling is identical on both sides.

Usage: tools/knn_recall.py <sf_dir> [export_root] [sample_target] [floor]
Prints one JSON line; exits 1 below the floor. The default floor 0.70
is the SAME contract KnnGraphSpec pins in-process: with the descent
candidate width log-n-scaled like the planes (autoSearchK, round 15 —
the round-14 fixed-width geometry decayed 0.80 -> 0.59 from 500 ->
2,000 vectors), measured recall is ~0.85 at the 500-vector SFs and
~0.91 at sf0.1's 2,000. The floor exists to catch REGRESSIONS of the
declared geometry, not to promise more than the approximate-by-
contract graph does. Requires a prior `graft.Verify <sf_dir> ...` run
(it writes the edge export this reads).
"""
import json
import sys

import duckdb

def main() -> int:
    sf_dir = sys.argv[1]
    export_root = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/target/oracle-export"
    sample_target = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.70
    k = 5

    con = duckdb.connect()
    n_emb = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    n_ord = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()[0]
    tag = n_emb * 1000000000 + n_ord
    edges_glob = f"{export_root}/knng_edges_v3_*/*.parquet"
    n_edges = con.execute(
        f"SELECT count(*) FROM read_parquet('{edges_glob}') "
        f"WHERE corpus_tag = {tag}").fetchone()[0]
    if n_edges == 0:
        print(f"knn_recall: no exported edges for corpus_tag={tag} under "
              f"{export_root} — run graft.Verify {sf_dir} first "
              "(the export is this tool's input)", file=sys.stderr)
        return 2

    stride = max(1, n_emb // sample_target)
    row = con.execute(f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[64]) AS v
          FROM read_parquet('{sf_dir}/embeddings.parquet')),
        nrm AS (
          SELECT vec_id, v, sqrt(array_inner_product(v, v)) AS n FROM emb),
        q AS (SELECT * FROM nrm WHERE vec_id % {stride} = 0),
        pairs AS (
          SELECT q.vec_id AS src, e.vec_id AS dst,
            CAST(round(1e6 * array_inner_product(q.v, e.v) / (q.n * e.n))
              AS BIGINT) AS cos_e6
          FROM q JOIN nrm e ON e.vec_id <> q.vec_id),
        exact AS (
          SELECT src, dst FROM (
            SELECT src, dst,
              row_number() OVER (PARTITION BY src
                ORDER BY cos_e6 DESC, dst) AS rn
            FROM pairs) WHERE rn <= {k}),
        g AS (
          SELECT DISTINCT src, dst
          FROM read_parquet('{edges_glob}')
          WHERE corpus_tag = {tag}),
        hits AS (
          SELECT count(*) AS c FROM exact JOIN g USING (src, dst))
        SELECT (SELECT count(*) FROM q) AS sampled,
               (SELECT count(*) FROM exact) AS exact_edges,
               (SELECT c FROM hits) AS hits
        """).fetchone()
    sampled, exact_edges, hits = row
    recall = hits / exact_edges if exact_edges else 0.0
    result = {
        "sf_dir": sf_dir, "n_vectors": int(n_emb), "k": k,
        "sampled_sources": int(sampled), "exact_edges": int(exact_edges),
        "hits": int(hits), "recall": round(recall, 4), "floor": floor,
        "corpus_tag": int(tag),
    }
    print(json.dumps(result))
    if recall < floor:
        print(f"knn_recall: recall {recall:.4f} below floor {floor}",
              file=sys.stderr)
        return 1
    return 0

if __name__ == "__main__":
    sys.exit(main())
