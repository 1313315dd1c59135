package graft
import java.nio.file.{Files, Paths}
/** Regenerates PLANS.md: formatted physical plans of the flagship
  * queries with the scale-relevant properties called out. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("local[8]")
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    val picks = Seq(
      "cdc_incremental_poll" -> "Flagship poll page, serving-path shape: the bounded key page is computed once (union feeds -> max-version collapse -> top-K, the only full-feed pass) and collected; document assembly then joins the big tables ONCE each against the literal broadcast page (LocalTableScan below). The single-plan declarative form would feed the page subtree into two broadcast joins, and AQE plans those stages independently (exchange reuse not guaranteed) - doubling the feed pass.",
      "join_view_flat" -> "BI view flatten: broadcast-hash join, no shuffle of the big side at this SF; at scale both sides bucketed (see StateLayout).",
      "agg_max_version" -> "Change collapse: partial (map-side) + final hash aggregate — one shuffle on the entity key.",
      "llm_simsearch_topk" -> "Brute-force cosine: parquet scan with pushed filters + codegen VecDot + TakeOrderedAndProject; no shuffle.",
      "llm_dedup_near" -> ("MinHash LSH: codegen signatures, explode to bands, one shuffle to buckets, in-bucket pair explosion, broadcast verification joins.\n\n" +
        "Round 4: the giant-bucket cap (Dedup.withBucketCap) inserts a window count over (band, bucket) ahead of the pair groupBy - same shuffle key, so no new exchange (spec-asserted by self-baselining against the cap-disabled plan), but WindowExec adds a sort and two codegen stages. Bench cost ~2.0->3.0 s at sf0.1, nearly all cold-plan codegen (BenchProbe: cold=5.5 warm2=1.48). Accepted: the window spills via ExternalAppendOnlyUnsafeRowArray, so a degenerate bucket is linear+spill-safe where the uncapped pair explosion was O(b^2), and the collect-then-split alternative would buffer the whole bucket in one aggregation row. The cap defaults ON only for MinHash bands (64-bit bucket space: over-cap => identical signatures => mutual dups); simhash chunks (16-bit) and hyperplane buckets (2^planes) default OFF - small key spaces fill with unrelated members at corpus scale, so capping there would trade away genuine pairs (the scale lever is more chunks/planes)."),
      "llm_simsearch_ann" -> "ANN over the IVF layout (round 4): the hamming-ball probe set is enumerated driver-side from the query's hyperplane signature and the bucketed parquet is read with bucket IN (...) - PartitionFilters prune the scan to exactly the probed bucket directories (spec asserts scanned == probed-and-present), then codegen VecDot exact rerank + TakeOrderedAndProject. At 100 TB the scan cost is probed/2^planes of the corpus.",
      "topk_by_version" -> "Version page: TakeOrderedAndProject directly over the scan.",
      "cdc_source_pushdown" -> "Version window pushed through the DSv2 connector (CdcScanBuilder): the BatchScan's description carries the narrowed (lo, hi] range and only files whose footer span intersects it are planned - the batch twin of a micro-batch offset window.",
      "view_adhoc_sql" -> "Ad-hoc SQL through the registered view: pushdown and pruning pass through; revenue as exact integer cents.",
      "llm_chunking" -> "Context-window chunking: single scan, higher-order transform + posexplode, no shuffle before the output sort.",
      "llm_decontaminate" -> "Eval-set decontamination (round 4): the eval side collapses to distinct fingerprints and BROADCASTS into a left-anti hash join - the 100 TB corpus side never shuffles; fingerprinting is codegen md5 over normalized text at the scan.",
      "join_asof" -> "As-of join (round 4): union-tag both sides, ONE window pass per key (exactly one exchange, spec-asserted) carrying the latest right row forward via last(ignoreNulls) - no range-join pair explosion, cost independent of how many right rows precede each left row. Semantics byte-equal to DuckDB ASOF LEFT JOIN.",
      "llm_boilerplate_ngrams" -> "Corpus-frequent n-grams (round 4): distinct 3-grams exploded at the scan, doc-frequency via partial (map-side) + final hash aggregate on the gram key, then TakeOrderedAndProject - k rows to the driver, one shuffle total.",
      "llm_ivf_assign" -> "IVF assignment (round 4): corpus x BROADCAST(8 centroids) nested-loop join, integer-cosine argmax folded into a partial+final max(struct) aggregate on the vector id, then the per-centroid stats aggregate. The corpus is scanned once and shuffled only as (id, best) pairs; centroids-side cost is O(k).",
      "llm_dedup_clusters" -> "Transitive dup clusters (round 4): the near-dup pair pipeline feeds iterative min-label propagation + pointer jumping (graft.llm.Cluster); each round is two id-keyed shuffles and ends in localCheckpoint, so the displayed plan stays O(1) deep regardless of rounds (the checkpoint scan below IS that truncation). Convergence for LSH dup graphs is 2-4 rounds; the driver sees one boolean per round.",
      "join_salted" -> "Salted skew join (round 4): the exchanges partition on (user_id, _salt) - a hot key's rows spread across 8 sub-keys instead of serializing through one task; the dimension side is replicated 8x (explode over the salt range) which is noise when that side is dimension-sized. Output is identical to the plain join (the DuckDB oracle IS the plain join).",
      "llm_sample_bottomk" -> "Bottom-k sample (round 4): TakeOrderedAndProject over md5 priorities - per-partition top-k buffers merged once, no shuffle, exactly k rows out; deterministic across engines and reruns.",
      "llm_rarest_term" -> "Rarest term per doc (round 4): the TF-IDF shape - vocabulary doc-frequency aggregate (partial+final on the term), join back to the exploded terms, per-doc argmin as a partial min(struct) aggregate. Both shuffles key on high-cardinality columns.",
      "window_sessionize" -> "Gaps-and-islands sessionization (round 4): the lag flag and the running session-id sum are BOTH WindowExec nodes over the same (user_id) partitioning and (ts_ms, event_id) order - one exchange feeds the whole chain, then the per-session aggregate is a partial+final hash agg on (user_id, session_id) with no further shuffle of raw rows. All boundary math on epoch-ms longs: the ns-precision files and Spark's us timestamps can never split sessions differently than the oracle.",
      "window_gapfill" -> "Resample + gap-fill (round 4): per-type hourly counts (partial+final hash agg), per-type min/max hour, dense grid via sequence+explode, left join back. The grid side is generated distributed - no driver collect, no literal range baked into the plan. Note Catalyst COLLAPSES the written agg-of-agg (min over hourly mins) into a direct per-type min/max over the raw scan, so the plan reads the 2-column projection twice rather than reusing the counts exchange; the second pass folds to map-side partials (5 rows out per task), so at 100 TB it costs one extra columnar scan, not a shuffle. The counts side broadcasts into the left join - types x hours is bounded by wall-clock span, not data volume.",
      "llm_tfidf_top_term" -> "TF-IDF top term (round 4): tf agg on (doc, term), vocabulary df agg on term, corpus count as a ONE-ROW broadcast riding a BroadcastNestedLoopJoin (the only safe cartesian: 1 x n), per-doc argmax as partial+final max(struct). Two honest tradeoffs, same as llm_rarest_term's shape: (1) the tokenize+tf subtree appears under both join inputs and AQE does NOT reuse the exchange across the broadcast-stage boundary (verified on the executed plan), so the corpus is tokenized twice - at 100 TB you stage the token table once (parquet/bucketed, the StateLayout pattern) and both aggregates read the staging; (2) df-join-back over a term key, NOT a count window over term partitions - a stopword's window partition cannot be split, but AQE skew-join can split the join, and map-side partial counts already collapse the df aggregate's skew.")
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of the flagship queries (sf0.01, regenerate with `sbt \"runMain graft.PlanDump\"`)\n")
    for ((name, note) <- picks) {
      sb.append(s"\n## $name\n\n$note\n\n```\n")
      val df = SparkEntry.queries(name)(spark, d)
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).trim)
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
