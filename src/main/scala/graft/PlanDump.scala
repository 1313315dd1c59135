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
      "llm_dedup_near" -> "MinHash LSH: codegen signatures, explode to bands, one shuffle to buckets, in-bucket pair explosion, broadcast verification joins.",
      "topk_by_version" -> "Version page: TakeOrderedAndProject directly over the scan.",
      "cdc_source_pushdown" -> "Version window pushed through the DSv2 connector (CdcScanBuilder): the BatchScan's description carries the narrowed (lo, hi] range and only files whose footer span intersects it are planned - the batch twin of a micro-batch offset window.",
      "view_adhoc_sql" -> "Ad-hoc SQL through the registered view: pushdown and pruning pass through; revenue as exact integer cents.",
      "llm_chunking" -> "Context-window chunking: single scan, higher-order transform + posexplode, no shuffle before the output sort.")
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
