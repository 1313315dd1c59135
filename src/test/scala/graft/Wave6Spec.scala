package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Round-5 scale-hardening assertions: the TF-IDF family stages its
  * token table once (no double tokenize of the corpus), pinned at the
  * plan level. */
class Wave6Spec extends SparkSpec {

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Seq.empty
    }
    p +: (p.children ++ inner).flatMap(nodes)
  }

  /** FileScans of documents.parquet that read the `text` column — i.e.
    * scans that pay the tokenize. The staged token table makes these
    * vanish from the query plan (the one tokenize ran at staging). */
  private def tokenizeScans(name: String): Seq[FileSourceScanExec] =
    nodes(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan)
      .collect {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("documents")) &&
            f.schema.fieldNames.contains("text") => f
      }

  test("llm_rarest_term: token table staged, no tokenize scan in plan") {
    assert(tokenizeScans("llm_rarest_term").isEmpty,
      "the (doc, term) table must be staged once, not re-tokenized per input")
  }

  test("llm_tfidf_top_term: token table staged, no tokenize scan in plan") {
    // the only documents access left is the corpus-size count — a scan
    // that reads NO columns (footer counts), never the text
    assert(tokenizeScans("llm_tfidf_top_term").isEmpty,
      "the (doc, term, tf) table must be staged once, not re-tokenized per input")
  }

  test("llm_multimodal_ingest reads through the binaryFile source") {
    val df = SparkEntry.queries("llm_multimodal_ingest")(spark, sf)
    assert(df.columns.toSeq ==
      Seq("media_id", "kind", "n_bytes", "digest"))
    // the read path must be the binaryFile format (opaque bytes +
    // metadata), not a text/parquet re-read of the staged payloads
    assert(df.queryExecution.executedPlan.toString.contains("binaryFile"),
      "expected a binaryFile FileScan")
    // one row per staged payload file, ids intact
    import org.apache.spark.sql.functions._
    val ids = df.select("media_id").as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    val want = Tables.documents(spark, sf).filter(col("doc_id") < 64)
      .select("doc_id").as[Long](
        org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    assert(ids.sameElements(want), "one output row per source doc")
  }
}
