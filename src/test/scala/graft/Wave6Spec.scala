package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Round-5 scale-hardening assertions: the TF-IDF family stages its
  * token table once (no double tokenize of the corpus), pinned at the
  * plan level. */
class Wave6Spec extends SparkSpec {

  /** FileScans of documents.parquet that read the `text` column — i.e.
    * scans that pay the tokenize. The staged token table makes these
    * vanish from the query plan (the one tokenize ran at staging). */
  private def tokenizeScans(name: String): Seq[FileSourceScanExec] =
    planNodes(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan)
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

  test("decontaminateBloom: exact output even under forced false positives") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val eval = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val expect = graft.llm.Curate.decontaminate(docs, eval, "text")
      .select("doc_id").as[Long](
        org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    // 64 bits for ~hundreds of eval fingerprints saturates the filter —
    // nearly every corpus row becomes a might-contain candidate; the
    // exact confirm must absorb every false positive
    val got = graft.llm.Curate.decontaminateBloom(docs, eval, "text",
        expectedItems = 8, numBits = 64)
      .select("doc_id").as[Long](
        org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    assert(got.sameElements(expect),
      "Bloom prefilter + exact confirm must be output-invisible")
  }

  test("the scale-path decontamination composes identically in the pipeline") {
    // swap the broadcast decontaminate inside the e2e pipeline for the
    // Bloom flavor: the composed output must be row-identical — the
    // scale path is a drop-in physical strategy, not a semantic fork
    import org.apache.spark.sql.functions._
    import graft.llm.{Cluster, Curate, TextOps}
    val docs = Tables.documents(spark, sf)
    val sampled = Curate.sampleStratified(docs, "doc_id", "lang",
      ratesE4 = Map("en" -> 6000L), defaultE4 = 8000L)
    val eval = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    def rest(clean: org.apache.spark.sql.DataFrame) = {
      val losers = Cluster.dupClusters(clean, "doc_id", "text")
        .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
      val deduped = clean.join(losers, Seq("doc_id"), "left_anti")
      val kept = deduped.filter(TextOps.qualityE4(col("text")) >= 1500L)
      Curate.packShards(kept, "doc_id", "text", shards = 4,
          windowTokens = 4096)
        .orderBy("shard", "bin")
        .collect().toSeq
    }
    val viaBroadcast = rest(Curate.decontaminate(sampled, eval, "text"))
    val viaBloom = rest(Curate.decontaminateBloom(sampled, eval, "text"))
    assert(viaBloom == viaBroadcast)
  }

  test("decontaminateBloom: an empty eval set passes the corpus through") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val emptyEval = docs.filter(lit(false))
    val out = graft.llm.Curate.decontaminateBloom(docs, emptyEval, "text")
    assert(out.count() == docs.count(),
      "nothing can be contaminated by zero eval rows")
  }

  test("ScalableRank keeps null-group rows (Window.partitionBy parity)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, Some("a"), 10L), (2L, Some("a"), 20L),
      (3L, None, 30L), (4L, None, 5L))
      .toDF("id", "grp", "v")
      .select($"id", $"grp".as("g"), $"v")
    val ranked = graft.ops.ScalableRank.withRank(df, col("g"),
        Seq(col("v"), col("id")), col("v"), "r", "n", bands = 2)
      .select($"id", $"r", $"n")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(ranked.length == 4, "null-group rows must not be dropped")
    assert(ranked.toSeq == Seq((1L, 1L, 2L), (2L, 2L, 2L),
      (3L, 2L, 2L), (4L, 1L, 2L)),
      s"null group ranks as its own partition; got ${ranked.toSeq}")
  }

  test("ScalableRank ranks NULL order keys first (Window parity on a " +
      "nullable band key)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // NULL v rows must band FIRST (Spark's ascending NULLS FIRST), not
    // fall into the last band via the when-chain catch-all
    val df = Seq((1L, "a", Some(10L)), (2L, "a", None), (3L, "a", Some(5L)),
      (4L, "a", None), (5L, "b", Some(1L)), (6L, "b", None))
      .toDF("id", "g", "v")
    val got = graft.ops.ScalableRank.withRank(df, col("g"),
        Seq(col("v"), col("id")), col("v"), "r", "n", bands = 3)
      .select($"id", $"r").as[(Long, Long)].collect().sortBy(_._1)
    val want = df.withColumn("r", row_number().over(
        Window.partitionBy($"g").orderBy($"v", $"id")).cast("long"))
      .select($"id", $"r").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq,
      s"banded rank must match Window on nullable keys: got ${got.toSeq} " +
        s"want ${want.toSeq}")
  }

  test("llm_decontaminate_bloom: clean path is scan-only, no join") {
    // the scale contract: the definitely-clean side (no Bloom hit) goes
    // scan -> filter -> union with NO join and NO exchange — only the
    // bounded candidate side meets the eval set
    import org.apache.spark.sql.execution.UnionExec
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val plan = SparkEntry.queries("llm_decontaminate_bloom")(spark, sf)
      .queryExecution.executedPlan
    val unions = planNodes(plan).collect { case u: UnionExec => u }
    assert(unions.size == 1, s"expected one union, got ${unions.size}")
    val sides = unions.head.children.map(planNodes)
    val joinFree = sides.filter(s => !s.exists(_.isInstanceOf[BaseJoinExec])
      && !s.exists(_.isInstanceOf[Exchange]))
    assert(joinFree.size == 1,
      "exactly one union side (the clean majority) must be join- and " +
        "exchange-free; the other carries the bounded candidate confirm")
    // the premise is an unbroadcastable eval side, so the code must
    // not FORCE a broadcast — the physical strategy stays AQE's call
    // (broadcast at this test scale, shuffle at 100 TB). Assert no
    // hint in the logical plan rather than banning the physical
    // broadcast AQE correctly picks here.
    val logical = SparkEntry.queries("llm_decontaminate_bloom")(spark, sf)
      .queryExecution.analyzed
    assert(!logical.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.exists(_ => true),
      "the confirm join must not carry a broadcast hint")
  }
}
