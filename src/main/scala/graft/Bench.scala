package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same timezone as Verify/Tables.session: the benchmarked workload
      // must be the workload the correctness gate validated
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen compiler, parquet footer cache, executor
    // pools) so the first timed query isn't charged JVM startup — and
    // resolve the corpus-keyed serving artifacts (index layouts,
    // codebooks, graphs, merge tables) that deployment builds once per
    // corpus: charging a one-time build to whichever query runs first
    // measures build scheduling, not the engine (round-8 verdict #1).
    // A warm failure must be VISIBLE in the emitted JSON (round-9
    // ADVICE): if the artifact warm-up dies, every one-time build cost
    // folds back into whichever query's cold timing resolves it first
    // — the round-8 distortion — and a stderr-only note leaves sweep
    // tooling unable to tell warmed from unwarmed cold numbers.
    var warmFailed: Option[String] = None
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      Tables.lineitem(spark, sfDir).count()
      graft.llm.LlmQueries.warmServingArtifacts(spark, sfDir)
    } catch { case e: Throwable =>
      warmFailed = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      System.err.println(s"BENCH_WARM_FAIL: ${warmFailed.get}")
    }
    // sanitize + truncate BEFORE escaping: truncating after could split
    // an escape pair and leave a lone trailing backslash (malformed
    // JSON), and raw control chars are illegal inside JSON strings
    val warmFailedJson = warmFailed
      .map { m0 =>
        val m = m0.replaceAll("\\p{Cntrl}", " ").take(300)
        "\"" + m.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      }
      .getOrElse("null")
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // a broken query must not pass as a fast success: failures are
    // excluded from the per-query maps AND the totals (a 5 ms analysis
    // error summed into the total would read as a faster build), listed
    // in "failed", logged, and fail the process.
    // DUAL TIMING (round-8 verdict #3): each query runs TWICE in this
    // JVM — `queries` holds the cold number (first run: plan analysis,
    // codegen, any per-session staging), `warm2` the repeat (the
    // steady-state serving cost). Regressions are judged on warm2; the
    // cold column keeps the staging cost auditable instead of hidden.
    // The timed action is the NOOP SINK, not count(): under
    // groupBy().count() Catalyst prunes every unused projection — a
    // pure scan→project→sort query collapsed to a metadata row-count
    // (measured round 12: the simhash query's count() plan reads
    // struct<>, zero columns). The noop write demands every column of
    // every output row — the full declared plan, sort included —
    // while discarding rows executor-side (no driver collect).
    val cold = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val warm2 = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        cold(name) = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        warm2(name) = (System.nanoTime() - t1) / 1e9
      } catch {
        case e: Throwable =>
          failed += name
          cold.remove(name); warm2.remove(name)
          System.err.println(s"BENCH_FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    // 4-decimal fixed point keeps the per-query stdout line compact
    // (Locale.ROOT: a comma decimal separator would corrupt the JSON)
    def js(m: collection.Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) =>
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.4f", v)
      }.mkString("{", ",", "}")
    val total = cold.values.sum
    val warmTotal = warm2.values.sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The full per-query maps go to BOTH a file and stdout. The file
    // (default path gitignored — every driver-invoked run rewrites it;
    // the audited per-round copies live under bench/BENCH_FULL_r{N}_*
    // via SPARK_GRAFT_BENCH_OUT) is the durable evidence. Stdout prints
    // the full map line FIRST and a compact summary line LAST: the
    // driver machine-parses stdout but keeps only a bounded tail of it
    // (BENCH_r*.json tails are exactly 2000 chars), so a scan over the
    // full stream finds the complete per-query map while a parse
    // restricted to the tail still lands on the short final line —
    // whichever window the driver uses, it gets a parseable object.
    // (build.sbt's run/outputStrategy passes these lines through
    // unprefixed; sbt's default "[info] " logger prefix is what kept
    // "parsed": null for rounds 1-11.)
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(cold)},"warm2":${js(warm2)},"warm2_total":$warmTotal,"failed":$failedJson,"warm_failed":$warmFailedJson,"sf":"$sfDir"}"""
    val fullPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/bench_full_latest.json"))
    Option(fullPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(fullPath, fullJson + "\n")
    println(fullJson)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${cold.size},"warm2_total":$warmTotal,"failed":$failedJson,"warm_failed":$warmFailedJson,"queries_file":"$fullPath","sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
