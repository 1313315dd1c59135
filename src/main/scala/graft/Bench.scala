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
    // pools) so the first timed query isn't charged JVM startup.
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      Tables.lineitem(spark, sfDir).count()
    } catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // a broken query must not pass as a fast success: failures are
    // excluded from the per-query map AND the total (a 5 ms analysis
    // error summed into the total would read as a faster build), listed
    // in "failed", logged, and fail the process
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"BENCH_FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
          None
      }
    }.toMap
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The full per-query map goes to a FILE: at 180 queries the map is
    // ~7 KB and the driver keeps only the tail of stdout, which
    // truncated two-thirds of the round-7 evidence ("parsed": null in
    // BENCH_r07.json). Stdout carries a short, always-parseable summary
    // line pointing at the file. The default path is NOT gitignored
    // (unlike target/), so a driver-invoked run leaves the full map as
    // an uncommitted file the round-end auto-commit picks up — every
    // per-query number stays auditable from the repo; per-round copies
    // live under bench/BENCH_FULL_r{N}_*.json via SPARK_GRAFT_BENCH_OUT.
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    val fullPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/bench_full_latest.json"))
    Option(fullPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(fullPath, fullJson + "\n")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"failed":$failedJson,"queries_file":"$fullPath","sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
