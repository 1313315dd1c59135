package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The DataSource-V2 CDC source: version offsets, bounded version-range
  * micro-batches (pagination), footer-stats pruning, batch flavor. */
class CdcSourceSpec extends SparkSpec {
  import spark.implicits._

  private val eventsPath = s"$sf/events.parquet"

  private def expected: Set[(Long, Long)] =
    Tables.events(spark, sf).select("user_id", "event_id")
      .as[(Long, Long)].collect().toSet

  test("batch read returns every change record with the declared schema") {
    val df = spark.read.format("graft-cdc")
      .option("path", eventsPath)
      .option("versionColumn", "event_id")
      .option("entityColumn", "user_id")
      .load()
    assert(df.schema.fieldNames.toSeq == Seq("entity_id", "change_version"))
    val got = df.as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("batch version filters push into the scan and prune whole files") {
    // disjoint per-file version ranges (the compacted layout)
    val out = tmpDir("cdcsrc-pushdown")
    graft.cdc.Retention.writeCompacted(
      Tables.events(spark, sf).select(
        col("user_id").as("entity_id"), col("event_id").as("change_version")),
      out, nFiles = 4)
    val ranges = graft.sources.CdcFiles.files(
      graft.sources.CdcOptions(Map("path" -> out)))
      .map(graft.sources.CdcFiles.versionRange(_, "change_version", "entity_id"))
      .sortBy(_._1)
    val (lo2, hi2) = ranges(2) // target the third file's span
    val df = spark.read.format("graft-cdc").option("path", out).load()
      .filter(col("change_version") > lo2 - 1 && col("change_version") <= hi2)
    // the range reaches planInputPartitions → one file scanned, not four
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.inputPartitions.length == 1,
      s"expected 1 pruned partition, got ${scan.inputPartitions.length}")
    // and results equal the residual-filter baseline
    val want = expected.filter { case (_, v) => v >= lo2 && v <= hi2 }
    assert(df.as[(Long, Long)].collect().toSet == want)
  }

  test("onNullEntity policy: fail is loud, skip drops, keep emits null") {
    val out = tmpDir("cdcsrc-nulls")
    Seq((Some(1L), 10L), (None, 11L), (Some(3L), 12L))
      .toDF("entity_id", "change_version")
      .coalesce(1).write.mode("overwrite").parquet(out)
    def read(policy: String) = spark.read.format("graft-cdc")
      .option("path", out).option("onNullEntity", policy).load()

    val loud = intercept[org.apache.spark.SparkException] {
      read("fail").collect()
    }
    assert(loud.getMessage.contains("entity") ||
      loud.getCause != null, s"unexpected: ${loud.getMessage}")

    val skipped = read("skip").as[(Option[Long], Long)].collect().toSet
    assert(skipped == Set((Some(1L), 10L), (Some(3L), 12L)))

    val kept = read("keep").as[(Option[Long], Long)].collect().toSet
    assert(kept == Set((Some(1L), 10L), (None, 11L), (Some(3L), 12L)))
  }

  test("micro-batch stream drains in bounded version pages, exactly once") {
    val sink = tmpDir("cdcsrc-sink")
    val ckpt = tmpDir("cdcsrc-ckpt")
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = spark.readStream.format("graft-cdc")
      .option("path", eventsPath)
      .option("versionColumn", "event_id")
      .option("entityColumn", "user_id")
      .option("maxVersionsPerBatch", "250")
      .load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = batch.select("entity_id", "change_version")
          .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong)).collect()
        batch.sparkSession.createDataset(rows.toSeq)(
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong))
          .toDF("entity_id", "change_version")
          .write.mode("append").parquet(sink)
        if (rows.nonEmpty)
          batches.synchronized {
            batches += ((id, rows.map(_._2).min, rows.map(_._2).max))
          }
        ()
      }
      .start()
    q.awaitTermination(120000)

    val delivered = spark.read.parquet(sink)
      .as[(Long, Long)].collect()
    assert(delivered.length == expected.size, "no duplicates, no loss")
    assert(delivered.toSet == expected)
    // event_ids at sf0.001 span ~1000 versions; 250/page → several pages
    assert(batches.size >= 3, s"expected multiple pages, got ${batches.size}")
    batches.foreach { case (_, lo, hi) =>
      assert(hi - lo <= 250, s"page wider than the version bound: ($lo, $hi)")
    }
    // pages are disjoint, version-ordered
    val sorted: Seq[(Long, Long, Long)] = batches.sortBy(_._2).toSeq
    sorted.sliding(2).foreach { w =>
      if (w.size == 2) assert(w(0)._3 < w(1)._2,
        s"overlapping pages: ${w(0)} vs ${w(1)}")
    }
  }

  test("restart from checkpoint delivers nothing new (offsets persisted)") {
    val sink = tmpDir("cdcsrc-sink2")
    val ckpt = tmpDir("cdcsrc-ckpt2")
    def run(): Unit = {
      val q = spark.readStream.format("graft-cdc")
        .option("path", eventsPath)
        .option("versionColumn", "event_id")
        .option("entityColumn", "user_id")
        .load()
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", sink)
        .start()
      q.awaitTermination(120000)
    }
    run()
    val n1 = spark.read.parquet(sink).count()
    run()
    val n2 = spark.read.parquet(sink).count()
    assert(n1 == expected.size && n2 == n1, s"replay after restart: $n1 -> $n2")
  }
}
