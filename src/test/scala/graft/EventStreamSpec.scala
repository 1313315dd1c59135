package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** §2.9 streaming flavor: file-source changefeed, AvailableNow catch-up,
  * checkpoint as offset log, watermarked event-time windows [NORTH-STAR]. */
class EventStreamSpec extends SparkSpec {

  /** Stage the events parquet into a source dir we control (the stream
    * source lists the directory; testdata is read-only). */
  private def stageSource(): String = {
    val src = tmpDir("feed")
    val f = new java.io.File(s"$sf/events.parquet")
    java.nio.file.Files.copy(f.toPath,
      java.nio.file.Paths.get(src, "events-0.parquet"))
    src
  }

  test("T5: AvailableNow run collapses to latest change per key and commits offsets") {
    val src = stageSource()
    val sink = tmpDir("streamsink")
    val ckpt = tmpDir("ckpt")
    val q = EventStream.deliverLatest(spark, src, sink, ckpt)
    q.awaitTermination(120000)
    val out = spark.read.parquet(sink)
    val expected = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(max(col("event_id")).as("change_version"))
    val got = out.select("user_id", "change_version")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = expected.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)

    // restart with same checkpoint + no new files → no new batch output
    val q2 = EventStream.deliverLatest(spark, src, sink, ckpt)
    q2.awaitTermination(60000)
    assert(spark.read.parquet(sink).count() == out.count())
  }

  test("T9: watermark drops late rows in streaming append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (event_id, epochSeconds, user_id, type, value) rows; ts built in-plan
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val feed = mem.toDF()
      .toDF("event_id", "epoch_s", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(epoch_s)"))
    val windows = EventStream.windowedCounts(feed)
    val q = windows.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      val h = 3600L
      // batch 1: two events in hour 0, one in hour 3 (advances watermark to 2:50)
      mem.addData((1L, 10L, 1L, "a", 1.0), (2L, 20L, 1L, "a", 1.0),
        (3L, 3 * h + 10L, 1L, "a", 1.0))
      q.processAllAvailable()
      // batch 2: a LATE event for hour 0 (beyond the 10-minute watermark) —
      // must be dropped, not resurrect the closed window
      mem.addData((4L, 30L, 1L, "a", 5.0))
      q.processAllAvailable()
      // batch 3: advance watermark far so hour-3 window also closes
      mem.addData((5L, 10 * h, 1L, "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wm_out")
        .select($"window_start".cast("long"), $"n").as[(Long, Long)]
        .collect().toMap
      assert(rows(0L) == 2L, s"hour-0 window must close with 2 rows (late row dropped): $rows")
      assert(rows(3 * h) == 1L)
    } finally q.stop()
  }

  test("T9 [NORTH-STAR]: windowed counts over the feed match the batch twin") {
    val feed = Tables.events(spark, sf) // batch DataFrame through same plan
    val windows = EventStream.windowedCounts(feed)
    val got = windows.agg(sum(col("n"))).head().getLong(0)
    assert(got == Tables.events(spark, sf).count())
    // window starts align to the hour
    val starts = windows.select("window_start").collect()
      .map(_.getAs[java.sql.Timestamp](0).getTime)
    assert(starts.forall(_ % 3600000L == 0L))
  }
}
