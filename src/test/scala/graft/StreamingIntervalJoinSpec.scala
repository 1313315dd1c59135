package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Stream-stream interval join: correct in-range matches, out-of-range
  * exclusion, and the state-cleanup preconditions (watermarks on both
  * sides + two-sided time bound) that keep join state from growing
  * without bound. */
class StreamingIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = java.sql.Timestamp.valueOf(
    java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(min))

  test("joins every right event in the lookback window, and only those") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rMem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val left = lMem.toDF().toDF("event_id", "ts", "user_id")
    val right = rMem.toDF().toDF("event_id", "ts", "user_id")

    val joined = EventStream.intervalJoin(left, right, "user_id",
      lookback = "1 hour")
    val q = joined.writeStream.format("memory")
      .queryName("ivj_out").outputMode("append").start()
    try {
      // purchase at t=90min; errors at t=20 (70 min before → outside the
      // 1 h lookback), t=30 (EXACTLY lookback before → excluded: the
      // window is half-open, matching the batch join_interval oracle),
      // t=40 (in), t=85 (in), t=100 (after → out), and t=88 for a
      // different user (out)
      rMem.addData((200L, ts(20), 1L), (205L, ts(30), 1L),
        (201L, ts(40), 1L), (202L, ts(85), 1L),
        (203L, ts(100), 1L), (204L, ts(88), 2L))
      lMem.addData((100L, ts(90), 1L))
      q.processAllAvailable()
      val got = spark.table("ivj_out")
        .select(col("event_id"), col("r_event_id"))
        .as[(Long, Long)].collect().toSet
      assert(got == Set((100L, 201L), (100L, 202L)),
        s"expected the two in-window errors, got $got")

      // the logical plan must carry watermarks on both sides — the
      // precondition for state removal in a stream-stream join
      val plan = joined.queryExecution.analyzed.toString
      assert("EventTimeWatermark".r.findAllIn(plan).size == 2,
        s"both sides must be watermarked:\n$plan")
      assert(q.lastProgress.stateOperators.nonEmpty,
        "interval join must run as a stateful operator")
    } finally q.stop()
  }
}
