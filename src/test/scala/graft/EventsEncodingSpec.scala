package graft

import org.apache.spark.sql.functions._

/** The events table has shipped `ts` in two physical encodings across
  * driver testdata generations — TIMESTAMP(NANOS)-as-long (rounds 1–5)
  * and plain TIMESTAMP(MICROS) (round 6). The loaders must normalize
  * BOTH to a micros TimestampType, so a future regeneration flipping
  * the encoding back cannot silently break every events query again. */
class EventsEncodingSpec extends SparkSpec {

  test("Tables.events normalizes a long-nanos ts file to the same values") {
    import spark.implicits._
    // rewrite the current events table with ts as nanos-since-epoch
    // longs — the legacy physical encoding, reconstructed exactly
    val legacyDir = tmpDir("events-legacy")
    Tables.events(spark, sf)
      .withColumn("ts", unix_micros(col("ts")) * 1000L)
      .write.mode("overwrite").parquet(s"$legacyDir/events.parquet")
    val legacy = Tables.events(spark, legacyDir)
    assert(legacy.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"legacy read produced ${legacy.schema("ts").dataType}")
    val a = Tables.events(spark, sf)
      .select($"event_id", unix_micros($"ts").as("us"))
    val b = legacy.select($"event_id", unix_micros($"ts").as("us"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "long-nanos round-trip changed ts values")
  }

  test("EventStream.readFeed normalizes both encodings identically") {
    import spark.implicits._
    val microsDir = tmpDir("feed-micros")
    val legacyDir = tmpDir("feed-legacy")
    val cur = Tables.events(spark, sf).limit(500)
    cur.write.mode("overwrite").parquet(microsDir)
    cur.withColumn("ts", unix_micros(col("ts")) * 1000L)
      .write.mode("overwrite").parquet(legacyDir)
    def drain(src: String): Set[(Long, Long)] = {
      val out = tmpDir("feed-out")
      val q = graft.streaming.EventStream.readFeed(spark, src)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", tmpDir("feed-ck"))
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
      spark.read.parquet(out).as[(Long, Long)].collect().toSet
    }
    assert(drain(microsDir) == drain(legacyDir),
      "the two physical encodings drained different feeds")
  }
}
