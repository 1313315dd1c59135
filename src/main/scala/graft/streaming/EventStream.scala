package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming flavor of the changefeed (SURVEY.md §2.9).
  *
  * The reference's consumer loop (invoice-api/consumer.js:6-49 — poll every
  * 5 minutes, catch up immediately while hasMore, advance the cursor only
  * after processing) IS Structured Streaming's contract: the checkpoint
  * offset log plays ChangeTrackingSyncState, `Trigger.AvailableNow` plays
  * the catch-up loop, `Trigger.ProcessingTime` plays setInterval, and
  * foreachBatch + idempotent sink gives the same exactly-once effect.
  *
  * One streaming query per consumer (own checkpoint dir) = T1/T8
  * multi-consumer fan-out; deleting the checkpoint dir = T7 reset.
  */
object EventStream {

  /** The change-table schema: `events` as a version-ordered feed
    * (event_id = change version, FIXTURES.md §C), with `ts` in the
    * given physical encoding (see [[eventsTsType]] / Tables.events). */
  def eventsSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The `ts` physical type actually present in `srcDir` — testdata
    * generations have shipped it both as TIMESTAMP(NANOS)-as-long and as
    * plain TIMESTAMP(MICROS). One batch footer read at plan time; a
    * streaming source must declare its schema up front. A source dir
    * that is empty (or absent) when the reader starts — the normal
    * consumer-before-producer changefeed startup — cannot be probed,
    * so it defaults to the CURRENT generation's encoding
    * (TimestampType); a legacy long-nanos producer must stage its
    * first page before the reader starts to be detected. */
  def eventsTsType(spark: SparkSession, srcDir: String): DataType =
    try spark.read.parquet(srcDir).schema("ts").dataType
    catch { case _: org.apache.spark.sql.AnalysisException => TimestampType }

  /** File-based changefeed source: new parquet files in `srcDir` are new
    * change batches. maxFilesPerTrigger bounds a micro-batch like the
    * reference's page `limit` (T3). `ts` is normalized to a micros
    * TimestampType column whatever the files' physical encoding.
    * `tsTypeOverride` pins the encoding explicitly for the
    * consumer-before-producer startup (empty srcDir at plan time, so
    * the footer probe cannot see it): a legacy long-nanos producer that
    * stages its first page after the reader starts MUST pass
    * `Some(LongType)` or the declared schema will disagree with the
    * file footers mid-drain. */
  def readFeed(spark: SparkSession, srcDir: String,
               maxFilesPerTrigger: Int = 16,
               tsTypeOverride: Option[DataType] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = tsTypeOverride.getOrElse(eventsTsType(spark, srcDir))
    val raw = spark.readStream
      .schema(eventsSchema(tsType))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    tsType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** T5 — per-key change collapsing inside each micro-batch (latest state
    * wins), delivered through an idempotent foreachBatch sink. The sink
    * writes partitioned by batch so redelivery of a batch overwrites
    * itself — exactly-once end effect on top of the at-least-once
    * offset log. */
  def deliverLatest(spark: SparkSession, srcDir: String, sinkDir: String,
                    checkpointDir: String): StreamingQuery =
    readFeed(spark, srcDir).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val latest = batch
          .groupBy(col("user_id"))
          .agg(max(col("event_id")).as("change_version"))
        latest
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(sinkDir)
        ()
      }
      .start()

  /** [NORTH-STAR] T9 — event-time windowed aggregation with a watermark:
    * tumbling windows over the event stream, late data beyond 10 minutes
    * dropped. The batch twin is `stream_event_windows` in the declared
    * queries. */
  def windowedCounts(feed: DataFrame): DataFrame =
    feed
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // per-row integer cents, then a long sum: associative and exact, so
      // micro-batch/partial-agg order can never move a window's total by
      // a cent (a double sum rounded once at the end can)
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_cents"))

  /** [NORTH-STAR] T9' — stream-stream interval join: every `right` event
    * within `lookback` BEFORE each `left` event with the same key — the
    * streaming twin of the batch `join_interval` query.
    *
    * Both sides carry watermarks and the join condition bounds event
    * time in BOTH directions (r.ts ≤ l.ts AND r.ts > l.ts − lookback —
    * the same half-open window as the batch `join_interval` query and
    * its oracle, so the twins agree at the lookback boundary), which is
    * exactly what Structured Streaming needs to age state out:
    * a buffered right row can be dropped once the left watermark passes
    * its ts + lookback, and a left row once the right watermark passes
    * its ts. Without the lower bound the right buffer is immortal — the
    * classic unbounded-state bug this helper exists to prevent.
    *
    * Inputs must have columns (key, ts, payload…); output = left columns
    * plus the matched right's columns prefixed `r_`. Inner join: a left
    * event with no prior right event in range emits nothing (use the
    * batch as-of for enrich-with-latest semantics). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   lookback: String = "1 hour",
                   watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay).alias("l")
    val r = right.columns.foldLeft(right) { (df, c) =>
        if (c == keyCol) df else df.withColumnRenamed(c, s"r_$c")
      }.withWatermark("r_ts", watermarkDelay).alias("r")
    l.join(r,
      expr(s"""l.$keyCol = r.$keyCol AND
               r.r_ts <= l.ts AND
               r.r_ts > l.ts - INTERVAL $lookback"""))
      .drop(col(s"r.$keyCol"))
  }
}
