package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The round-8 robustness matrix: every streaming family's existing
  * crash spec kills ONE hand-picked batch; this suite generalizes the
  * ExactlyOnceSpec pattern to KILL AT EVERY BATCH — for each family, a
  * clean probe run establishes the batch count and the converged
  * result, then the matrix reruns the family once per batch id with an
  * injected kill at that id (after the state/sink write, before the
  * checkpoint commit — the at-least-once hazard window every hook
  * exposes), restarts from the same checkpoint, and requires the final
  * state to equal the probe's. No kill position may lose, duplicate,
  * or reorder state — for ANY batch, not just the one a hand-written
  * spec happened to pick.
  *
  * Families: SCD2 history maintenance, MERGE state maintenance, the
  * end-to-end CDC delivery pipeline, streaming near-dedup, and the
  * event-time session stream (custom flatMapGroupsWithState state +
  * timers — the one family whose per-entity state lives in Spark's own
  * state store rather than a graft-managed table). (The streaming
  * agg-view family runs its own per-window crash specs in
  * StreamingAggViewSpec — its crash surface is the log/view two-phase
  * write, not the foreachBatch hook the others share.)
  */
class CrashMatrixSpec extends SparkSpec {
  import spark.implicits._

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  /** Drive one family through the full kill matrix.
    * `launch(root, hook)` must wire every path (state, sink,
    * checkpoint) under `root` so each matrix cell is isolated;
    * `result(root)` reads the converged state as a comparable set. */
  private def crashMatrix[T](family: String)
      (launch: (String, Long => Unit) => StreamingQuery)
      (result: String => Set[T]): Unit = {
    // clean probe: batch count + the converged truth. Every await
    // asserts TRUE — a timed-out drain would otherwise yield a partial
    // "truth" the kill cells then falsely converge against.
    val probeRoot = tmpDir(s"cm-$family-probe")
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    assert(launch(probeRoot, seen.add(_)).awaitTermination(180000),
      s"$family: probe drain timed out")
    val truth = result(probeRoot)
    val n = seen.size
    assert(n >= 3, s"$family: matrix needs >=3 batches, got $n — " +
      "shrink pageVersions so the kill matrix exercises real restarts")
    assert(truth.nonEmpty, s"$family: probe produced an empty result")

    for (crashAt <- 0L until n.toLong) {
      val root = tmpDir(s"cm-$family-k$crashAt")
      val q1 = launch(root, bid =>
        if (bid == crashAt)
          throw new RuntimeException(s"injected kill at batch $bid"))
      // bounded wait: a kill that never fires leaves a normally-
      // terminating (or hung) query — intercept then fails the test
      // instead of hanging the suite on an unbounded await
      val failed = intercept[
          org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.awaitTermination(300000)
      }
      assert(msgs(failed).exists(_.contains("injected kill")),
        s"$family kill@$crashAt: wrong failure: $failed")
      // restart from the same checkpoint, no injection: must converge
      assert(launch(root, _ => ()).awaitTermination(180000),
        s"$family kill@$crashAt: restart drain timed out")
      val got = result(root)
      assert(got == truth,
        s"$family kill@$crashAt diverged after restart: " +
          s"missing=${(truth -- got).take(3)} extra=${(got -- truth).take(3)}")
    }
  }

  private def writeChangeTable(): String = {
    val table = tmpDir("cm-feed")
    graft.cdc.TombstoneCdc.headerFeedOps(spark, sf)
      .unionByName(graft.cdc.TombstoneCdc.lineFeedOps(spark, sf))
      .coalesce(2).write.mode("overwrite").parquet(table)
    table
  }

  /** pageVersions sized so the feed spans ~4 batches — a matrix over
    * 1-2 batches would not exercise mid-stream restarts. */
  private def quarterSpan(table: String, versionCol: String): Long = {
    val Array(lo, hi) = spark.read.parquet(table)
      .agg(min(col(versionCol)), max(col(versionCol)))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    math.max(1L, (hi - lo + 1) / 4 + 1)
  }

  test("kill-at-every-batch: SCD2 history maintenance converges from " +
      "every crash position to the batch history") {
    val table = writeChangeTable()
    val pv = quarterSpan(table, "change_version")
    crashMatrix("scd2") { (root, hook) =>
      graft.streaming.StreamingScd2.maintain(spark, table,
        "change_version", "invoice_id", "change_operation",
        s"$root/history", s"$root/ckpt", pageVersions = pv,
        onBatchApplied = hook)
    } { root =>
      graft.streaming.StreamingScd2.historyTable(spark, s"$root/history")
        .select($"invoice_id", $"change_operation",
          $"valid_from", $"valid_to", $"is_current")
        .collect().map(_.toSeq.toList).toSet
    }
    // the probe's convergence target itself equals the batch truth
    // (pinned once here; the matrix pins every kill cell against it)
    val root = tmpDir("cm-scd2-truth")
    graft.streaming.StreamingScd2.maintain(spark, table,
      "change_version", "invoice_id", "change_operation",
      s"$root/history", s"$root/ckpt", pageVersions = pv)
      .awaitTermination(180000)
    val cols = Seq("invoice_id", "change_operation", "valid_from",
      "valid_to", "is_current")
    val got = graft.streaming.StreamingScd2
      .historyTable(spark, s"$root/history").select(cols.map(col): _*)
    val want = graft.cdc.Scd2.invoiceHistory(spark, sf)
      .select(cols.map(col): _*)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streamed history diverges from the batch history")
  }

  test("kill-at-every-batch: MERGE state maintenance converges from " +
      "every crash position to the batch snapshot") {
    val table = writeChangeTable()
    val pv = quarterSpan(table, "change_version")
    crashMatrix("merge") { (root, hook) =>
      graft.streaming.StreamingMerge.maintain(spark, table,
        "change_version", "invoice_id", "change_operation",
        s"$root/state", s"$root/ckpt", pageVersions = pv,
        onBatchMerged = hook)
    } { root =>
      graft.streaming.StreamingMerge.stateTable(spark, s"$root/state")
        .select($"invoice_id", $"change_version", $"change_operation")
        .as[(Long, Long, String)].collect().toSet
    }
    // probe target == batch snapshot
    val want = graft.cdc.Merge.liveSnapshot(spark, sf, Long.MaxValue)
      .select($"invoice_id", $"change_version", $"change_operation")
      .as[(Long, Long, String)].collect().toSet
    val root = tmpDir("cm-merge-truth")
    graft.streaming.StreamingMerge.maintain(spark, table,
      "change_version", "invoice_id", "change_operation",
      s"$root/state", s"$root/ckpt", pageVersions = pv)
      .awaitTermination(180000)
    val got = graft.streaming.StreamingMerge
      .stateTable(spark, s"$root/state")
      .select($"invoice_id", $"change_version", $"change_operation")
      .as[(Long, Long, String)].collect().toSet
    assert(got == want, "streamed state diverges from the batch snapshot")
  }

  test("kill-at-every-batch: the end-to-end CDC delivery pipeline " +
      "redelivers exactly once from every crash position") {
    crashMatrix("pipeline") { (root, hook) =>
      graft.streaming.CdcPipeline.deliver(spark, sf, s"$root/sink",
        s"$root/err", s"$root/ckpt", pageVersions = 350L,
        onBatchDelivered = hook)
    } { root =>
      // the idempotent read collapses the crashed batch's double
      // append; the collapsed document set is the exactly-once effect
      graft.sinks.DocumentSink.deduplicated(spark, s"$root/sink")
        .select($"invoice_id".cast("long"), $"change_version".cast("long"))
        .as[(Long, Long)].collect().toSet
    }
  }

  test("kill-at-every-batch, BOTH crash windows: the unified agg-view " +
      "maintainer (4 families, shared log) converges from every position") {
    import graft.streaming.StreamingAggView
    // stage four pages once; every matrix cell drains the same feed
    // through its own state root + checkpoint
    val stageRoot = tmpDir("cm-aggview-src")
    val src = s"$stageRoot/src"
    val fs = new org.apache.hadoop.fs.Path(stageRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pages = Seq((0L, 700L), (700L, 1500L), (1500L, 2500L),
      (2500L, Long.MaxValue))
    pages.zipWithIndex.foreach { case ((lo, hi), i) =>
      val tmp = s"$stageRoot/stage-$i"
      graft.cdc.TombstoneCdc.changedInvoicesOps(spark, sf, lo, hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.startsWith("part-")).get
      fs.mkdirs(new org.apache.hadoop.fs.Path(src))
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$src/page-$i.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
    // window "append": kill between the shared log append and the
    // folds (the torn partition the gen-stamp protocol exists for);
    // window "fold": kill after every fold, before the checkpoint
    // commit (full redelivery — every fold must skip on its stamp)
    for (window <- Seq("append", "fold")) {
      crashMatrix(s"aggview-$window") { (root, hook) =>
        StreamingAggView.maintain(spark, sf, src, s"$root/state",
          s"$root/ck", countSum = true, minMax = true, sketch = true,
          topk = true,
          onLogAppended = if (window == "append") hook else _ => (),
          onBatchFolded = if (window == "fold") hook else _ => ())
      } { root =>
        Seq(
          "cs" -> StreamingAggView.currentView(spark, s"$root/state"),
          "mm" -> StreamingAggView.currentMinMaxView(spark, s"$root/state"),
          "sk" -> StreamingAggView.currentSketchView(spark, s"$root/state"),
          "tk" -> StreamingAggView.currentTopKView(spark, s"$root/state"))
          .flatMap { case (fam, df) =>
            df.collect().map(r => fam + "|" + r.toSeq.map {
              // binary sketch payloads canonicalize to hex — the
              // default toString is the JVM array identity, which can
              // never compare equal across runs
              case b: Array[Byte] => b.map("%02x".format(_)).mkString
              case v => String.valueOf(v)
            }.mkString(","))
          }.toSet
      }
    }
  }

  /** The event-time session stream under the matrix: the feed replays
    * one file per batch (three event-id pages + the flush sentinel) so
    * per-entity state genuinely crosses micro-batch boundaries, the
    * kill fires in foreachBatch AFTER the batch_id-partitioned sink
    * overwrite but BEFORE the checkpoint commit (the redelivery
    * window; dynamic partition overwrite is the idempotence), and the
    * state itself — including the armed event-time timers — lives in
    * Spark's checkpointed state store, so every cell also exercises
    * state-store version replay, not just graft's own two-phase
    * protocols. The probe truth is additionally pinned against the
    * deterministic batch fold. */
  test("kill-at-every-batch: the event-time session stream converges " +
      "from every crash position to the batch fold") {
    import graft.streaming.{FeedEvent, Sessionize}
    import org.apache.spark.sql.types.StructType
    val feedSchema = StructType.fromDDL(
      "eventId BIGINT, tsMicros BIGINT, userId BIGINT, " +
        "eventType STRING, value DOUBLE")
    val sinkSchema = StructType.fromDDL(
      "userId BIGINT, firstVersion BIGINT, lastVersion BIGINT, " +
        "nEvents BIGINT, valueSumCents BIGINT, batch_id BIGINT")
    val ev = Tables.events(spark, sf).select(
      col("event_id").as("eventId"),
      unix_micros(col("ts")).as("tsMicros"),
      col("user_id").as("userId"),
      col("event_type").as("eventType"),
      col("value"))
    val Array(minId, maxId, t0, t1) = ev
      .agg(min($"eventId"), max($"eventId"),
        min($"tsMicros"), max($"tsMicros"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    // gap > the whole event-time span → one session per entity (the
    // declared stream_session_state geometry); flush one gap past the
    // last event so every timer is strictly below the final watermark
    val gapMs = (t1 - t0) / 1000L + 1000L
    val third = (maxId - minId) / 3 + 1
    val flushPage = Seq((-1L, t1 + (gapMs + 1000L) * 1000L, -1L,
      "flush", 0.0)).toDF("eventId", "tsMicros", "userId",
      "eventType", "value")
    def launch(root: String, hook: Long => Unit): StreamingQuery = {
      val src = s"$root/src"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val pages = (0 until 3).map(i => ev
        .filter($"eventId" >= minId + i * third &&
          $"eventId" < minId + (i + 1) * third)) :+ flushPage
      pages.zipWithIndex.foreach { case (df, i) =>
        val tmp = s"$root/stage-$i"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
          .map(_.getPath).find(_.getName.startsWith("part-")).get
        fs.mkdirs(new org.apache.hadoop.fs.Path(src))
        fs.rename(part, new org.apache.hadoop.fs.Path(s"$src/page-$i.parquet"))
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
      val feed = spark.readStream.schema(feedSchema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .withColumn("__ts", timestamp_micros(col("tsMicros")))
        .withWatermark("__ts", "0 seconds")
        .as[FeedEvent]
      Sessionize.sessionStreamEventTime(feed, gapMs)
        .toDF.writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ck")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.withColumn("batch_id", lit(id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(s"$root/sink")
          hook(id)
          ()
        }.start()
    }
    def sessions(root: String): Set[(Long, Long, Long, Long, Long)] =
      spark.read.schema(sinkSchema).parquet(s"$root/sink")
        .filter($"userId" =!= -1L)
        .select($"userId", $"firstVersion", $"lastVersion",
          $"nEvents", $"valueSumCents")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    crashMatrix("session")(launch)(sessions)
    // the matrix's convergence target itself equals the deterministic
    // batch fold (one session per entity, events in eventId order)
    val want = Sessionize.batchFold(spark, ev.as[FeedEvent])
      .collect().map(s => (s.userId, s.firstVersion, s.lastVersion,
        s.nEvents, s.valueSumCents)).toSet
    val root = tmpDir("cm-session-truth")
    assert(launch(root, _ => ()).awaitTermination(180000),
      "session truth drain timed out")
    assert(sessions(root) == want,
      "paged session stream diverges from the batch fold")
  }

  test("kill-at-every-batch: streaming near-dedup accepts the same " +
      "corpus from every crash position") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val feedDir = tmpDir("cm-snd-feed")
    docs.withColumn("change_version", $"doc_id" + 1)
      .write.mode("overwrite").parquet(feedDir)
    def stream() = spark.readStream.format("graft-cdc")
      .option("path", feedDir)
      .option("entityColumn", "doc_id")
      .option("versionColumn", "change_version")
      .option("maxVersionsPerBatch", "125")
      .load()
      .select(col("entity_id").as("doc_id"))
      .join(docs, Seq("doc_id"))
    crashMatrix("neardedup") { (root, hook) =>
      graft.streaming.StreamingNearDedup.flow(stream(),
        s"$root/state", s"$root/ckpt", onBatchDone = hook)
    } { root =>
      graft.streaming.StreamingNearDedup.accepted(spark, s"$root/state",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType))))
        .select($"doc_id").as[Long].collect().toSet
    }
  }
}
