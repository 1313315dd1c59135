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

  test("kill-at-every-batch OVER THE MANIFEST PROTOCOL: MERGE state " +
      "maintenance converges from every crash position with DirSwap's " +
      "scheme gate routed to ManifestSwap (round-12 verdict ask #1: " +
      "the crash matrix replayed over the object-store publish path)") {
    val table = writeChangeTable()
    val pv = quarterSpan(table, "change_version")
    graft.streaming.DirSwap.forceManifest = true
    try {
      crashMatrix("mfmerge") { (root, hook) =>
        graft.streaming.StreamingMerge.maintain(spark, table,
          "change_version", "invoice_id", "change_operation",
          s"$root/state", s"$root/ckpt", pageVersions = pv,
          onBatchMerged = hook)
      } { root =>
        // sanity: the state table really IS manifest-published
        assert(new java.io.File(s"$root/state/_ptr").exists(),
          "state table not under the manifest protocol")
        graft.streaming.StreamingMerge.stateTable(spark, s"$root/state")
          .select($"invoice_id", $"change_version", $"change_operation")
          .as[(Long, Long, String)].collect().toSet
      }
      // probe target == batch snapshot, same pin as the rename-mode cell
      val want = graft.cdc.Merge.liveSnapshot(spark, sf, Long.MaxValue)
        .select($"invoice_id", $"change_version", $"change_operation")
        .as[(Long, Long, String)].collect().toSet
      val root = tmpDir("cm-mfmerge-truth")
      graft.streaming.StreamingMerge.maintain(spark, table,
        "change_version", "invoice_id", "change_operation",
        s"$root/state", s"$root/ckpt", pageVersions = pv)
        .awaitTermination(180000)
      val got = graft.streaming.StreamingMerge
        .stateTable(spark, s"$root/state")
        .select($"invoice_id", $"change_version", $"change_operation")
        .as[(Long, Long, String)].collect().toSet
      assert(got == want,
        "manifest-published state diverges from the batch snapshot")
    } finally graft.streaming.DirSwap.forceManifest = false
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

  test("kill-at-every-batch OVER THE MANIFEST PROTOCOL, BOTH crash " +
      "windows: the unified agg-view maintainer (4 families, " +
      "keyed-generation log — round-14: the log was the one append " +
      "root the protocol guard missed) converges from every position") {
    import graft.streaming.StreamingAggView
    val stageRoot = tmpDir("cm-mfaggview-src")
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
    graft.streaming.DirSwap.forceManifest = true
    try {
      for (window <- Seq("append", "fold")) {
        crashMatrix(s"mfaggview-$window") { (root, hook) =>
          StreamingAggView.maintain(spark, sf, src, s"$root/state",
            s"$root/ck", countSum = true, minMax = true, sketch = true,
            topk = true,
            onLogAppended = if (window == "append") hook else _ => (),
            onBatchFolded = if (window == "fold") hook else _ => ())
        } { root =>
          // sanity: the log really IS a keyed manifest root (batch
          // appends as generations), not an in-place partition dir
          assert(new java.io.File(s"$root/state/log/_ptr").exists(),
            "the aggview log did not publish through the manifest")
          Seq(
            "cs" -> StreamingAggView.currentView(spark, s"$root/state"),
            "mm" -> StreamingAggView.currentMinMaxView(spark, s"$root/state"),
            "sk" -> StreamingAggView.currentSketchView(spark, s"$root/state"),
            "tk" -> StreamingAggView.currentTopKView(spark, s"$root/state"))
            .flatMap { case (fam, df) =>
              df.collect().map(r => fam + "|" + r.toSeq.map {
                case b: Array[Byte] => b.map("%02x".format(_)).mkString
                case v => String.valueOf(v)
              }.mkString(","))
            }.toSet
        }
      }
    } finally graft.streaming.DirSwap.forceManifest = false
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
        .toDF().writeStream
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

  // ------------------------------------------------- DirSwap-site matrix --
  //
  // Every two-phase directory install in the repo, killed at every
  // crash window, asserting converge-on-retry. Coverage of the full
  // DirSwap user list:
  //
  // | site (tag)                                   | covered by            |
  // |----------------------------------------------|-----------------------|
  // | change-table retention rewrite ("retain")    | dirSwapMatrix below   |
  // | document-sink compaction ("compact")         | dirSwapMatrix below   |
  // | vector-index retrain ("vecidx")              | dirSwapMatrix below   |
  // | postings compaction ("postings")             | dirSwapMatrix below   |
  // | postings append df fold ("postingsdf")       | append matrix below   |
  // | z-order rebuild ("zorder")                   | dirSwapMatrix below   |
  // | staged-append ledger commit ("appledger":    | staged-append tests   |
  // |   z-order / bucketed-vector / IVF-PQ ingest) | below                 |
  // | materialized-view refresh ("mview" per       | mview test below +    |
  // |   bucket since r12; was dyn. overwrite)      | HealRace live cell    |
  // | CorpusCache publish (atomic rename)          | cache test below      |
  // | streaming merge/SCD2 state ("merge")         | kill-at-every-batch   |
  // |                                              | above + torn-swap     |
  // |                                              | restore specs         |
  // | agg-view view/state/log ("aggview*")         | both-window matrix    |
  // |                                              | above + AggViewSpec   |

  /** Kill one DirSwap-installing maintenance op at every swap window;
    * the retried op must converge to the never-crashed truth.
    * `mkSite(root)` stages a fresh fixture, returning the op and a
    * canonical read-back. */
  private def dirSwapMatrix[T](site: String, tag: String)
      (mkSite: String => (() => Unit, () => T)): Unit = {
    val windows = Seq("beforeInstall", "afterMoveAside", "beforeBakDrop")
    val (op0, read0) = mkSite(tmpDir(s"dsm-$site-clean"))
    op0()
    val truth = read0()
    for (w <- windows) {
      val (op, read) = mkSite(tmpDir(s"dsm-$site-$w"))
      graft.streaming.DirSwap.failpoint = Some((tag, w))
      try {
        val e = intercept[Exception] { op() }
        assert(msgs(e).exists(_.contains("graft failpoint")),
          s"$site/$w: op failed for another reason: ${msgs(e)}")
      } finally graft.streaming.DirSwap.failpoint = None
      op() // the converging retry
      assert(read() == truth, s"$site/$w: retry did not converge")
    }
  }

  private def changePages(n: Int) = {
    val feed = Tables.events(spark, sf).select(
      col("user_id").as("entity_id"),
      col("event_id").as("change_version"),
      element_at(array(lit("I"), lit("U"), lit("D")),
        (col("event_id") % 3 + 1).cast("int")).as("change_operation"))
    (0 until n).map { i =>
      feed.filter(col("change_version") > i * 200L &&
        col("change_version") <= (i + 1) * 200L)
    }
  }

  test("DirSwap matrix: change-table retention rewrite converges " +
      "from a kill at every swap window") {
    dirSwapMatrix[Set[(Long, Long, String)]]("retain", "retain") { root =>
      val changeDir = s"$root/chg"
      changePages(5).foreach(_.write.mode("append").parquet(changeDir))
      (() => graft.cdc.Maintenance.maintainChangeTable(spark, changeDir,
        watermark = 200L, compactUpTo = 600L, nFiles = 4),
       () => spark.read.parquet(changeDir)
        .select($"entity_id", $"change_version", $"change_operation")
        .as[(Long, Long, String)].collect().toSet)
    }
  }

  test("DirSwap matrix: document-sink compaction converges from a " +
      "kill at every swap window") {
    dirSwapMatrix[Set[(Long, Long)]]("sink", "compact") { root =>
      val sinkDir = s"$root/sink"; val errDir = s"$root/err"
      changePages(3).foreach { p =>
        graft.sinks.DocumentSink.writeVersioned(
          p.select(col("entity_id").as("invoice_id"),
            concat(lit("INV-"), lpad(col("entity_id").cast("string"),
              9, "0")).as("invoice_number"),
            col("change_version")),
          sinkDir, errDir)
      }
      (() => graft.sinks.DocumentSink.compact(spark, sinkDir),
       () => graft.sinks.DocumentSink.deduplicated(spark, sinkDir)
        .select($"invoice_id", $"change_version")
        .as[(Long, Long)].collect().toSet)
    }
  }

  test("DirSwap matrix: vector-index retrain converges from a kill " +
      "at every swap window") {
    // float retrain is summation-order-dependent, so the read-back is
    // the layout's structural invariants (codes, ids, codebook shape,
    // a served probe's row count), not float-exact contents
    dirSwapMatrix[(Long, Long, Long, Long)]("vecidx", "vecidx") { root =>
      val embDir = s"$root/emb"
      Tables.embeddings(spark, sf).limit(256)
        .write.mode("overwrite").parquet(embDir)
      val vi = graft.cdc.Maintenance.VectorIndex(embDir, s"$root/layout")
      graft.cdc.Maintenance.maintainVectorIndex(spark, vi) // initial build
      (() => graft.cdc.Maintenance.maintainVectorIndex(spark, vi),
       () => {
        val emb = spark.read.parquet(embDir)
        val cb = spark.read.parquet(s"$root/layout/_codebook")
        val codes = spark.read.parquet(s"$root/layout")
        val served = graft.llm.Pq.ivfPqTopK(emb, s"$root/layout", cb,
          "vec_id", "embedding", queryId = emb.select(min($"vec_id"))
            .head().getLong(0), k = 5, m = 8, dims = 64, ks = 16,
          planes = 6, probeHamming = 3, overfetch = 6)
        (codes.count(), codes.select($"vec_id").distinct().count(),
          cb.count(), served.count())
      })
    }
  }

  test("DirSwap matrix: postings compaction converges from a kill at " +
      "every swap window") {
    val docs = Tables.documents(spark, sf)
    dirSwapMatrix[(Set[(String, Long, Long)], Long)](
        "postings", "postings") { root =>
      val idx = s"$root/idx"
      graft.llm.SimSearch.buildPostingsIndex(
        docs.filter($"doc_id" % 2 === 0), "doc_id", "text", idx)
      graft.llm.SimSearch.appendPostingsIndex(
        docs.filter($"doc_id" % 2 === 1), "doc_id", "text", idx)
      (() => graft.llm.SimSearch.compactPostingsIndex(spark, idx),
       () => (spark.read.parquet(s"$idx/postings")
          .select($"term", $"doc_id", $"tf")
          .as[(String, Long, Long)].collect().toSet,
        spark.read.parquet(s"$idx/df")
          .agg(sum($"df")).head().getLong(0)))
    }
  }

  test("DirSwap matrix: z-order rebuild converges from a kill at " +
      "every swap window") {
    import graft.ops.ZOrder
    val pages = changePages(2).map(_.toDF())
    val dims = Seq(ZOrder.Dim("entity_id", 0L, 1000L),
      ZOrder.Dim("change_version", 0L, 1000L))
    dirSwapMatrix[Set[(Long, Long)]]("zorder", "zorder") { root =>
      val zdir = s"$root/layout"
      ZOrder.layoutN(pages(0), zdir, dims, 2)
      ZOrder.appendN(pages(1), zdir, dims, 2)
      (() => ZOrder.rebuild(spark, zdir, dims, 2),
       () => spark.read.parquet(zdir)
        .select($"entity_id", $"change_version")
        .as[(Long, Long)].collect().toSet)
    }
  }

  test("postings append: a kill at every commit window (and in the " +
      "publish gap) neither loses nor double-counts the batch") {
    val docs = Tables.documents(spark, sf)
    val base = docs.filter($"doc_id" % 2 === 0)
    val batch = docs.filter($"doc_id" % 2 === 1)
    def readAll(idx: String) = (
      spark.read.parquet(s"$idx/postings")
        .select($"term", $"doc_id", $"tf")
        .as[(String, Long, Long)].collect().toSet,
      spark.read.parquet(s"$idx/df").filter(!$"term".isNull)
        .select($"term", $"df").as[(String, Long)].collect().toSet,
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(idx, "df", "_N"))).trim.toLong)
    // truth: one clean append
    val clean = tmpDir("dsm-papp-clean") + "/idx"
    graft.llm.SimSearch.buildPostingsIndex(base, "doc_id", "text", clean)
    graft.llm.SimSearch.appendPostingsIndex(batch, "doc_id", "text", clean)
    val truth = readAll(clean)
    for (w <- Seq("beforeInstall", "afterMoveAside", "beforeBakDrop")) {
      val idx = tmpDir(s"dsm-papp-$w") + "/idx"
      graft.llm.SimSearch.buildPostingsIndex(base, "doc_id", "text", idx)
      graft.streaming.DirSwap.failpoint = Some(("postingsdf", w))
      try {
        val e = intercept[Exception] {
          graft.llm.SimSearch.appendPostingsIndex(
            batch, "doc_id", "text", idx)
        }
        assert(msgs(e).exists(_.contains("graft failpoint")),
          s"papp/$w: failed for another reason: ${msgs(e)}")
      } finally graft.streaming.DirSwap.failpoint = None
      // beforeBakDrop leaves the commit LIVE but unpublished — the
      // exact df-counts-rows-the-read-misses window; serving must
      // self-heal it before scoring (recoverPendingPostings)
      if (w == "beforeBakDrop") {
        val healed = graft.llm.SimSearch.hybridTopKIndexed(
          Tables.embeddings(spark, sf), idx, "doc_id", "vec_id",
          "embedding", Seq("spark", "join", "window"), 0L, 20)
          .collect().map(_.toSeq).toSeq
        val truthServe = graft.llm.SimSearch.hybridTopKIndexed(
          Tables.embeddings(spark, sf), clean, "doc_id", "vec_id",
          "embedding", Seq("spark", "join", "window"), 0L, 20)
          .collect().map(_.toSeq).toSeq
        assert(healed == truthServe,
          "serving over the commit-live/unpublished window diverged")
      }
      // the converging retry — and a THIRD call must be a no-op
      // (the double-count hazard the protocol exists for)
      graft.llm.SimSearch.appendPostingsIndex(batch, "doc_id", "text", idx)
      assert(readAll(idx) == truth, s"papp/$w: retry did not converge")
      graft.llm.SimSearch.appendPostingsIndex(batch, "doc_id", "text", idx)
      assert(readAll(idx) == truth,
        s"papp/$w: an already-applied retry re-folded the batch")
    }
  }

  test("concurrent healers: a committed-but-unpublished window " +
      "survives 8 racing recover calls on the SERVING path (the " +
      "round-9 TOCTOU: a lost rename re-checked, not thrown)") {
    import graft.llm.SimSearch
    val docs = Tables.documents(spark, sf)
    val base = docs.filter($"doc_id" % 2 === 0)
    val batch = docs.filter($"doc_id" % 2 === 1)
    def postings(idx: String) = spark.read.parquet(s"$idx/postings")
      .select($"term", $"doc_id", $"tf")
      .as[(String, Long, Long)].collect().toSet
    val clean = tmpDir("race-clean") + "/idx"
    SimSearch.buildPostingsIndex(base, "doc_id", "text", clean)
    SimSearch.appendPostingsIndex(batch, "doc_id", "text", clean)
    // stage the exact window: commit live, publish pending
    val idx = tmpDir("race-idx") + "/idx"
    SimSearch.buildPostingsIndex(base, "doc_id", "text", idx)
    graft.streaming.DirSwap.failpoint = Some(("postingsdf", "beforeBakDrop"))
    try intercept[Exception] {
      SimSearch.appendPostingsIndex(batch, "doc_id", "text", idx)
    } finally graft.streaming.DirSwap.failpoint = None
    graft.streaming.DirSwap.restoreIfTorn(spark, s"$idx/df", "postingsdf")
    // 8 concurrent readers all heal the same tag: every rename race
    // must resolve to "the other healer won", never an IOException
    def hammer(body: => Unit): Seq[Throwable] = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val gate = new java.util.concurrent.CountDownLatch(1)
      val tasks = (1 to 8).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            gate.await()
            try body catch { case t: Throwable => errs.add(t) }
          }
        })
      }
      gate.countDown()
      tasks.foreach(_.get())
      pool.shutdown()
      errs.toArray(Array.empty[Throwable]).toSeq
    }
    val errs = hammer(SimSearch.recoverPendingPostings(spark, idx))
    assert(errs.isEmpty,
      s"racing postings healers threw: ${errs.map(_.toString).mkString("; ")}")
    assert(postings(idx) == postings(clean),
      "racing healers corrupted the published postings")
    // same race on the generic staged-append healer (bucketed layout)
    val emb = Tables.embeddings(spark, sf)
    val vbase = emb.filter($"vec_id" % 2 === 0)
    val vbatch = emb.filter($"vec_id" % 2 === 1)
    def ids(path: String) = spark.read.parquet(path)
      .select($"vec_id").as[Long].collect().toSeq.sorted
    val vclean = tmpDir("race-sa-clean") + "/layout"
    SimSearch.writeBucketed(vbase, "vec_id", "embedding", 4, vclean)
    SimSearch.appendBucketed(vbatch, "vec_id", "embedding", 4, vclean)
    val layout = tmpDir("race-sa") + "/layout"
    SimSearch.writeBucketed(vbase, "vec_id", "embedding", 4, layout)
    graft.streaming.DirSwap.failpoint = Some(("appledger", "beforeBakDrop"))
    try intercept[Exception] {
      SimSearch.appendBucketed(vbatch, "vec_id", "embedding", 4, layout)
    } finally graft.streaming.DirSwap.failpoint = None
    val errs2 = hammer(graft.streaming.StagedAppend.recover(spark, layout))
    assert(errs2.isEmpty,
      s"racing staged-append healers threw: ${errs2.map(_.toString).mkString("; ")}")
    assert(ids(layout) == ids(vclean),
      "racing staged-append healers corrupted the layout")
    // and the torn-swap healer itself: every serving read runs
    // restoreIfTorn first, so N readers arriving inside a torn window
    // all race the bak → dir rename; the losers must treat the
    // winner's restore as success (local-fs rename THROWS FNF when
    // the source vanished, it does not return false)
    val swapDir = tmpDir("race-swap") + "/state"
    def writeOne(dir: String): Unit =
      Seq(1L).toDF("v").write.mode("overwrite").parquet(dir)
    graft.streaming.DirSwap.install(spark, swapDir, "racetag")(writeOne)
    graft.streaming.DirSwap.failpoint = Some(("racetag", "afterMoveAside"))
    try intercept[Exception] {
      graft.streaming.DirSwap.install(spark, swapDir, "racetag")(writeOne)
    } finally graft.streaming.DirSwap.failpoint = None
    val errs3 = hammer(
      graft.streaming.DirSwap.restoreIfTorn(spark, swapDir, "racetag"))
    assert(errs3.isEmpty,
      s"racing torn-swap healers threw: ${errs3.map(_.toString).mkString("; ")}")
    assert(spark.read.parquet(swapDir).count() == 1,
      "racing torn-swap healers lost the sole surviving generation")
  }

  test("staged append (bucketed vector layout): a kill at every " +
      "protocol window neither loses nor double-ingests the batch") {
    import graft.llm.SimSearch
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter($"vec_id" % 2 === 0)
    val batch = emb.filter($"vec_id" % 2 === 1)
    def ids(path: String) = spark.read.parquet(path)
      .select($"vec_id").as[Long].collect().toSeq.sorted
    def idsWithDups(path: String) = spark.read.parquet(path)
      .select($"vec_id").as[Long].collect().length
    // truth: one clean build + append
    val clean = tmpDir("sa-clean") + "/layout"
    SimSearch.writeBucketed(base, "vec_id", "embedding", 4, clean)
    SimSearch.appendBucketed(batch, "vec_id", "embedding", 4, clean)
    val truth = ids(clean)
    assert(truth.distinct == truth, "clean fixture already has dups")
    // the three ledger-commit windows: post-stage/pre-commit,
    // torn-ledger, committed/unpublished
    for (w <- Seq("beforeInstall", "afterMoveAside", "beforeBakDrop")) {
      val layout = tmpDir(s"sa-$w") + "/layout"
      SimSearch.writeBucketed(base, "vec_id", "embedding", 4, layout)
      graft.streaming.DirSwap.failpoint = Some(("appledger", w))
      try {
        val e = intercept[Exception] {
          SimSearch.appendBucketed(batch, "vec_id", "embedding", 4, layout)
        }
        assert(msgs(e).exists(_.contains("graft failpoint")),
          s"sa/$w: failed for another reason: ${msgs(e)}")
      } finally graft.streaming.DirSwap.failpoint = None
      SimSearch.appendBucketed(batch, "vec_id", "embedding", 4, layout)
      assert(ids(layout) == truth, s"sa/$w: retry did not converge")
      // an already-applied retry must be a no-op — the double-count
      // hazard the ledger exists for
      SimSearch.appendBucketed(batch, "vec_id", "embedding", 4, layout)
      assert(idsWithDups(layout) == truth.size,
        s"sa/$w: an already-applied retry re-ingested the batch")
    }
  }

  test("staged append generations: the IVF-PQ retrain supersedes a " +
      "committed-but-unpublished append instead of replaying it") {
    import graft.cdc.Maintenance
    val root = tmpDir("sa-gen")
    val embDir = s"$root/emb"
    // deployment-true fixture: the layout is built from the base
    // corpus, the corpus then GROWS by the batch (ingest appends to
    // corpus and index alike), and the retrain later re-encodes the
    // grown corpus — so the batch is genuinely new to the layout at
    // append time (the membership guard would correctly no-op an
    // append of rows the layout already holds)
    val all = Tables.embeddings(spark, sf).limit(200).localCheckpoint(true)
    val batch = all.filter($"vec_id" % 7 === 3)
    all.filter($"vec_id" % 7 =!= 3)
      .write.mode("overwrite").parquet(embDir)
    val vi = Maintenance.VectorIndex(embDir, s"$root/layout")
    Maintenance.maintainVectorIndex(spark, vi) // initial build (mints gen)
    all.write.mode("overwrite").parquet(embDir) // corpus grows
    val cb = graft.llm.Pq.indexCodebook(spark, vi.layoutPath)
    // commit the append but crash before publish
    graft.streaming.DirSwap.failpoint = Some(("appledger", "beforeBakDrop"))
    try intercept[Exception] {
      graft.llm.Pq.appendIvfPq(batch, "vec_id", "embedding", cb,
        8, 64, 6, vi.layoutPath)
    } finally graft.streaming.DirSwap.failpoint = None
    // maintenance retrains from the FULL corpus (which contains the
    // batch's vectors) and mints a fresh generation
    Maintenance.maintainVectorIndex(spark, vi)
    // the next append runs recover first — the superseded pending
    // must be SWEPT, not replayed into the new layout
    graft.streaming.StagedAppend.recover(spark, vi.layoutPath)
    val served = spark.read.parquet(vi.layoutPath)
      .select($"vec_id").as[Long].collect().toSeq
    assert(served.distinct.size == served.size,
      "a superseded staged append was replayed into the new layout")
    assert(served.size == all.count(),
      "the retrained layout must hold exactly the corpus")
    val stale = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.startsWith("layout.pending-"))
    assert(stale.isEmpty, "superseded pending dirs must be swept")
  }

  test("staged append generations: a retry that STRADDLES a retrain " +
      "(crash BEFORE the ledger commit) does not double-ingest the " +
      "batch the retrain already covered") {
    import graft.cdc.Maintenance
    val root = tmpDir("sa-straddle")
    val embDir = s"$root/emb"
    val all = Tables.embeddings(spark, sf).limit(200).localCheckpoint(true)
    val batch = all.filter($"vec_id" % 7 === 3)
    all.filter($"vec_id" % 7 =!= 3)
      .write.mode("overwrite").parquet(embDir)
    val vi = Maintenance.VectorIndex(embDir, s"$root/layout")
    Maintenance.maintainVectorIndex(spark, vi)
    all.write.mode("overwrite").parquet(embDir) // corpus grows
    // the round-9 ADVICE window: crash BEFORE the ledger commit — the
    // stage exists but NO tag is recorded anywhere, so neither the new
    // ledger nor the generation sweep knows about this batch
    graft.streaming.DirSwap.failpoint = Some(("appledger", "beforeInstall"))
    try {
      val e = intercept[Exception] {
        graft.llm.Pq.appendIvfPq(batch, "vec_id", "embedding",
          graft.llm.Pq.indexCodebook(spark, vi.layoutPath),
          8, 64, 6, vi.layoutPath)
      }
      assert(msgs(e).exists(_.contains("graft failpoint")),
        s"straddle: failed for another reason: ${msgs(e)}")
    } finally graft.streaming.DirSwap.failpoint = None
    // the intervening retrain re-encodes the grown corpus — batch
    // included — and mints a fresh generation
    Maintenance.maintainVectorIndex(spark, vi)
    // the appender's retry: without the membership guard this would
    // re-stage under the new generation and double-ingest the batch
    graft.llm.Pq.appendIvfPq(batch, "vec_id", "embedding",
      graft.llm.Pq.indexCodebook(spark, vi.layoutPath),
      8, 64, 6, vi.layoutPath)
    val served = spark.read.parquet(vi.layoutPath)
      .select($"vec_id").as[Long].collect().toSeq
    assert(served.distinct.size == served.size,
      "a retry straddling the retrain double-ingested the batch")
    assert(served.size == all.count(),
      "the layout must hold exactly the grown corpus")
  }

  test("staged append contentTag: multiset-distinct batches get " +
      "distinct tags (duplicate rows must not xor-cancel)") {
    // {r1, r1, b} vs {r2, r2, b}: the duplicated rows self-cancel in
    // a pure bit_xor fingerprint, so both batches would share b's tag
    // and the second would be silently skipped as already-applied —
    // the round-9 ADVICE data-loss shape. The sum component breaks it.
    def tag(rows: (String, Int)*): String =
      graft.streaming.StagedAppend.contentTag(
        rows.toSeq.toDF("k", "v")).get
    val t1 = tag(("r1", 1), ("r1", 1), ("b", 0))
    val t2 = tag(("r2", 2), ("r2", 2), ("b", 0))
    assert(t1 != t2, "duplicate rows xor-cancelled into a shared tag")
    // and the tag stays a pure function of the multiset (retry anchor)
    assert(tag(("b", 0), ("r1", 1), ("r1", 1)) == t1,
      "tag must be order-independent")
  }

  test("staged append: ledgers written before the multiset-tag " +
      "upgrade still recognize their batches (legacy alias, both " +
      "protocols)") {
    import graft.llm.SimSearch
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    // bucketed-layout protocol: ledger at <layout>.applied/tags
    val emb = Tables.embeddings(spark, sf)
    val layout = tmpDir("sa-legacy") + "/layout"
    SimSearch.writeBucketed(emb.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", 4, layout)
    SimSearch.appendBucketed(emb.filter($"vec_id" % 2 === 1),
      "vec_id", "embedding", 4, layout)
    val n = spark.read.parquet(layout).count()
    val tagsPath = java.nio.file.Paths.get(layout + ".applied", "tags")
    val downgraded = new String(
      java.nio.file.Files.readAllBytes(tagsPath), utf8)
      .linesIterator.filter(_.nonEmpty).map { full =>
        val t = full.stripPrefix("g0-")
        "g0-" + graft.streaming.StagedAppend.legacyTag(t)
          .getOrElse(fail(s"not a new-format tag: $full"))
      }.mkString("\n")
    java.nio.file.Files.write(tagsPath, downgraded.getBytes(utf8))
    // an at-least-once redelivery spanning the upgrade must be a no-op
    SimSearch.appendBucketed(emb.filter($"vec_id" % 2 === 1),
      "vec_id", "embedding", 4, layout)
    assert(spark.read.parquet(layout).count() == n,
      "a legacy-committed batch was re-ingested after the tag upgrade")
    // postings protocol: raw tags in df/_APPLIED
    val docs = Tables.documents(spark, sf)
    val idx = tmpDir("papp-legacy") + "/idx"
    SimSearch.buildPostingsIndex(docs.filter($"doc_id" % 2 === 0),
      "doc_id", "text", idx)
    SimSearch.appendPostingsIndex(docs.filter($"doc_id" % 2 === 1),
      "doc_id", "text", idx)
    val nPost = spark.read.parquet(s"$idx/postings").count()
    val ap = java.nio.file.Paths.get(idx, "df", "_APPLIED")
    val down2 = new String(java.nio.file.Files.readAllBytes(ap), utf8)
      .linesIterator.filter(_.nonEmpty).map { t =>
        graft.streaming.StagedAppend.legacyTag(t)
          .getOrElse(fail(s"not a new-format tag: $t"))
      }.mkString("\n")
    java.nio.file.Files.write(ap, down2.getBytes(utf8))
    SimSearch.appendPostingsIndex(docs.filter($"doc_id" % 2 === 1),
      "doc_id", "text", idx)
    assert(spark.read.parquet(s"$idx/postings").count() == nPost,
      "a legacy-committed postings batch was re-folded after the upgrade")
  }

  test("staged append: the first post-upgrade commit RETIRES legacy " +
      "ledger lines, so an xor-aliasing NEW batch is ingested, not " +
      "silently skipped (round-10 ADVICE)") {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val layout = tmpDir("sa-retire") + "/layout"
    def append(df: org.apache.spark.sql.DataFrame): Unit =
      graft.streaming.StagedAppend.contentTag(df).foreach { t =>
        graft.streaming.StagedAppend.append(spark, layout, t) { p =>
          df.write.mode("overwrite").parquet(p)
        }
      }
    Seq((0L, "seed")).toDF("k", "v")
      .write.mode("overwrite").parquet(layout)
    // legacy-committed batch {r1, r1, b}: its duplicate rows xor-cancel,
    // so the pre-upgrade (xor, count) tag depends only on b
    append(Seq((1L, "r1"), (1L, "r1"), (9L, "b")).toDF("k", "v"))
    val tagsPath = java.nio.file.Paths.get(layout + ".applied", "tags")
    val downgraded = new String(
      java.nio.file.Files.readAllBytes(tagsPath), utf8)
      .linesIterator.filter(_.nonEmpty).map { full =>
        val t = full.stripPrefix("g0-")
        "g0-" + graft.streaming.StagedAppend.legacyTag(t)
          .getOrElse(fail(s"not a new-format tag: $full"))
      }.mkString("\n")
    java.nio.file.Files.write(tagsPath, downgraded.getBytes(utf8))
    // the aliasing NEW multiset {r2, r2, b}: same xor (its duplicates
    // cancel too), same count — under the unbounded alias this batch
    // would be dropped as already-applied forever. A post-upgrade
    // commit of an UNRELATED batch must retire the legacy line first…
    append(Seq((3L, "other")).toDF("k", "v"))
    val lines = new String(
      java.nio.file.Files.readAllBytes(tagsPath), utf8)
      .linesIterator.filter(_.nonEmpty).toSeq
    assert(lines.forall(l => !graft.streaming.StagedAppend.isLegacyLine(l)),
      s"post-upgrade commit must retire legacy ledger lines, got: $lines")
    // …after which the aliasing batch lands (pre-fix: silently skipped)
    val before = spark.read.parquet(layout).count()
    append(Seq((2L, "r2"), (2L, "r2"), (9L, "b")).toDF("k", "v"))
    assert(spark.read.parquet(layout).count() == before + 3,
      "an xor-aliasing new batch was skipped against a retired ledger")
    // postings twin: the df commit rewrites _APPLIED without legacy lines
    import graft.llm.SimSearch
    val docs = Tables.documents(spark, sf)
    val idx = tmpDir("papp-retire") + "/idx"
    SimSearch.buildPostingsIndex(docs.filter($"doc_id" % 3 === 0),
      "doc_id", "text", idx)
    SimSearch.appendPostingsIndex(docs.filter($"doc_id" % 3 === 1),
      "doc_id", "text", idx)
    val ap = java.nio.file.Paths.get(idx, "df", "_APPLIED")
    val down2 = new String(java.nio.file.Files.readAllBytes(ap), utf8)
      .linesIterator.filter(_.nonEmpty).map { t =>
        graft.streaming.StagedAppend.legacyTag(t)
          .getOrElse(fail(s"not a new-format tag: $t"))
      }.mkString("\n")
    java.nio.file.Files.write(ap, down2.getBytes(utf8))
    SimSearch.appendPostingsIndex(docs.filter($"doc_id" % 3 === 2),
      "doc_id", "text", idx)
    val lines2 = new String(java.nio.file.Files.readAllBytes(ap), utf8)
      .linesIterator.filter(_.nonEmpty).toSeq
    assert(
      lines2.forall(l => !graft.streaming.StagedAppend.isLegacyLine(l)),
      s"postings commit must retire legacy _APPLIED lines, got: $lines2")
  }

  test("ScalaCheck: contentTag is a pure function of the row multiset " +
      "— equal multisets share a tag, different multisets never do") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CheckTest}
    // a TINY row domain so duplicate rows and near-identical multisets
    // (the xor-cancellation shapes) are common in the samples
    val genRow = for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0, 2)
    } yield (k, v)
    val genBatch = Gen.choose(0, 6).flatMap(Gen.listOfN(_, genRow))
    def tag(rows: List[(String, Int)]): Option[String] =
      graft.streaming.StagedAppend.contentTag(
        rows.toDF("k", "v").repartition(rows.size.max(1)))
    val prop = forAll(genBatch, genBatch) { (m1, m2) =>
      val (t1, t2) = (tag(m1), tag(m2))
      val sameMultiset = m1.sorted == m2.sorted
      // order/partitioning independence, None exactly on empty, and
      // tag equality ⇔ multiset equality ON THESE SAMPLES. The ⇐
      // direction is structural (the tag is a pure function of the
      // multiset); the ⇒ direction is statistical — the sum loses
      // carries out of bit 63, so distinct multisets collide with
      // probability ~2^-128 over the (xor, sum) pair (round-10
      // ADVICE: the guarantee is "breaks the xor self-cancellation
      // shapes", not "no collision exists"). What this property pins
      // is that the deliberately-adversarial tiny domain (duplicate
      // rows, near-identical multisets — the shapes that DID collide
      // pre-fix) never shares a tag.
      tag(m1.reverse) == t1 && t1.isEmpty == m1.isEmpty &&
        (t1 == t2) == (sameMultiset || (m1.isEmpty && m2.isEmpty))
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, s"contentTag property failed: ${res.status}")
  }

  test("materialized-view refresh: a kill between the partition " +
      "overwrite and the stale-bucket delete converges on retry") {
    import graft.ops.MaterializedView
    // stage a mutable corpus copy: the stale window needs a bucket
    // whose every invoice disappears
    val root = tmpDir("dsm-mview")
    val corpus = s"$root/corpus"
    for (t <- Seq("orders", "lineitem"))
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$corpus/$t.parquet")
    val mv = new MaterializedView(spark, corpus, s"$root/view", nBuckets = 16)
    mv.build()
    val bucket0 = spark.read.parquet(s"$corpus/orders.parquet")
      .filter($"o_orderkey" % 16 === 0)
      .select($"o_orderkey").as[Long].collect().toSeq
    assert(bucket0.nonEmpty, "fixture needs invoices in bucket 0")
    // delete every bucket-0 invoice at the source
    val kept = spark.read.parquet(s"$corpus/orders.parquet")
      .filter($"o_orderkey" % 16 =!= 0).localCheckpoint(true)
    kept.write.mode("overwrite").parquet(s"$corpus/orders.parquet")
    MaterializedView.failAfterOverwrite = true
    try {
      val e = intercept[Exception] { mv.refresh(bucket0) }
      assert(msgs(e).exists(_.contains("graft failpoint")), msgs(e))
    } finally MaterializedView.failAfterOverwrite = false
    // torn state: bucket 0 still serves the deleted invoices
    assert(mv.read().filter($"invoice_id" % 16 === 0).count() > 0,
      "fixture did not reach the stale window")
    mv.refresh(bucket0) // the converging retry
    assert(mv.read().filter($"invoice_id" % 16 === 0).count() == 0,
      "retry did not delete the emptied bucket")
    // the flat view is the orders⋈lineitem join — an order with no
    // lines never appears in it
    val expect = spark.read.parquet(s"$corpus/orders.parquet")
      .join(spark.read.parquet(s"$corpus/lineitem.parquet"),
        $"o_orderkey" === $"l_orderkey", "left_semi").count()
    assert(mv.read().select($"invoice_id").distinct().count() == expect,
      "converged view diverged from the source")
  }

  test("CorpusCache: a kill after a complete build, before the " +
      "publish rename, rebuilds cleanly and never serves the orphan") {
    import graft.llm.CorpusCache
    val src = tmpDir("dsm-cc") + "/src.parquet"
    spark.range(100).write.mode("overwrite").parquet(src)
    val tag = s"crash-${System.nanoTime()}"
    var builds = 0
    def resolveOnce() = CorpusCache.resolve(spark, src, "graft-cctest",
        tag, Seq("_DONE")) { dir =>
      builds += 1
      dir.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(dir, "payload").toPath,
        s"gen-$builds".getBytes)
      CorpusCache.touchMarker(dir, "_DONE")
    }
    CorpusCache.failBeforePublish = true
    try {
      val e = intercept[Exception] { resolveOnce() }
      assert(msgs(e).exists(_.contains("beforePublish")), msgs(e))
    } finally CorpusCache.failBeforePublish = false
    val dir = resolveOnce()
    assert(builds == 2, s"the crashed build's orphan must not be " +
      s"served as the key — expected a rebuild, got $builds build(s)")
    assert(new java.io.File(dir, "_DONE").exists() &&
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "payload").toPath)) == "gen-2",
      "served artifact is not the completed rebuild")
    assert(resolveOnce() == dir, "steady-state resolve must serve, not build")
    assert(builds == 2, "steady-state resolve re-built")
  }

  test("the scheme gate ROUTES object-store schemes to the manifest " +
      "protocol end-to-end (round-12 verdict ask #1: the round-11 " +
      "refusal became routing), while append-style roots still refuse") {
    // S3A-style stores emulate directory rename as copy+delete; the
    // two-rename swap is unsound there. Rounds 11-12 REFUSED such
    // schemes up front; the gate now routes them to ManifestSwap
    // (immutable generations + atomic pointer commit — no rename in
    // the commit path), so the same DirSwap call sites publish safely.
    // The fake is a RawLocalFileSystem wearing the s3a scheme; the
    // PROTOCOL ops (mkdirs/create/rename/listStatus) run for real
    // through it, while the payload is written via the same fs handle
    // the real sites' write callbacks receive (a Spark parquet job
    // cannot traverse the fake scheme — RawLocal's permission loader
    // requires file: URIs — so the payload here is a plain file; the
    // protocol under test is identical).
    val conf = spark.sparkContext.hadoopConfiguration
    conf.setClass("fs.s3a.impl", classOf[FakeS3AFileSystem],
      classOf[org.apache.hadoop.fs.FileSystem])
    val local = tmpDir("s3gate")
    val root = s"s3a://bkt$local/state"
    def writePayload(text: String)(d: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(d, "data.txt")
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      try out.write(text.getBytes("UTF-8")) finally out.close()
    }
    try {
      graft.streaming.DirSwap.install(spark, root, "s3tag")(
        writePayload("gen-one"))
      // the manifest layout landed (checked on the REAL local disk the
      // fake writes through), not a rename-protocol dir
      assert(new java.io.File(s"$local/state/_ptr").isDirectory &&
        new java.io.File(s"$local/state/_gens").isDirectory,
        "install on an object-store scheme must publish via manifest")
      graft.streaming.DirSwap.restoreIfTorn(spark, root, "s3tag") // no-op
      // a second install supersedes; readPath resolves the committed
      // generation and its payload is intact
      graft.streaming.DirSwap.install(spark, root, "s3tag")(
        writePayload("gen-two"))
      val resolved = graft.streaming.DirSwap.readPath(spark, root, "s3tag")
      assert(resolved.exists(_.contains("_gens/")),
        s"readPath must resolve a generation, got $resolved")
      val gotBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths
        .get(new java.net.URI(resolved.get + "/data.txt").getPath))
      assert(new String(gotBytes, "UTF-8") == "gen-two")
      // round-14: the append-style roots ROUTE too — a staged append
      // on an object-store scheme becomes a keyed manifest generation
      // (the manifest IS the applied-batch ledger), and its retry is a
      // structural no-op that never re-stages
      val lay = s"s3a://bkt$local/lay"
      graft.streaming.StagedAppend.append(spark, lay, "batch-one")(
        writePayload("b1"))
      assert(new java.io.File(s"$local/lay/_ptr").isDirectory,
        "an object-store staged append must publish via manifest")
      assert(graft.streaming.StagedAppend.appliedTags(spark, lay) ==
        Seq("batch-one"))
      graft.streaming.StagedAppend.append(spark, lay, "batch-one")(_ =>
        fail("an applied batch was re-staged on retry"))
      assert(graft.streaming.DirSwap.readDataPaths(spark, lay)
        .forall(_.contains("_gens/")),
        "append-root reads must resolve manifest generations")
    } finally conf.unset("fs.s3a.impl")
    // the cached FakeS3AFileSystem instance stays keyed under its own
    // scheme+authority; nothing else in the suite resolves s3a paths
  }
}

/** Test stand-in for an object-store FileSystem: real local semantics
  * under the s3a scheme, so the scheme gate's ROUTING to the manifest
  * protocol runs end-to-end (the real S3A jar is not on the zero-egress
  * classpath; what the gate classifies is the scheme, and what the
  * routed protocol needs — atomic whole-file visibility — local
  * create/rename provides). */
class FakeS3AFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "s3a"
  // the gate classifies by getUri.getScheme (the never-throwing
  // identity every FileSystem carries), so the fake must fake THAT
  override def getUri: java.net.URI = java.net.URI.create("s3a://bkt/")
}
