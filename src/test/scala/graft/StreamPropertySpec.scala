package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{EventStream, FeedEvent, Sessionize}

/** ScalaCheck properties for the EVENT-TIME semantics of the streaming
  * surface (round-11 — the round-10 verdict ask): random events, random
  * micro-batch splits, lateness arising naturally from out-of-order
  * timestamps across batches. Each property checks the streaming run
  * against a pure-Scala replay of Spark's documented watermark
  * semantics, empirically pinned first (see the boundary notes inline):
  *
  *  - watermark after batch n = max event time over batches 0..n-1
  *    minus the delay (never decreasing, starts at epoch 0);
  *  - an arriving row is DROPPED iff its window end <= watermark;
  *  - an append-mode window EMITS once the watermark reaches its end
  *    (end <= wm — measured: emission happens at exact equality);
  *  - flatMapGroupsWithState EventTimeTimeout fires for a state whose
  *    re-armed timer sits strictly below the current watermark.
  *
  * The dropped-late accounting is asserted against Spark's own
  * `numRowsDroppedByWatermark` metric, not just the output. */
class StreamPropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(id: Long, ts: Long, user: Long, typ: String,
                        value: Double)

  private val qn = new java.util.concurrent.atomic.AtomicInteger(0)

  // tiny domains make collisions (same window, same user, duplicate
  // timestamps, late arrivals) common in the samples
  private def genBatches: org.scalacheck.Gen[List[List[Ev]]] = {
    import org.scalacheck.Gen
    val genEv = for {
      ts <- Gen.choose(0L, 7200L) // two hours of event time, 1 s grain
      user <- Gen.choose(1L, 4L)
      typ <- Gen.oneOf("a", "b")
      cents <- Gen.choose(0L, 40L)
    } yield Ev(0L, ts, user, typ, cents * 0.25)
    for {
      n <- Gen.choose(1, 18)
      evs <- Gen.listOfN(n, genEv)
      nBatches <- Gen.choose(1, 5)
    } yield {
      val withIds = evs.zipWithIndex.map { case (e, i) =>
        e.copy(id = i + 1L)
      }
      // random-ish but sample-derived batch split; drop empty batches
      // (an empty addData never forms a micro-batch)
      withIds.zipWithIndex
        .groupBy { case (e, i) => (i * 31 + e.ts) % nBatches }
        .toList.sortBy(_._1).map(_._2.map(_._1)).filter(_.nonEmpty)
    }
  }

  test("ScalaCheck: windowed counts under random lateness equal the " +
      "per-batch watermark replay, and dropped-late accounting matches " +
      "Spark's own metric") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Test => CheckTest}
    val delayS = 600L
    def wendS(ts: Long): Long = (ts / 3600L + 1L) * 3600L
    val prop = forAll(genBatches) { batches =>
      // ---- pure replay of the watermark semantics
      var wmMs = 0L
      var droppedRows = 0L
      var droppedGroups = 0L
      val kept = scala.collection.mutable.ArrayBuffer.empty[Ev]
      batches.foreach { b =>
        val (k, d) = b.partition(e => wendS(e.ts) * 1000L > wmMs)
        droppedRows += d.size
        // Spark's numRowsDroppedByWatermark counts post-partial-agg
        // PARTIAL rows entering the stateful operator, so same-group
        // late rows may collapse before the filter (measured): the
        // metric is bounded by [late groups, late rows] per batch,
        // with the exact value partition-layout-dependent
        droppedGroups += d.map(e => (e.ts / 3600L, e.typ)).distinct.size
        kept ++= k
        wmMs = math.max(wmMs, b.map(_.ts).max * 1000L - delayS * 1000L)
      }
      val expected = kept
        .filter(e => wendS(e.ts) * 1000L <= wmMs) // emitted = closed
        .groupBy(e => (e.ts / 3600L * 3600L, e.typ))
        .map { case ((ws, t), es) =>
          (ws, t, es.size.toLong,
            es.map(e => math.round(e.value * 100)).sum)
        }.toSet
      // ---- the streaming run
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Long, Long, String, Double)]
      val feed = mem.toDF()
        .toDF("event_id", "epoch_s", "user_id", "event_type", "value")
        .withColumn("ts", expr("timestamp_seconds(epoch_s)"))
      val name = s"wmprop_${qn.incrementAndGet()}"
      val q = EventStream.windowedCounts(feed).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b =>
          mem.addData(b.map(e => (e.id, e.ts, e.user, e.typ, e.value)))
          q.processAllAvailable()
        }
        val got = spark.table(name)
          .select(col("window_start").cast("long"), col("event_type"),
            col("n"), col("value_cents"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getLong(3))).toSet
        val sparkDropped = q.recentProgress
          .flatMap(p => p.stateOperators.map(_.numRowsDroppedByWatermark))
          .sum
        if (got != expected)
          info(s"windows mismatch: got=$got expected=$expected " +
            s"batches=$batches")
        val droppedOk =
          sparkDropped >= droppedGroups && sparkDropped <= droppedRows
        if (!droppedOk)
          info(s"dropped accounting outside [$droppedGroups, " +
            s"$droppedRows]: spark=$sparkDropped batches=$batches")
        got == expected && droppedOk
      } finally q.stop()
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, s"windowed-counts property failed: ${res.status}")
  }

  test("ScalaCheck: event-time sessionization under random lateness " +
      "and batch splits equals the timer-semantics replay") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Test => CheckTest}
    // gap ends in .5 s so a timer can never TIE an integer-second
    // watermark — the strict-vs-nonstrict firing boundary is never
    // sampled and cannot mis-pin the property
    val gapMs = 90500L
    val prop = forAll(genBatches) { batches =>
      // ---- pure replay of flatMapGroupsWithState EventTimeTimeout
      final case class St(var first: Long, var last: Long, var n: Long,
                          var sum: Double, var maxTsUs: Long,
                          var timerMs: Long)
      var wmMs = 0L
      val state = scala.collection.mutable.Map.empty[Long, St]
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, Long)]
      def fire(): Unit =
        state.toSeq.sortBy(_._1).foreach { case (u, s) =>
          if (s.timerMs < wmMs) {
            out += ((u, s.first, s.last, s.n, math.round(s.sum * 100)))
            state -= u
          }
        }
      batches.foreach { b =>
        // LATE-ROW FILTER (measured): flatMapGroupsWithState drops
        // input rows whose event time is <= the current watermark
        // before the function ever sees them — a row at exact
        // watermark equality is dropped
        val live = b.filter(e => e.ts * 1000L > wmMs)
        // TIMEOUT-FIRST (measured): a timer strictly below the current
        // watermark fires with the OLD state even when the same batch
        // carries new data for that key — the expired session closes
        // as-is and the batch's data opens a FRESH session
        fire()
        // …then live data folds in eventId order like the impl
        live.groupBy(_.user).foreach { case (u, evs) =>
          val s = state.getOrElseUpdate(u, St(0L, 0L, 0L, 0.0, 0L, 0L))
          evs.sortBy(_.id).foreach { e =>
            if (s.n == 0L) s.first = e.id
            s.last = math.max(s.last, e.id)
            s.n += 1; s.sum += e.value
            s.maxTsUs = math.max(s.maxTsUs, e.ts * 1000000L)
          }
          s.timerMs = s.maxTsUs / 1000L + gapMs
        }
        // the watermark tracker sees ALL rows, late ones included
        wmMs = math.max(wmMs, b.map(_.ts).max * 1000L)
      }
      fire() // the no-data batch processAllAvailable runs at the end
      val expected = out.toList.sorted
      // ---- the streaming run
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Long, Long, String, Double)]
      val feed = mem.toDF()
        .toDF("eventId", "epoch_s", "userId", "eventType", "value")
        .withColumn("tsMicros", col("epoch_s") * lit(1000000L))
        .withColumn("__ts", expr("timestamp_seconds(epoch_s)"))
        .withWatermark("__ts", "0 seconds")
        .as[FeedEvent]
      val name = s"sessprop_${qn.incrementAndGet()}"
      val q = Sessionize.sessionStreamEventTime(feed, gapMs)
        .toDF().writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b =>
          mem.addData(b.map(e => (e.id, e.ts, e.user, e.typ, e.value)))
          q.processAllAvailable()
        }
        val got = spark.table(name)
          .select("userId", "firstVersion", "lastVersion", "nEvents",
            "valueSumCents")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toList.sorted
        if (got != expected)
          info(s"sessions mismatch: got=$got expected=$expected " +
            s"batches=$batches")
        got == expected
      } finally q.stop()
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, s"sessionization property failed: ${res.status}")
  }

  // ---- stream-stream interval join ---------------------------------

  private case class JEv(id: Long, ts: Long, key: Long, left: Boolean)

  /** (l.id, r.id) pairs of the batch interval-join truth: same key,
    * r.ts in the half-open (l.ts - lookback, l.ts] window. */
  private def intervalPairs(evs: Seq[JEv], lookbackS: Long)
      : Set[(Long, Long)] = {
    val (ls, rs) = evs.partition(_.left)
    (for {
      l <- ls
      m <- rs if m.key == l.key && m.ts <= l.ts && m.ts > l.ts - lookbackS
    } yield (l.id, m.id)).toSet
  }

  private def genJoinEvents: org.scalacheck.Gen[List[JEv]] = {
    import org.scalacheck.Gen
    val genEv = for {
      ts <- Gen.choose(0L, 7200L)
      key <- Gen.choose(1L, 3L)
      left <- Gen.oneOf(true, false)
    } yield JEv(0L, ts, key, left)
    for {
      n <- Gen.choose(2, 24)
      evs <- Gen.listOfN(n, genEv)
    } yield evs.zipWithIndex.map { case (e, i) => e.copy(id = i + 1L) }
  }

  /** Run intervalJoin over the given batches; returns (pairs, rawCount).
    * Watermark delay 600.5 s: a timer/watermark can never tie an
    * integer-second row ts, so the strict-vs-nonstrict late boundary
    * is never sampled (the gapMs trick above). */
  private def runIntervalJoin(batches: List[List[JEv]])
      : (Set[(Long, Long)], Int) = {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rMem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = EventStream.intervalJoin(
      lMem.toDF().toDF("event_id", "ts", "user_id"),
      rMem.toDF().toDF("event_id", "ts", "user_id"),
      "user_id", lookback = "1 hour", watermarkDelay = "600500 milliseconds")
    val name = s"ivjprop_${qn.incrementAndGet()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        val (ls, rs) = b.partition(_.left)
        if (ls.nonEmpty) lMem.addData(
          ls.map(e => (e.id, new java.sql.Timestamp(e.ts * 1000L), e.key)))
        if (rs.nonEmpty) rMem.addData(
          rs.map(e => (e.id, new java.sql.Timestamp(e.ts * 1000L), e.key)))
        q.processAllAvailable()
      }
      val raw = spark.table(name)
        .select(col("event_id"), col("r_event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      (raw.toSet, raw.length)
    } finally q.stop()
  }

  test("ScalaCheck: interval join over an in-order feed equals the " +
      "batch join — the on-time completeness contract") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CheckTest}
    val gen = for {
      evs <- genJoinEvents
      nBatches <- Gen.choose(1, 5)
    } yield {
      // ts-ordered cut: every row arrives at or after all earlier rows,
      // so nothing is ever late vs the min-of-sides watermark and the
      // stream must find EVERY batch-join match
      val sorted = evs.sortBy(e => (e.ts, e.id))
      val size = math.max(1, (sorted.size + nBatches - 1) / nBatches)
      sorted.grouped(size).map(_.toList).toList
    }
    val prop = forAll(gen) { batches =>
      val evs = batches.flatten
      val expected = intervalPairs(evs, 3600L)
      val (got, rawCount) = runIntervalJoin(batches)
      if (got != expected || rawCount != got.size)
        info(s"interval completeness mismatch: got=$got " +
          s"expected=$expected raw=$rawCount batches=$batches")
      got == expected && rawCount == got.size
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, s"interval-join completeness failed: ${res.status}")
  }

  test("ScalaCheck: interval join under random lateness emits only " +
      "true pairs and never duplicates — the soundness contract") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CheckTest}
    val gen = for {
      evs <- genJoinEvents
      nBatches <- Gen.choose(1, 5)
    } yield // arbitrary order: late rows and evicted-partner windows
      // arise naturally; completeness is NOT asserted here (late data
      // beyond the watermark is contractually droppable), soundness is
      evs.zipWithIndex
        .groupBy { case (e, i) => (i * 17 + e.ts) % nBatches }
        .toList.sortBy(_._1).map(_._2.map(_._1)).filter(_.nonEmpty)
    val prop = forAll(gen) { batches =>
      val evs = batches.flatten
      val allPairs = intervalPairs(evs, 3600L)
      val (got, rawCount) = runIntervalJoin(batches)
      if (!got.subsetOf(allPairs) || rawCount != got.size)
        info(s"interval soundness violation: got=$got " +
          s"allPairs=$allPairs raw=$rawCount batches=$batches")
      got.subsetOf(allPairs) && rawCount == got.size
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, s"interval-join soundness failed: ${res.status}")
  }
}
