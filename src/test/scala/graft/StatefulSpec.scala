package graft

import graft.plans.Salting
import graft.streaming.{EntityState, FeedEvent, Sessionize}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.TestGroupState

/** Custom-state streaming (flatMapGroupsWithState), the typed top-K
  * Aggregator, and salted aggregation. */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, uid: Long, v: Double) =
    FeedEvent(id, id * 1000, uid, "purchase", v)

  test("sessionize updateState folds version-ordered events into running state") {
    val state = TestGroupState.create[EntityState](
      optionalState = org.apache.spark.api.java.Optional.empty[EntityState](), timeoutConf =
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val out = Sessionize.updateState(7L,
      Iterator(ev(3, 7, 1.5), ev(1, 7, 2.0), ev(2, 7, 0.25)), state)
    assert(out.isEmpty, "no session emitted while active")
    val s = state.get
    assert(s.firstVersion == 1L, "firstVersion pinned to the oldest event")
    assert(s.lastVersion == 3L && s.nEvents == 3L)
    assert(math.abs(s.valueSum - 3.75) < 1e-9)
  }

  test("sessionize timeout emits the session and clears state") {
    val state = TestGroupState.create[EntityState](
      optionalState = org.apache.spark.api.java.Optional.of(
        EntityState(7L, 2L, 9L, 4L, 2.5, 9000L)),
      timeoutConf =
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 99999L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = true)
    val out = Sessionize.updateState(7L, Iterator.empty, state).toSeq
    assert(out.size == 1)
    assert(out.head.firstVersion == 2L,
      "timeout session carries the entity's first version (batchFold parity)")
    assert(out.head.lastVersion == 9L && out.head.nEvents == 4L
      && out.head.valueSumCents == 250L)
    assert(state.isRemoved)
  }

  test("event-time fold arms the watermark timer at max event ts + gap") {
    val state = TestGroupState.create[EntityState](
      optionalState = org.apache.spark.api.java.Optional.empty[EntityState](),
      timeoutConf =
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(0L),
      hasTimedOut = false)
    val out = Sessionize.updateStateEventTime(5000L)(7L,
      Iterator(ev(3, 7, 1.5), ev(1, 7, 2.0)), state)
    assert(out.isEmpty, "no session emitted while the watermark lags")
    // max tsMicros = 3000 → 3 ms + 5000 ms gap
    assert(state.getTimeoutTimestampMs.get() == 5003L,
      s"timer at ${state.getTimeoutTimestampMs}")
    assert(state.get.maxTsMicros == 3000L)
  }

  test("event-time fold closes an already-expired session before " +
      "folding same-batch data (batch-schedule independence)") {
    // back-to-back data batches in one backlog drain: the key's timer
    // sits below the watermark AND the batch carries new (non-late)
    // events — without the self-heal the fold would merge events
    // separated by more than the gap into one session. This scenario
    // cannot be sampled through MemoryStream+processAllAvailable
    // (an interleaved no-data batch always fires the timer first),
    // which is exactly why it is pinned at the function level.
    val old = EntityState(7L, firstVersion = 1L, lastVersion = 3L,
      nEvents = 2L, valueSum = 3.0, maxTsMicros = 3000L)
    val state = TestGroupState.create[EntityState](
      optionalState = org.apache.spark.api.java.Optional.of(old),
      timeoutConf =
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 1000L,
      // wm = 100 s: far past the old session's 3 ms + 5 s gap
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(100000L),
      hasTimedOut = false)
    val out = Sessionize.updateStateEventTime(5000L)(7L,
      Iterator(FeedEvent(9L, 200000000L, 7L, "purchase", 2.5)),
      state).toList
    assert(out == List(graft.streaming.EntitySession(7L, 1L, 3L, 2L, 300L)),
      s"expired session must close AS-IS, got $out")
    val fresh = state.get
    assert(fresh.firstVersion == 9L && fresh.nEvents == 1L,
      s"new data must open a FRESH session, got $fresh")
    assert(state.getTimeoutTimestampMs.get() == 205000L,
      s"fresh timer at new maxTs + gap, got ${state.getTimeoutTimestampMs}")
    // and a LIVE session (timer ahead of the watermark) keeps merging
    val state2 = TestGroupState.create[EntityState](
      optionalState = org.apache.spark.api.java.Optional.of(old),
      timeoutConf =
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(1L),
      hasTimedOut = false)
    val out2 = Sessionize.updateStateEventTime(5000L)(7L,
      Iterator(FeedEvent(9L, 4000000L, 7L, "purchase", 2.5)), state2).toList
    assert(out2.isEmpty && state2.get.nEvents == 3L &&
      state2.get.firstVersion == 1L,
      s"live session must keep folding, got $out2 / ${state2.get}")
  }

  test("batchFold matches the declarative groupBy twin") {
    val events = Tables.events(spark, sf).select(
      col("event_id").as("eventId"), unix_micros(col("ts")).as("tsMicros"),
      col("user_id").as("userId"), col("event_type").as("eventType"),
      col("value")).as[FeedEvent]
    val got = Sessionize.batchFold(spark, events)
      .collect().map(s => (s.userId, (s.firstVersion, s.lastVersion, s.nEvents))).toMap
    val want = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(min("event_id"), max("event_id"), count(lit(1)))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
  }

  test("TopKAgg top-k equals the sort-based baseline") {
    val emb = Tables.embeddings(spark, sf)
    val viaAgg = llm.SimSearch.topKAggregated(emb, "vec_id", "embedding", 0L, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaSort = llm.SimSearch.bruteForceTopK(emb, "vec_id", "embedding", 0L, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaAgg == viaSort)
  }

  test("salted aggregation equals the direct groupBy") {
    val direct = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("value_sum")) // long sum: exact
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val salted = Salting.saltedCountSum(
      Tables.events(spark, sf), "user_id", "event_id", saltBuckets = 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted == direct)
  }
}
