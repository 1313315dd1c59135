package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of the changefeed, typed (FIXTURES.md §C: event_id is the
  * change version, user_id the entity key). */
case class FeedEvent(eventId: Long, tsMicros: Long, userId: Long,
                     eventType: String, value: Double)

/** Mutable per-entity state carried between micro-batches. firstVersion
  * is set on the entity's first event and preserved across batches so the
  * timeout-emitted session agrees with batchFold's min(event_id);
  * maxTsMicros carries the entity's latest EVENT time so the event-time
  * flavor can re-arm its watermark timer correctly across batches.
  *
  * State-schema note: adding a field changes the streaming state
  * encoding (firstVersion did in r5, maxTsMicros in r7); a sessionStream
  * checkpoint written by an older version of this class fails Spark's
  * state-store schema check on restart — restart such a query from a
  * fresh checkpoint (replaying the feed is safe: the fold is idempotent
  * per entity and the sink dedups on userId). */
case class EntityState(userId: Long, firstVersion: Long, lastVersion: Long,
                       nEvents: Long, valueSum: Double,
                       maxTsMicros: Long)

/** Emitted when an entity's activity gap exceeds the session timeout, or
  * on demand in batch mode. */
case class EntitySession(userId: Long, firstVersion: Long,
                         lastVersion: Long, nEvents: Long,
                         valueSumCents: Long)

/** [NORTH-STAR] Custom streaming state via KeyValueGroupedDataset
  * .flatMapGroupsWithState (SURVEY.md §2.9 T9 note) — the stateful
  * flavor the reference approximates with its SQL state table: per-entity
  * running aggregates that survive across micro-batches, emitting a
  * session record when the entity goes quiet.
  *
  * Scale notes: state is partitioned by the grouping key across
  * executors (HDFSBackedStateStore/RocksDB at cluster scale); per-key
  * state is O(1) — no unbounded growth; timeouts bound retention the
  * way the reference's 3-day change retention does.
  */
object Sessionize {

  /** The shared per-entity fold: version-ordered, later versions win,
    * counts accumulate; the first event ever seen pins firstVersion
    * (batchFold's min). */
  private def fold(userId: Long, prev: EntityState,
                   sorted: Seq[FeedEvent]): EntityState =
    sorted.foldLeft(prev) { (s, e) =>
      EntityState(userId,
        if (s.nEvents == 0L) e.eventId else s.firstVersion,
        math.max(s.lastVersion, e.eventId),
        s.nEvents + 1, s.valueSum + e.value,
        math.max(s.maxTsMicros, e.tsMicros))
    }

  private def emit(s: EntityState): EntitySession =
    EntitySession(s.userId, s.firstVersion, s.lastVersion, s.nEvents,
      math.round(s.valueSum * 100))

  /** Fold one batch of events for a single entity into its running
    * state; emit a session when the PROCESSING-TIME timeout fires
    * (the serving posture: close a session after 30 s of wall-clock
    * quiet). NOTE — Spark runs a ProcessingTimeTimeout query's batch
    * loop continuously to fire timers (`shouldRunAnotherBatch` is
    * always true), so this flavor suits a long-lived
    * Trigger.ProcessingTime consumer, NEVER an AvailableNow drain
    * (the drain would never terminate — measured, not theory); the
    * drainable flavor is [[sessionStreamEventTime]]. */
  def updateState(userId: Long, events: Iterator[FeedEvent],
                  state: GroupState[EntityState]): Iterator[EntitySession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(emit(s))
    } else {
      val sorted = events.toSeq.sortBy(_.eventId)
      if (sorted.isEmpty) Iterator.empty
      else {
        val next = fold(userId,
          state.getOption.getOrElse(EntityState(userId, 0L, 0L, 0L, 0.0, 0L)),
          sorted)
        state.update(next)
        state.setTimeoutDuration("30 seconds")
        Iterator.empty
      }
    }
  }

  /** The EVENT-TIME fold: a session closes when the WATERMARK passes
    * the entity's latest event time + `gapMs` — emission is driven by
    * the data's own clock, so a backlog drain (AvailableNow) replays
    * deterministically and terminates (event-time timers schedule
    * extra batches only while the watermark advances).
    *
    * Measured Spark semantics this flavor inherits (pinned by the
    * StreamPropertySpec replay model): input rows at or below the
    * watermark are dropped BEFORE this function sees them, and a timer
    * fires at the first batch boundary after the watermark passes it.
    * One semantic Spark leaves BATCH-SCHEDULE-DEPENDENT is enforced
    * here instead: when new data for a key arrives in the same
    * micro-batch in which its timer already sits below the watermark
    * (back-to-back data batches in one backlog drain — an interleaved
    * no-data batch would have fired the timer first, but Spark
    * processes data groups with hasTimedOut=false), the expired
    * session must CLOSE AS-IS and the new data open a fresh session —
    * those events are more than `gapMs` after the session's last
    * event, so folding them in would merge across the very gap that
    * defines the session. The self-heal below (getCurrentWatermarkMs)
    * makes the output independent of whether a no-data batch happened
    * to run; the round-11 review caught the original doc overclaiming
    * this as Spark's own in-batch behavior.
    *
    * Boundary tie (round-11 ADVICE, deliberate): the close-before-fold
    * guard uses STRICT '<' — at exact equality (last event + gapMs ==
    * watermark) the expired-by-exactly-zero session still folds the
    * batch's events in, so events exactly gapMs+ε past a session whose
    * timer equals the watermark can merge where the prose above says
    * "more than gapMs ⇒ fresh session". This mirrors Spark's own
    * strict timer firing (a timer AT the watermark has not fired yet),
    * which is what keeps the output batch-schedule-INDEPENDENT — a
    * '<=' here would close sessions a no-data batch would not have
    * closed, reintroducing the schedule dependence this guard exists
    * to remove. The one-tick generosity at the boundary is the price
    * of that invariance. */
  def updateStateEventTime(gapMs: Long)(
      userId: Long, events: Iterator[FeedEvent],
      state: GroupState[EntityState]): Iterator[EntitySession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(emit(s))
    } else {
      val sorted = events.toSeq.sortBy(_.eventId)
      if (sorted.isEmpty) Iterator.empty
      else {
        // close an already-expired session BEFORE folding: the
        // watermark passed its gap, so this batch's events are more
        // than gapMs after its last event (they are above the
        // watermark — late rows never reach this function)
        val (closed, base) = state.getOption match {
          case Some(s) if s.nEvents > 0L &&
              s.maxTsMicros / 1000L + gapMs < state.getCurrentWatermarkMs() =>
            (Iterator.single(emit(s)),
              EntityState(userId, 0L, 0L, 0L, 0.0, 0L))
          case other =>
            (Iterator.empty,
              other.getOrElse(EntityState(userId, 0L, 0L, 0L, 0.0, 0L)))
        }
        val next = fold(userId, base, sorted)
        state.update(next)
        state.setTimeoutTimestamp(next.maxTsMicros / 1000L + gapMs)
        closed
      }
    }
  }

  /** Streaming query: per-entity running state with processing-time
    * session emission (long-lived consumer posture). */
  def sessionStream(events: Dataset[FeedEvent]): Dataset[EntitySession] = {
    implicit val stateEnc = Encoders.product[EntityState]
    implicit val outEnc = Encoders.product[EntitySession]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(updateState)
  }

  /** The DRAINABLE streaming query: event-time session emission under
    * a zero-delay watermark on the event `ts`. The input must carry a
    * `__ts` TimestampType column with the watermark already declared
    * (the declared query stages it); `gapMs` is the event-time idle
    * gap that closes a session. */
  def sessionStreamEventTime(events: Dataset[FeedEvent],
                             gapMs: Long): Dataset[EntitySession] = {
    implicit val stateEnc = Encoders.product[EntityState]
    implicit val outEnc = Encoders.product[EntitySession]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateStateEventTime(gapMs))
  }

  /** Batch twin of the per-entity fold (deterministic, for specs and the
    * declared-query surface): final state after draining the feed. */
  def batchFold(spark: SparkSession, events: Dataset[FeedEvent]): Dataset[EntitySession] = {
    import spark.implicits._
    events.groupByKey(_.userId)
      .mapGroups { (uid, it) =>
        val evs = it.toSeq.sortBy(_.eventId)
        EntitySession(uid, evs.head.eventId, evs.last.eventId, evs.size,
          math.round(evs.map(_.value).sum * 100))
      }
  }
}
