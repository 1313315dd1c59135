package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One delivered page plus the metadata the reference returns in its
  * HTTP response (fromVersion/toVersion/count/hasMore, server.js:276-299).
  * Every page row is fresh (the resume filter runs pre-limit), so there
  * is no raw-vs-delivered count distinction. */
case class Page(data: DataFrame,
                fromVersion: Long, toVersion: Long,
                count: Long, hasMore: Boolean,
                lastVersion: Long, lastId: Long)

/** Per-stage latency of one delivered poll — the reference's performance
  * summary block (readState / queryDatabase / saveBSON / updateState,
  * server.js:286-293). */
case class PollTimings(readStateMs: Long, queryMs: Long,
                       sinkMs: Long, commitMs: Long) {
  def totalMs: Long = readStateMs + queryMs + sinkMs + commitMs
}

/** The batch-incremental exactly-once poll protocol — the heart of the
  * reference (invoice-api/server.js:83-299 + consumer.js:6-49), re-expressed
  * over Spark:
  *
  *  1. read consumer cursor (auto-create at version 0);
  *  2. deliberate overlap: re-read from `lastSyncVersion - 1`
  *     (server.js:134) so a crash between sink-write and offset-commit
  *     can never skip rows — at-least-once read;
  *  3. composite resume cursor `(v > last) OR (v = last AND id > lastId)`
  *     (server.js:165-168) dedups the overlap — idempotent delivery;
  *  4. sink the page; commit the cursor to the last delivered (version, id)
  *     ONLY if the sink succeeded (server.js:231-249) — exactly-once
  *     end-to-end effect;
  *  5. `hasMore` = raw page hit the limit (server.js:282) → caller loops
  *     immediately (consumer.js:34-37).
  *
  * The bounded page CURSOR — ≤limit (version, id) pairs, the same rowset
  * the reference's recordset iteration holds in JS (server.js:154-168) —
  * is collected to the driver once; the resume filter runs inside the
  * page query (pre-limit, see poll), and only last-row bookkeeping runs
  * locally. The document payload stays a DataFrame:
  * rehydration + nesting + the sink write are distributed, driven by the
  * collected key page as a broadcast. One pass over the changefeed per
  * poll; per-poll work is O(limit) afterwards, independent of table size.
  */
class ChangeFeed(spark: SparkSession, dir: String, store: ConsumerStateStore) {

  /** The feed surface, overridable so generic feeds (e.g. with version
    * ties across entities) reuse the same poll protocol. Defaults bind to
    * the invoice pipeline. Column contract: `changedEntities` must return
    * exactly (invoice_id LONG, change_version LONG) — poll's resume
    * filter, ordering and cursor bookkeeping key on those two names. */
  protected def currentVersion: Long = InvoiceCdc.currentVersion(spark, dir)
  protected def changedEntities(since: Long, to: Long): DataFrame =
    InvoiceCdc.changedInvoices(spark, dir, since, to)
  protected def rehydrate(keys: Seq[(Long, Long)]): DataFrame =
    InvoiceCdc.rehydratePage(spark, dir, keys)

  /** Read one page for `syncName` without committing (steps 1-3 + hasMore).
    *
    * The resume-cursor dedup (step 3) is applied INSIDE the query, before
    * orderBy/limit, so already-delivered rows never consume page budget.
    * (The reference filters after TOP, server.js:165-168 — which stalls
    * permanently if ≥limit entities share one change_version: the page is
    * all duplicates, the cursor can't advance, yet hasMore stays true.
    * Filtering pre-limit keeps hasMore and cursor advancement consistent
    * for any feed.) The deliberate `since - 1` overlap re-read is kept:
    * it is what makes a crash between sink-write and offset-commit safe. */
  def poll(syncName: String, limit: Int): Page = {
    require(limit > 0, s"page limit must be positive, got $limit " +
      "(limit = 0 would report hasMore on every empty page and stall drain)")
    pollFrom(store.get(syncName), limit)
  }

  /** The query stages of a poll, separated from the offset read so the
    * timed flavor can attribute latency per stage. */
  private def pollFrom(st: SyncState, limit: Int): Page = {
    val overlapSince = if (st.lastSyncVersion > 0) st.lastSyncVersion - 1 else 0L
    val to = currentVersion
    // one job: collapse the feed, dedup the overlap, take the oldest-first
    // key page (shared cursor ordering: InvoiceCdc.collectKeyPage) —
    // every row that survives is fresh
    val keys = InvoiceCdc.collectKeyPage(
      changedEntities(overlapSince, to)
        .filter(InvoiceCdc.resumeCursor(st.lastSyncVersion, st.lastProcessedId)),
      limit)
    val (lastV, lastId) = keys.lastOption
      .map { case (id, v) => (v, id) }
      .getOrElse((st.lastSyncVersion, st.lastProcessedId))
    val delivered = rehydrate(keys.toSeq)
    Page(delivered, st.lastSyncVersion, to,
      keys.length, keys.length == limit, lastV, lastId)
  }

  /** Poll → sink → commit-on-success (step 4). The cursor advances only if
    * `sink` did not throw and delivered > 0 rows (mirrors the `saved > 0`
    * gating, server.js:231-234); a sink failure leaves the cursor in place
    * so the next poll redelivers the page. */
  def pollAndDeliver(syncName: String, limit: Int)
                    (sink: DataFrame => Unit): Page =
    pollAndDeliverTimed(syncName, limit)(sink)._1

  /** pollAndDeliver with the reference's per-stage performance summary
    * (server.js:286-293): how long the offset read, the page query, the
    * sink write, and the offset commit each took. */
  def pollAndDeliverTimed(syncName: String, limit: Int)
                         (sink: DataFrame => Unit): (Page, PollTimings) = {
    require(limit > 0, s"page limit must be positive, got $limit " +
      "(limit = 0 would report hasMore on every empty page and stall drain)")
    def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000L
    val tState = System.nanoTime()
    val st = store.get(syncName)
    val readStateMs = ms(tState)
    val tQuery = System.nanoTime()
    val page = pollFrom(st, limit)
    val queryMs = ms(tQuery)
    var sinkMs = 0L
    var commitMs = 0L
    if (page.count > 0) {
      val tSink = System.nanoTime()
      sink(page.data)
      sinkMs = ms(tSink)
      val tCommit = System.nanoTime()
      store.commit(syncName, page.lastVersion, page.lastId)
      commitMs = ms(tCommit)
    }
    (page, PollTimings(readStateMs, queryMs, sinkMs, commitMs))
  }

  /** Drain the feed: poll until !hasMore (consumer.js:34-37 catch-up loop). */
  def drain(syncName: String, limit: Int)
           (sink: DataFrame => Unit): Seq[Page] = {
    val pages = Seq.newBuilder[Page]
    var more = true
    while (more) {
      val p = pollAndDeliver(syncName, limit)(sink)
      pages += p
      // the pre-limit resume filter guarantees every page row is fresh,
      // so hasMore ⇒ the cursor advanced and the next poll makes progress
      more = p.hasMore
    }
    pages.result()
  }

  /** T7 — consumer reset → full replay from version 0 (server.js:424-451). */
  def resetConsumer(syncName: String): Unit = store.reset(syncName)
}
