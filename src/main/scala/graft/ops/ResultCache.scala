package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** BI result cache — the engine-side analog of the reference's Redis
  * result cache in front of ad-hoc Superset SQL
  * (superset/superset_config.py:12-18: `CACHE_DEFAULT_TIMEOUT: 300`).
  *
  * Keyed by exact trimmed SQL text (see key() for why interior
  * whitespace is deliberately NOT normalized); a hit returns the SAME
  * persisted DataFrame (Spark serves repeat actions from the cached
  * blocks instead of re-running the query), a miss — or an entry past
  * its TTL — re-plans, persists, and replaces the entry, unpersisting
  * the stale one. `invalidate()` is the upstream-data-changed hook (the
  * reference relies on TTL alone; a CDC engine knows when state moved —
  * call it from the refresh path, e.g. after MaterializedView.refresh).
  *
  * The clock is injectable so expiry is deterministic under test. Hit /
  * miss counters mirror the reference's habit of instrumenting every
  * serving path (server.js:286-297).
  *
  * Scale note: entries persist at Spark's default storage level
  * (MEMORY_AND_DISK, spills instead of OOM) and one cache serves all
  * sessions of the application — like the shared Redis in front of
  * Superset workers.
  */
class ResultCache(spark: SparkSession, ttlMillis: Long = 300000L,
                  clock: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(df: DataFrame, cachedAt: Long)
  private val entries = mutable.Map.empty[String, Entry]
  private var hitCount = 0L
  private var missCount = 0L

  /** Exact query text (trimmed) — the same contract as the reference's
    * Redis cache, which keys on a digest of the statement. Rewriting
    * interior whitespace would also rewrite it inside string LITERALS
    * ('ACME  Corp' vs 'ACME Corp') and serve one query's results to a
    * different query. */
  private def key(sqlText: String): String = sqlText.trim

  /** Drop entries past their TTL (callers hold the lock). Run on every
    * access so a key that is never re-queried still gets unpersisted —
    * Redis expires on its own; an access-time-only check would pin one
    * persisted result per distinct ad-hoc query forever. */
  private def sweep(now: Long): Unit = {
    val dead = entries.collect {
      case (k, e) if now - e.cachedAt >= ttlMillis => k
    }.toSeq
    dead.foreach { k => entries.remove(k).foreach(_.df.unpersist()) }
  }

  /** Serve `sqlText`, from cache when fresh. Planning runs OUTSIDE the
    * lock so a slow miss never blocks concurrent hits on other keys. */
  def sql(sqlText: String): DataFrame = {
    val k = key(sqlText)
    val cached = synchronized {
      val now = clock()
      sweep(now)
      entries.get(k) match {
        case Some(e) =>
          hitCount += 1
          Some(e.df)
        case None =>
          missCount += 1
          None
      }
    }
    cached.getOrElse {
      val df = spark.sql(sqlText).persist()
      synchronized {
        entries.put(k, Entry(df, clock())).foreach(_.df.unpersist())
      }
      df
    }
  }

  /** Drop every cached result — the data-changed hook. */
  def invalidate(): Unit = synchronized {
    entries.values.foreach(_.df.unpersist())
    entries.clear()
  }

  def hits: Long = synchronized(hitCount)
  def misses: Long = synchronized(missCount)
  def size: Int = synchronized(entries.size)
}
