package graft.cdc

import java.sql.Timestamp
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Per-consumer named offset: (version, tiebreak id, time).
  * Reference: ChangeTrackingSyncState, setup-invoice-db.sql:121-126. */
case class SyncState(syncName: String,
                     lastSyncVersion: Long,
                     lastProcessedId: Long,
                     lastSyncTime: Timestamp)

/** Parquet-backed consumer offset table, keyed by consumer name.
  *
  * Mirrors the reference's read-modify-write of ChangeTrackingSyncState
  * (invoice-api/server.js:100-127 read + auto-create, :239-249 commit,
  * :424-451 reset). A consumer row is auto-created at version 0 on first
  * read; commit happens only after the caller's sink succeeded (the
  * exactly-once protocol lives in ChangeFeed).
  *
  * Scale note: this table has one row per consumer — it is driver-scale
  * state, not data-scale. The parquet round-trip keeps it durable and
  * debuggable; at cluster scale the same shape would live in a
  * transactional table. Single-writer per consumer is assumed, exactly
  * as in the reference (one API server owns the state row).
  */
class ConsumerStateStore(spark: SparkSession, path: String) {
  import spark.implicits._

  private def readAll(): Map[String, SyncState] = {
    val dir = new java.io.File(path)
    if (!dir.exists() || dir.listFiles() == null || dir.listFiles().isEmpty) Map.empty
    else spark.read.parquet(path).as[SyncState].collect()
      .map(s => s.syncName -> s).toMap
  }

  private def writeAll(states: Map[String, SyncState]): Unit = {
    // tiny table: single partition, atomic-enough overwrite via temp+swap
    val tmp = path + ".tmp"
    states.values.toSeq.toDS().coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** Read the consumer's cursor, auto-creating it at (0, 0) on first use
    * (server.js:112-122). */
  def get(syncName: String): SyncState =
    readAll().getOrElse(syncName, {
      val fresh = SyncState(syncName, 0L, 0L,
        new Timestamp(System.currentTimeMillis()))
      writeAll(readAll() + (syncName -> fresh))
      fresh
    })

  /** Advance the cursor — called only after a successful sink write
    * (server.js:231-249). */
  def commit(syncName: String, version: Long, lastId: Long): Unit = {
    val all = readAll()
    val next = SyncState(syncName, version, lastId,
      new Timestamp(System.currentTimeMillis()))
    writeAll(all + (syncName -> next))
  }

  /** Reset to version 0 → full re-delivery (server.js:424-451). */
  def reset(syncName: String): Unit =
    writeAll(readAll() + (syncName ->
      SyncState(syncName, 0L, 0L, new Timestamp(System.currentTimeMillis()))))

  def list(): Seq[SyncState] = readAll().values.toSeq.sortBy(_.syncName)
}
