package graft.cdc

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Per-consumer named offset: (version, tiebreak id, time).
  * Reference: ChangeTrackingSyncState, setup-invoice-db.sql:121-126. */
case class SyncState(syncName: String,
                     lastSyncVersion: Long,
                     lastProcessedId: Long,
                     lastSyncTime: Timestamp)

/** Consumer offset table, keyed by consumer name.
  *
  * Mirrors the reference's read-modify-write of ChangeTrackingSyncState
  * (invoice-api/server.js:100-127 read + auto-create, :239-249 commit,
  * :424-451 reset). A consumer row is auto-created at version 0 on first
  * read; commit happens only after the caller's sink succeeded (the
  * exactly-once protocol lives in ChangeFeed).
  *
  * This table has one row per consumer — driver-scale metadata, not
  * data-scale — so it is stored as a tiny text file through the Hadoop
  * FileSystem API (works on local/HDFS/object-store paths) with
  * write-temp-then-rename updates. No Spark jobs: an offset read or
  * commit is two filesystem calls, exactly like the reference's
  * single-row SELECT/UPDATE. Single-writer per CONSUMER is assumed, as
  * in the reference (one API server owns the state row) — but the
  * reference's whole design is N consumers fanning out over ONE feed,
  * and the file holds every consumer's row, so two consumers
  * committing CONCURRENTLY is the normal case, not an edge case. Every
  * mutation is a read-modify-write of the whole file; without mutual
  * exclusion, consumer A's commit can be lost under consumer B's
  * (both read, both write, last writer wins with the other's update
  * missing). All mutating ops therefore serialize on one store-level
  * monitor — the deployment shape this models is the reference's one
  * API-server process multiplexing N consumers, where a JVM-level
  * monitor IS the full exclusion domain. N independent *processes*
  * sharing one state file additionally need the store to live on a
  * filesystem with atomic rename (HDFS/object-store) AND one writer
  * process per file — or one store path per consumer, which removes
  * the shared-file write entirely (cursors are independent rows).
  * ConcurrentFanoutSpec exercises the in-process contract.
  *
  * Record format, one per line:
  * `urlencode(syncName)\tversion\tlastId\tepochMillis`.
  */
class ConsumerStateStore(spark: SparkSession, path: String) {

  /** Mutual exclusion for every read-modify-write below: one monitor
    * per store INSTANCE. Two instances on one path are two writer
    * domains (see class doc) — same-process callers share an instance. */
  private val lock = new Object

  private val fsPath = new Path(path, "sync_state.tsv")
  private def fs: FileSystem =
    fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  private val tmpPath = new Path(path, "sync_state.tsv.tmp")

  private def parse(f: FileSystem, p: Path): Map[String, SyncState] = {
    val in = f.open(p)
    try {
      val text = new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        StandardCharsets.UTF_8)
      text.split('\n').filter(_.nonEmpty).map { line =>
        val Array(n, v, id, t) = line.split('\t')
        val st = SyncState(dec(n), v.toLong, id.toLong,
          new Timestamp(t.toLong))
        st.syncName -> st
      }.toMap
    } finally in.close()
  }

  private def readAll(): Map[String, SyncState] = {
    val f = fs
    if (f.exists(fsPath)) parse(f, fsPath)
    // crash-recovery: the temp file is fully written and closed BEFORE
    // the swap begins, so "no state file but a PARSEABLE temp" means a
    // crash inside the swap — the temp holds the committed state. (Guards
    // filesystems whose overwrite-rename is not a single atomic op: local
    // RawLocalFs falls back to delete-then-rename.) A temp that does NOT
    // parse can only be a crash during the first-ever write — before any
    // state existed — so empty is the correct recovery, not an error.
    else if (f.exists(tmpPath))
      scala.util.Try(parse(f, tmpPath)).getOrElse(Map.empty)
    else Map.empty
  }

  private def writeAll(states: Map[String, SyncState]): Unit = {
    val f = fs
    // if a previous swap crashed (no state file, committed temp), promote
    // the temp FIRST — otherwise truncating it below would reopen the
    // lost-state window this two-file protocol exists to close. Promote
    // only a temp that parses (a torn first-ever write holds no state),
    // and fail loudly if the rename reports failure (FileSystem.rename
    // signals many failures by returning false, not throwing) — silently
    // continuing would truncate the only surviving copy of the offsets.
    if (!f.exists(fsPath) && f.exists(tmpPath)) {
      if (scala.util.Try(parse(f, tmpPath)).isSuccess) {
        if (!f.rename(tmpPath, fsPath))
          throw new java.io.IOException(
            s"state recovery promote failed: $tmpPath -> $fsPath")
      }
    }
    val out = f.create(tmpPath, true)
    try {
      val text = states.values.toSeq.sortBy(_.syncName).map { s =>
        s"${enc(s.syncName)}\t${s.lastSyncVersion}\t${s.lastProcessedId}\t${s.lastSyncTime.getTime}"
      }.mkString("", "\n", "\n")
      out.write(text.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
    // swap the fully-written temp over the target. On HDFS the OVERWRITE
    // rename is a single atomic op; on filesystems whose AbstractFileSystem
    // falls back to delete-then-rename (local RawLocalFs does) a crash
    // inside the swap leaves the committed state in the temp file, which
    // readAll recovers — no window loses consumer offsets either way.
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fsPath.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmpPath, fsPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Read the consumer's cursor, auto-creating it at (0, 0) on first use
    * (server.js:112-122). */
  def get(syncName: String): SyncState = lock.synchronized {
    val all = readAll()
    all.getOrElse(syncName, {
      val fresh = SyncState(syncName, 0L, 0L,
        new Timestamp(System.currentTimeMillis()))
      writeAll(all + (syncName -> fresh))
      fresh
    })
  }

  /** Advance the cursor — called only after a successful sink write
    * (server.js:231-249). */
  def commit(syncName: String, version: Long, lastId: Long): Unit = lock.synchronized {
    val all = readAll()
    val next = SyncState(syncName, version, lastId,
      new Timestamp(System.currentTimeMillis()))
    writeAll(all + (syncName -> next))
  }

  /** Reset to version 0 → full re-delivery (server.js:424-451). */
  def reset(syncName: String): Unit = lock.synchronized {
    writeAll(readAll() + (syncName ->
      SyncState(syncName, 0L, 0L, new Timestamp(System.currentTimeMillis()))))
  }

  def list(): Seq[SyncState] =
    lock.synchronized(readAll()).values.toSeq.sortBy(_.syncName)
}
