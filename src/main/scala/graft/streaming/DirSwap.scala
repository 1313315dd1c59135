package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Rollback-safe directory install shared by the streaming state
  * maintainers ([[StreamingMerge]], [[StreamingScd2]]) and the sink
  * compaction ([[graft.sinks.DocumentSink.compact]]): write the new
  * generation to `<dir>.<tag>-tmp`, move the old aside to
  * `<dir>.<tag>-bak`, install, drop the bak. A crash between the two
  * renames leaves the only copy under the bak path — [[restoreIfTorn]]
  * puts it back before any reader starts from empty (the
  * silent-state-loss hazard), and [[install]] runs it FIRST so a
  * direct caller can never delete the sole surviving copy. */
private[graft] object DirSwap {

  /** Test-only failpoint: when set to (tag, window), [[install]] for
    * a matching tag throws at that crash window — "beforeInstall"
    * (new generation written to tmp, served dir untouched),
    * "afterMoveAside" (the TORN window [[restoreIfTorn]] exists for:
    * served dir moved to bak, new generation not yet installed), or
    * "beforeBakDrop" (new generation installed, bak not yet
    * dropped). Production code never sets it; the DirSwap-site crash
    * matrix (CrashMatrixSpec) kills every installing site at every
    * window through it. */
  @volatile private[graft] var failpoint: Option[(String, String)] = None
  private def trip(tag: String, window: String): Unit =
    if (failpoint.contains((tag, window)))
      throw new RuntimeException(s"graft failpoint: $tag@$window")

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def bakPath(path: String, tag: String = "merge"): String =
    path.stripSuffix("/") + s".$tag-bak"
  def tmpPath(path: String, tag: String = "merge"): String =
    path.stripSuffix("/") + s".$tag-tmp"

  /** Restore `<dir>.<tag>-bak` → `<dir>` after an interrupted swap.
    * Two concurrent readers may both observe the torn state and race
    * the rename; the loser's rename fails even though the directory
    * was just restored and is healthy — so only throw if the target
    * is STILL missing after the failed rename. */
  def restoreIfTorn(spark: SparkSession, path: String,
                    tag: String = "merge"): Unit = {
    val fs = fsOf(spark, path)
    val p = new Path(path)
    val bakP = new Path(bakPath(path, tag))
    if (!fs.exists(p) && fs.exists(bakP)) {
      // RawLocalFileSystem.rename THROWS FileNotFoundException (not
      // false) when the source vanished — i.e. the racing healer
      // already restored it; fold that into the lost-race branch
      val renamed =
        try fs.rename(bakP, p)
        catch { case _: java.io.FileNotFoundException => false }
      if (!renamed && !fs.exists(p))
        throw new java.io.IOException(
          s"graft swap: cannot restore $bakP after interrupted swap")
    }
  }

  /** Run `write` against the tmp path, then swap it in. Restores a
    * torn previous swap first — deleting the bak before that would
    * destroy the only surviving copy. */
  def install(spark: SparkSession, path: String, tag: String = "merge")
             (write: String => Unit): Unit = {
    restoreIfTorn(spark, path, tag)
    val tmp = tmpPath(path, tag)
    write(tmp)
    trip(tag, "beforeInstall")
    val fs = fsOf(spark, path)
    val p = new Path(path)
    val bakP = new Path(bakPath(path, tag))
    if (fs.exists(bakP)) fs.delete(bakP, true)
    if (fs.exists(p) && !fs.rename(p, bakP))
      throw new java.io.IOException(s"graft swap: cannot move $path aside")
    trip(tag, "afterMoveAside")
    if (!fs.rename(new Path(tmp), p)) {
      // A serving-path healer's restoreIfTorn can land INSIDE this
      // two-rename window and put the old generation back (correct
      // from the reader's side: it must never start from an empty
      // dir), leaving our install target occupied. Detect that exact
      // shape — old copy back at p, bak consumed by the heal, our tmp
      // untouched — take the restored copy aside again and finish the
      // install, so a live maintainer doesn't fail spuriously under
      // reader load (round-11 cross-process live-appender race). A
      // second interference in the re-opened window throws, and the
      // caller's retry-level protocol converges as for any crash.
      val healed =
        !fs.exists(bakP) && fs.exists(p) && fs.exists(new Path(tmp))
      if (!(healed && fs.rename(p, bakP) && fs.rename(new Path(tmp), p))) {
        if (fs.exists(bakP) && !fs.exists(p)) fs.rename(bakP, p) // roll back
        throw new java.io.IOException(s"graft swap: cannot install $tmp")
      }
    }
    trip(tag, "beforeBakDrop")
    fs.delete(bakP, true)
  }

  /** Read the state table at `path` (restoring a torn swap first), or
    * an empty relation with `schema` before the first install. */
  def readOrEmpty(spark: SparkSession, path: String, schema: StructType,
                  tag: String = "merge"): DataFrame = {
    restoreIfTorn(spark, path, tag)
    val fs = fsOf(spark, path)
    if (fs.exists(new Path(path)))
      spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
