package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Rollback-safe directory install shared by the streaming state
  * maintainers ([[StreamingMerge]], [[StreamingScd2]]): write the new
  * generation to `<dir>.merge-tmp`, move the old aside to
  * `<dir>.merge-bak`, install, drop the bak. A crash between the two
  * renames leaves the only copy under the bak path —
  * [[restoreIfTorn]] puts it back before any reader starts from
  * empty (the silent-state-loss hazard). */
private[streaming] object DirSwap {

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def bakPath(path: String): String = path.stripSuffix("/") + ".merge-bak"
  def tmpPath(path: String): String = path.stripSuffix("/") + ".merge-tmp"

  /** Restore `<dir>.merge-bak` → `<dir>` after an interrupted swap. */
  def restoreIfTorn(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val p = new Path(path)
    val bakP = new Path(bakPath(path))
    if (!fs.exists(p) && fs.exists(bakP) && !fs.rename(bakP, p))
      throw new java.io.IOException(
        s"graft swap: cannot restore $bakP after interrupted swap")
  }

  /** Run `write` against the tmp path, then swap it in. */
  def install(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    val tmp = tmpPath(path)
    write(tmp)
    val fs = fsOf(spark, path)
    val p = new Path(path)
    val bakP = new Path(bakPath(path))
    if (fs.exists(bakP)) fs.delete(bakP, true)
    if (fs.exists(p) && !fs.rename(p, bakP))
      throw new java.io.IOException(s"graft swap: cannot move $path aside")
    if (!fs.rename(new Path(tmp), p)) {
      if (fs.exists(bakP)) fs.rename(bakP, p) // roll back
      throw new java.io.IOException(s"graft swap: cannot install $tmp")
    }
    fs.delete(bakP, true)
  }
}
