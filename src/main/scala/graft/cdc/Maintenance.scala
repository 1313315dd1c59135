package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.sinks.DocumentSink
import graft.streaming.DirSwap

/** T6 end-to-end maintenance window — ONE job wiring the pieces that
  * existed separately ([[Retention]], [[DocumentSink.compact]]):
  *
  *  1. expire the change table past the retention watermark (the
  *     reference's CHANGE_RETENTION AUTO_CLEANUP,
  *     setup-invoice-db.sql:70-72),
  *  2. log-compact the surviving prefix — newest FULL row per entity
  *     at or below the compaction bound, tail untouched so in-flight
  *     consumers keep a consistent feed — rewritten version-ordered so
  *     parquet footer stats keep the cdc source's O(1)-files-per-page
  *     pruning,
  *  3. compact the document sink to its deduplicated survivors, one
  *     file per version bucket.
  *
  * Both rewrites install via the rollback-safe [[DirSwap]], so a crash
  * mid-maintenance leaves the previous generation restorable and every
  * reader self-heals. Rerunnable: a second run is a no-op on rows.
  * File counts after the job are bounded by `nFiles` + bucket count —
  * not by how many polls were ever delivered.
  */
object Maintenance {

  case class Report(changeRows: Long, changeFiles: Long,
                    sinkDocs: Long, sinkFiles: Long)

  /** Newest full row per entity among changes at or below `upTo`;
    * newer changes pass through untouched. Unlike
    * [[Retention.logCompact]] (the key-projection flavor) this keeps
    * every column — the rehydratable form a sink can replay from. One
    * shuffle on the high-cardinality entity key. */
  def logCompactRows(changes: DataFrame, upTo: Long,
                     entityCol: String = "entity_id",
                     versionCol: String = "change_version"): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(versionCol).desc)
    changes.filter(col(versionCol) <= upTo)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .unionByName(changes.filter(col(versionCol) > upTo))
  }

  /** Expire + log-compact + version-ordered rewrite of a parquet
    * change table, in place (DirSwap tag "retain"). The table follows
    * the feed schema contract the cdc source also relies on:
    * `entity_id` + `change_version` columns (CdcFiles). */
  def maintainChangeTable(spark: SparkSession, changeDir: String,
                          watermark: Long, compactUpTo: Long,
                          nFiles: Int): Unit = {
    DirSwap.restoreIfTorn(spark, changeDir, "retain")
    val kept = logCompactRows(
      Retention.expire(spark.read.parquet(changeDir), watermark),
      compactUpTo)
    DirSwap.install(spark, changeDir, "retain")(tmp =>
      Retention.writeCompacted(kept, tmp, nFiles))
  }

  /** One full maintenance window over a change table + document sink. */
  def run(spark: SparkSession, changeDir: String, sinkDir: String,
          watermark: Long, compactUpTo: Long, nFiles: Int,
          sinkSchema: Option[StructType] = None): Report = {
    maintainChangeTable(spark, changeDir, watermark, compactUpTo, nFiles)
    DocumentSink.compact(spark, sinkDir, sinkSchema)
    // through the Hadoop FileSystem like every other path here — a
    // java.io walk would silently report 0 on hdfs://-style stores
    def filesUnder(dir: String, suffix: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext)
        if (it.next().getPath.getName.endsWith(suffix)) n += 1
      n
    }
    Report(
      changeRows = spark.read.parquet(changeDir).count(),
      changeFiles = filesUnder(changeDir, ".parquet"),
      sinkDocs = DocumentSink.readBack(spark, sinkDir, sinkSchema).count(),
      sinkFiles = filesUnder(sinkDir, ".json"))
  }
}
