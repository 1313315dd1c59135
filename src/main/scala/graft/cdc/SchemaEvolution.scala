package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Schema evolution for the change table — what happens when the source
  * adds a column mid-stream (the reference's ALTER TABLE + change
  * tracking continuing; CHANGETABLE keeps serving old and new rows side
  * by side).
  *
  * Contract: evolution is ADDITIVE (new nullable payload columns).
  * Pages written before the change keep their files untouched — at
  * 100 TB a feed rewrite on every ALTER is a non-starter — and the
  * merged read backfills the new columns with NULL for pre-evolution
  * rows at scan time. Parquet's per-file footer makes this free:
  * `mergeSchema` unions the footers once at planning (a driver-side
  * merge over file metadata, not a data pass), and each file's reader
  * projects the union schema with nulls for absent columns.
  *
  * Column order is canonicalized — feed keys first, payload sorted by
  * name — because the merged order otherwise depends on which file the
  * planner visits first; downstream code and oracles need a stable
  * shape. */
object SchemaEvolution {

  /** Merged read of an evolved change table: every page's rows under
    * the UNION schema, pre-evolution rows null-backfilled. */
  def readEvolved(spark: SparkSession, dir: String,
                  keyCols: Seq[String] =
                    Seq("entity_id", "change_version", "change_operation"))
      : DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    val keys = keyCols.filter(df.columns.contains)
    val payload = df.columns.filterNot(keys.contains).sorted
    df.select((keys ++ payload).map(col): _*)
  }

  /** T5 collapse over an evolved feed: the newest full row per entity
    * under the merged schema. A winner written before the evolution
    * carries NULL in the later columns — the collapse does NOT splice
    * newer values into an older winning row (latest-row-wins, the
    * CHANGETABLE semantic, not per-column merge). */
  def latestSnapshot(spark: SparkSession, dir: String,
                     keyCols: Seq[String] =
                       Seq("entity_id", "change_version", "change_operation"))
      : DataFrame =
    Maintenance.logCompactRows(readEvolved(spark, dir, keyCols),
      upTo = Long.MaxValue)
}
