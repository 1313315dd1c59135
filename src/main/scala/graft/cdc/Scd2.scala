package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history derived from the change
  * feed: every change becomes a half-open validity interval
  * `[valid_from, valid_to)` per entity, newest interval open
  * (`valid_to` null, `is_current` set). This is the warehouse-side
  * materialization every CDC consumer eventually builds from a feed
  * like the reference's `CHANGETABLE` stream (reference
  * sqls/storedprocedure.sql:17 exposes the raw changes; the history
  * table is what BI dashboards join against to answer "state as of
  * version V").
  *
  * Scale notes (100 TB): one window shuffle partitioned by the entity
  * id — high cardinality, so partitions stay balanced and no single
  * task sees more rows than one entity's change count (bounded by the
  * retention window, T6). No joins, no driver-side state; the as-of
  * read is a stateless filter over the history table, so with the
  * table written partitioned/bucketed by entity the snapshot read is
  * scan-pruned exactly like [[graft.plans.StateLayout]]'s merge join.
  */
object Scd2 {

  /** Build the SCD2 history from an ops feed
    * (invoice_id, change_version, change_operation): per entity, each
    * change is valid from its own version until the next change's
    * version (exclusive); the last change per entity is current.
    *
    * The feed may carry several rows for one (entity, version) — e.g.
    * one per line of the entity — and a change table records one change
    * per (entity, version), so duplicates are dropped first. The dedup
    * is a `lag` filter inside the SAME window pass (same partitioning
    * and order as the `lead`), NOT a `.distinct()`: distinct would hash
    * on all columns and cost a second exchange, where both window
    * functions here share one shuffle + one sort (asserted in
    * Scd2Spec). Duplicate rows are identical by the feed contract, so
    * keeping the first in window order is deterministic. The order
    * carries `change_operation` as a tiebreaker so that even a feed
    * VIOLATING that contract (two different ops at one version) picks
    * its survivor deterministically instead of by partition layout. */
  def history(feedOps: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("invoice_id"))
      .orderBy(col("change_version"), col("change_operation"))
    feedOps
      .select(col("invoice_id"), col("change_operation"), col("change_version"))
      .withColumn("prev_version", lag(col("change_version"), 1).over(w))
      .filter(col("prev_version").isNull ||
        col("prev_version") =!= col("change_version"))
      .select(
        col("invoice_id"),
        col("change_operation"),
        col("change_version").as("valid_from"),
        lead(col("change_version"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull.cast("long"))
  }

  /** The full synthetic-feed history (header + line ops feeds). */
  def invoiceHistory(spark: SparkSession, dir: String): DataFrame =
    history(TombstoneCdc.headerFeedOps(spark, dir)
      .unionByName(TombstoneCdc.lineFeedOps(spark, dir)))

  /** Point-in-time state read over the history: the one interval per
    * entity covering version `v` — unless that interval is a delete
    * (the entity did not exist at `v`). The read every "state as of"
    * dashboard question compiles to; generalizes the reference's
    * `<= @ToVersion` snapshot bound (storedprocedure.sql:18,26). */
  def snapshotAt(historyDf: DataFrame, v: Long): DataFrame =
    historyDf
      .filter(col("valid_from") <= v &&
        (col("valid_to").isNull || col("valid_to") > v))
      .filter(col("change_operation") =!= "D")
      .select(col("invoice_id"), col("change_operation"),
        col("valid_from").as("version_at"))
}
