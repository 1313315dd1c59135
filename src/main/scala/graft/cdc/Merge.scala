package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE/upsert — applying a collapsed change batch to a materialized
  * snapshot table: the state maintenance every CDC consumer runs on
  * each poll (the reference's consumer keeps per-document files and
  * overwrites by invoice number, server.js; this is the same semantics
  * on a relational state table). Inserts and updates replace the
  * entity's row, deletes remove it, untouched entities pass through.
  *
  * Scale notes (100 TB): one full-outer shuffle join on the entity key
  * — the change side is a poll batch (small), the state side is the
  * big table; with the state written bucketed by entity
  * ([[graft.plans.StateLayout]]) the state side needs NO exchange and
  * the merge is a per-bucket merge join, which is exactly how
  * table-format MERGE (Delta/Iceberg) executes. Version-compare (not
  * blind replace) makes the merge idempotent under batch replay — the
  * at-least-once redelivery the exactly-once protocol produces after a
  * crash collapses to the same state.
  */
object Merge {

  /** Apply a collapsed change batch to the live state. Both inputs are
    * (invoice_id, change_version, change_operation); state rows are
    * live (op ≠ D). A change wins when the state has no row or the
    * change is not older; a winning D removes the entity. */
  def mergeUpsert(state: DataFrame, changes: DataFrame): DataFrame = {
    val s = state.select(col("invoice_id"),
      col("change_version").as("s_version"),
      col("change_operation").as("s_op"))
    val c = changes.select(col("invoice_id"),
      col("change_version").as("c_version"),
      col("change_operation").as("c_op"))
    val pickC = col("s_version").isNull ||
      (col("c_version").isNotNull && col("c_version") >= col("s_version"))
    s.join(c, Seq("invoice_id"), "full_outer")
      .select(col("invoice_id"),
        when(pickC, col("c_version")).otherwise(col("s_version"))
          .as("change_version"),
        when(pickC, col("c_op")).otherwise(col("s_op"))
          .as("change_operation"))
      .filter(col("change_operation") =!= "D")
  }

  /** The live snapshot at version `v` built from the synthetic feed:
    * latest-op-wins collapse with deletes dropped. */
  def liveSnapshot(spark: SparkSession, dir: String, v: Long): DataFrame =
    TombstoneCdc.changedInvoicesOps(spark, dir, 0L, v)
      .filter(col("change_operation") =!= "D")

  /** Incremental maintenance step: state(v0) + changes(v0, v1] — equal
    * to liveSnapshot(v1) for every split (MergeSpec property). */
  def incrementalSnapshot(spark: SparkSession, dir: String,
                          v0: Long, v1: Long): DataFrame =
    mergeUpsert(
      liveSnapshot(spark, dir, v0),
      TombstoneCdc.changedInvoicesOps(spark, dir, v0, v1))
}
