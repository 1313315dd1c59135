package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot DIFF between two feed versions — the "what changed between
  * my last sync and now" report every CDC consumer derives before
  * applying a batch (the reference's consumers infer it implicitly by
  * overwriting per-document files, `invoice-api/server.js`; surfacing
  * it as a relation makes the batch auditable). Each entity touched in
  * `(vA, vB]` is classified:
  *
  *   - `A` (added):   not live at vA, live at vB (no visible vA version)
  *   - `R` (removed): live at vA, deleted by vB (version_b = the delete)
  *   - `C` (changed): live at both, version advanced
  *
  * A delete of an entity that was never live is invisible (no row), as
  * in the direct snapshot diff.
  *
  * Scale notes (100 TB): the diff is driven by the CHANGE BATCH, never
  * by the snapshot pair — an entity untouched in `(vA, vB]` cannot
  * differ, so the left side is the `(vA, vB]` collapse (batch-sized)
  * and the vA state joins it on the batch keys. With the state bucketed
  * by entity ([[graft.plans.StateLayout]]) the lookup is a per-bucket
  * merge join; cost is proportional to the change rate, not the table.
  * SnapshotDiffSpec proves this batch-driven form equal to the direct
  * diff of the two full snapshots at every split and on arbitrary
  * ScalaCheck feeds.
  */
object SnapshotDiff {

  /** Latest-op-wins collapse of a generic (invoice_id, change_version,
    * change_operation) feed over `(since, to]` — the same one-shuffle
    * shape as [[TombstoneCdc.changedInvoicesOps]]. */
  private def collapse(feed: DataFrame, since: Long, to: Long): DataFrame =
    feed.filter(col("change_version") > since && col("change_version") <= to)
      .groupBy(col("invoice_id"))
      .agg(max(struct(col("change_version"), col("change_operation"))).as("m"))
      .select(col("invoice_id"),
        col("m.change_version").as("change_version"),
        col("m.change_operation").as("change_operation"))

  /** Batch-driven diff of a generic ops feed: classify every entity
    * touched in `(vA, vB]` against its ≤vA state. */
  def diff(feed: DataFrame, vA: Long, vB: Long): DataFrame = {
    val batch = collapse(feed, vA, vB)
      .select(col("invoice_id"),
        col("change_version").as("version_b"),
        col("change_operation").as("op_b"))
    // vA state restricted to the touched keys: the ≤vA collapse joined
    // on the batch — at scale a bucket-pruned state read, here the
    // collapse rides one shuffle with the batch-keyed join.
    val oldState = collapse(feed, 0L, vA)
      .select(col("invoice_id"),
        col("change_version").as("version_a"),
        col("change_operation").as("op_a"))
    val liveA = col("op_a").isNotNull && col("op_a") =!= "D"
    batch.join(oldState, Seq("invoice_id"), "left")
      .withColumn("diff_op",
        when(!liveA && col("op_b") =!= "D", lit("A"))
          .when(liveA && col("op_b") === "D", lit("R"))
          .when(liveA && col("op_b") =!= "D", lit("C")))
      .filter(col("diff_op").isNotNull)
      .select(col("invoice_id"), col("diff_op"),
        // an added entity has no visible vA version
        when(liveA, col("version_a")).as("version_a"),
        col("version_b"))
  }

  /** The diff over the synthetic invoice feed (header ∪ line ops). */
  def invoiceDiff(spark: SparkSession, dir: String,
                  vA: Long, vB: Long): DataFrame =
    diff(TombstoneCdc.headerFeedOps(spark, dir)
      .unionByName(TombstoneCdc.lineFeedOps(spark, dir)), vA, vB)

  /** The events table as an ops feed: entity = user, version = event id,
    * operation by a deterministic mod-13 rule. Unlike the invoice feed
    * (exactly two adjacent versions per entity), users carry many
    * versions scattered across the whole range, so any window exercises
    * all three diff classes. */
  def eventFeedOps(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir).select(
      col("user_id").as("invoice_id"),
      col("event_id").as("change_version"),
      when(pmod(col("event_id"), lit(13)) === 0, lit("D"))
        .when(pmod(col("event_id"), lit(13)) < 4, lit("I"))
        .otherwise(lit("U")).as("change_operation"))

  /** The diff over the event feed, entity column named for the table. */
  def eventDiff(spark: SparkSession, dir: String,
                vA: Long, vB: Long): DataFrame =
    diff(eventFeedOps(spark, dir), vA, vB)
      .withColumnRenamed("invoice_id", "entity_id")

  /** Ground-truth form: full-outer diff of the vA LIVE snapshot against
    * the full ≤vB op-collapse (D rows kept so a removal reports the
    * delete's version, exactly as the batch-driven form does). Rescans
    * both full collapses — the spec's reference, not the serving path. */
  def directDiff(feed: DataFrame, vA: Long, vB: Long): DataFrame = {
    val a = collapse(feed, 0L, vA)
      .filter(col("change_operation") =!= "D")
      .select(col("invoice_id"), col("change_version").as("version_a"))
    val b = collapse(feed, 0L, vB)
      .select(col("invoice_id"),
        col("change_version").as("version_b"),
        col("change_operation").as("op_b"))
    a.join(b, Seq("invoice_id"), "full_outer")
      .withColumn("diff_op",
        when(col("version_a").isNull && col("op_b") =!= "D", lit("A"))
          .when(col("version_a").isNotNull && col("op_b") === "D", lit("R"))
          .when(col("version_a").isNotNull && col("op_b") =!= "D" &&
            col("version_a") =!= col("version_b"), lit("C")))
      .filter(col("diff_op").isNotNull)
      .select(col("invoice_id"), col("diff_op"),
        col("version_a"), col("version_b"))
  }
}
