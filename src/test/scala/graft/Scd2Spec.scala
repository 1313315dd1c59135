package graft

import org.apache.spark.sql.functions._
import graft.cdc.{Scd2, TombstoneCdc}

/** SCD Type-2 history: interval algebra, dedup, snapshot equivalence,
  * and the one-shuffle plan shape. */
class Scd2Spec extends SparkSpec {

  private lazy val hist = Scd2.invoiceHistory(spark, sf).cache()

  test("intervals are contiguous, non-overlapping, and uniquely current") {
    val bad = hist
      .withColumn("next_from", lead(col("valid_from"), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("invoice_id").orderBy("valid_from")))
      .filter(
        // interval must be non-empty and closed by the next change
        (col("valid_to").isNotNull && col("valid_to") <= col("valid_from")) ||
          (col("next_from").isNotNull && col("valid_to") =!= col("next_from")) ||
          // open interval only on the last change
          (col("next_from").isNull && col("valid_to").isNotNull))
    assert(bad.isEmpty,
      s"broken intervals: ${bad.limit(5).collect().mkString("; ")}")
    val currents = hist.groupBy("invoice_id")
      .agg(sum(col("is_current")).as("n_current"))
      .filter(col("n_current") =!= 1)
    assert(currents.isEmpty, "every entity must have exactly one current row")
  }

  test("per-line duplicate versions collapse to one change") {
    val dups = hist.groupBy("invoice_id", "valid_from").count()
      .filter(col("count") > 1)
    assert(dups.isEmpty, "duplicate (entity, valid_from) in history")
  }

  test("snapshotAt(v) equals the latest-op-wins collapse at v") {
    val v = 4000L
    val viaHistory = Scd2.snapshotAt(hist, v)
      .select(col("invoice_id"), col("change_operation"),
        col("version_at").as("change_version"))
    val viaCollapse = TombstoneCdc.changedInvoicesOps(spark, sf, 0L, v)
      .filter(col("change_operation") =!= "D")
      .select("invoice_id", "change_operation", "change_version")
    assert(viaHistory.exceptAll(viaCollapse).isEmpty &&
      viaCollapse.exceptAll(viaHistory).isEmpty,
      "history snapshot diverges from the collapse-based snapshot")
  }

  test("plan: lag-dedup and lead share one exchange and one sort") {
    // AQE prints current + initial plan; keep the current one only
    val plan = Scd2.invoiceHistory(spark, sf)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1,
      s"expected exactly one exchange (the entity window):\n$plan")
    assert(plan.linesIterator.count(_.contains("Sort")) == 1,
      s"expected one sort shared by both window passes:\n$plan")
  }
}
