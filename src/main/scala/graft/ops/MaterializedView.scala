package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incrementally-maintained materialization of the denormalized BI view
  * (vw_invoice_header_line) — the Superset serving layer kept fresh from
  * the changefeed instead of rebuilt.
  *
  * Layout: parquet partitioned by `bucket = pmod(invoice_id, nBuckets)`.
  * A change page touches a bounded set of invoices → a bounded set of
  * bucket partitions; `refresh` recomputes ONLY those buckets (join
  * pruned by the bucket filter) and swaps them in with dynamic partition
  * overwrite. At 100 TB a poll-page refresh rewrites O(page) buckets
  * while the other ~nBuckets stay untouched — incremental cost
  * proportional to the change rate, not the view size. Readers always
  * see whole partitions (the overwrite is per-directory atomic swap).
  */
class MaterializedView(spark: SparkSession, dir: String, path: String,
                       nBuckets: Int = 64) {

  private def flatView(onlyBuckets: Option[Seq[Int]]): DataFrame = {
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val base = o.join(li, o("o_orderkey") === li("l_orderkey"), "inner")
      .select(
        col("o_orderkey").as("invoice_id"),
        col("o_custkey").as("customer_key"),
        col("o_orderdate").as("invoice_date"),
        col("o_orderstatus").as("status"),
        col("l_linenumber").as("line_no"),
        col("l_partkey").as("part_key"),
        round(col("l_quantity")).cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
      .withColumn("bucket", pmod(col("invoice_id"), lit(nBuckets.toLong)))
    onlyBuckets.fold(base)(bs => base.filter(col("bucket").isInCollection(bs)))
  }

  /** Full build — done once; later refreshes are incremental. */
  def build(): Unit =
    flatView(None).write.mode(SaveMode.Overwrite)
      .partitionBy("bucket").parquet(path)

  /** Incremental refresh from a change page: recompute and swap only the
    * buckets containing changed invoices. Dynamic partition overwrite
    * only replaces partitions PRESENT in the output — a bucket whose
    * recompute came back empty (its last invoice was deleted) would keep
    * serving stale rows forever — so empty-recompute buckets are dropped
    * explicitly after the swap. */
  def refresh(changedInvoiceIds: Seq[Long]): Unit = {
    if (changedInvoiceIds.isEmpty) return
    val buckets = changedInvoiceIds
      .map(id => (((id % nBuckets) + nBuckets) % nBuckets).toInt).distinct
    val out = flatView(Some(buckets)).cache()
    try {
      val present = out.select("bucket").distinct()
        .collect().map(_.getLong(0)).toSet
      out.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(path)
      // crash window: the dynamic overwrite committed but the
      // stale-bucket deletes below have not run — an emptied bucket
      // keeps serving its dead rows until the NEXT refresh of the
      // same page recomputes-empty again and deletes it (refresh is
      // the converging retry; CrashMatrixSpec kills here)
      if (MaterializedView.failAfterOverwrite)
        throw new RuntimeException(
          "graft failpoint: mview@afterOverwrite")
      val stale = buckets.filterNot(b => present(b.toLong))
      if (stale.nonEmpty) {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        stale.foreach { b =>
          fs.delete(new org.apache.hadoop.fs.Path(p, s"bucket=$b"), true)
        }
      }
    } finally out.unpersist()
  }

  def read(): DataFrame = spark.read.parquet(path)
}

object MaterializedView {
  /** Test-only failpoint: crash [[MaterializedView.refresh]] between
    * the partition overwrite and the stale-bucket deletes. */
  @volatile private[graft] var failAfterOverwrite: Boolean = false
}
