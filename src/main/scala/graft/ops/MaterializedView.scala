package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.DirSwap

/** Incrementally-maintained materialization of the denormalized BI view
  * (vw_invoice_header_line) — the Superset serving layer kept fresh from
  * the changefeed instead of rebuilt.
  *
  * Layout: parquet under `bucket = pmod(invoice_id, nBuckets)` partition
  * directories. A change page touches a bounded set of invoices → a
  * bounded set of bucket partitions; `refresh` recomputes ONLY those
  * buckets (join reduced by the bucket predicate — honest note: that
  * prunes ROWS, not IO, since `pmod(invoice_id)` is no partition
  * column of the base tables; at deployment scale the recompute side
  * reads a bucket-aligned state layout
  * ([[graft.plans.StateLayout]]-style) so touched-bucket IO is pruned
  * too) and swaps each one in via
  * the rollback-safe [[DirSwap]] (tag "mview"): one staging write job
  * for the whole page, then a metadata-only rename pair per bucket. At
  * 100 TB a poll-page refresh REWRITES O(page) buckets while the other
  * ~nBuckets stay untouched — write cost proportional to the change
  * rate, not the view size.
  *
  * Why not dynamic partition overwrite: Spark's committer DELETES each
  * touched partition directory before moving the new files in, so a
  * reader that planned against the old files has an unhealable window
  * (its inputs are simply gone, and a crash inside the commit leaves
  * NO copy of the bucket). The per-bucket DirSwap keeps the standard
  * invariant instead — a crash at any window leaves a generation
  * restorable, and [[read]] heals torn buckets before listing, the
  * same serving posture as every other swap site. */
class MaterializedView(spark: SparkSession, dir: String, path: String,
                       nBuckets: Int = 64) {

  private def fs = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

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

  /** Full build — done once; later refreshes are incremental. No
    * readers exist before the first build, so the plain overwrite is
    * fine here; only the steady-state refresh needs swap semantics. */
  def build(): Unit =
    flatView(None).write.mode(SaveMode.Overwrite)
      .partitionBy("bucket").parquet(path)

  /** Incremental refresh from a change page: recompute and swap only
    * the buckets containing changed invoices. One staging job writes
    * every recomputed bucket next to the view
    * (`<path>.mview-stage`), then each bucket directory is installed
    * with [[DirSwap]] — the write step is a rename out of staging, so
    * the per-bucket cost is metadata-only. A bucket whose recompute
    * came back empty (its last invoice was deleted) would keep serving
    * stale rows forever, so empty-recompute buckets are deleted
    * explicitly after the swaps; a crash between the swaps and those
    * deletes (the failAfterOverwrite window CrashMatrixSpec kills)
    * converges on the retried refresh, exactly as before. */
  def refresh(changedInvoiceIds: Seq[Long]): Unit = {
    if (changedInvoiceIds.isEmpty) return
    heal()
    val buckets = changedInvoiceIds
      .map(id => (((id % nBuckets) + nBuckets) % nBuckets).toInt).distinct
    val staging = path.stripSuffix("/") + ".mview-stage"
    val out = flatView(Some(buckets)).cache()
    try {
      val present = out.select("bucket").distinct()
        .collect().map(_.getLong(0)).toSet
      out.write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(staging)
      buckets.filter(b => present(b.toLong)).foreach { b =>
        DirSwap.install(spark, s"$path/bucket=$b", "mview") { tmp =>
          val tmpP = new Path(tmp)
          if (fs.exists(tmpP)) fs.delete(tmpP, true)
          if (!fs.rename(new Path(s"$staging/bucket=$b"), tmpP))
            throw new java.io.IOException(
              s"graft mview: cannot stage bucket $b")
        }
      }
      // crash window: the bucket swaps committed but the stale-bucket
      // deletes below have not run — an emptied bucket keeps serving
      // its dead rows until the NEXT refresh of the same page
      // recomputes-empty again and deletes it (refresh is the
      // converging retry; CrashMatrixSpec kills here)
      if (MaterializedView.failAfterOverwrite)
        throw new RuntimeException(
          "graft failpoint: mview@afterOverwrite")
      val stale = buckets.filterNot(b => present(b.toLong))
      stale.foreach { b =>
        fs.delete(new Path(s"$path/bucket=$b"), true)
      }
    } finally {
      out.unpersist()
      fs.delete(new Path(staging), true)
      ()
    }
  }

  /** Restore any bucket a crashed (or in-flight) swap left torn — the
    * serving-path heal, run before every read and refresh. Scans for
    * `bucket=N.mview-bak` siblings; each is the standard DirSwap torn
    * shape for its bucket directory. */
  def heal(): Unit = {
    val p = new Path(path)
    if (!fs.exists(p)) return
    fs.listStatus(p).map(_.getPath.getName).foreach {
      case MaterializedView.BakName(b) =>
        DirSwap.restoreIfTorn(spark, s"$path/bucket=$b", "mview")
      case _ => ()
    }
  }

  /** Serving read: heal torn buckets, then read exactly the committed
    * bucket directories (explicit leaf list + basePath, so in-flight
    * swap siblings — `*.mview-tmp` / `*.mview-bak` / the staging dir —
    * are never mistaken for partitions). */
  def read(): DataFrame = {
    heal()
    val p = new Path(path)
    val dirs =
      if (!fs.exists(p)) Array.empty[String]
      else fs.listStatus(p).map(_.getPath)
        .filter(d => MaterializedView.DataName.matches(d.getName))
        .map(_.toString).sorted
    if (dirs.isEmpty) {
      // same schema as the non-empty branch: partition inference types
      // the bucket dir names as INT, not flatView's long
      val schema = org.apache.spark.sql.types.StructType(
        flatView(None).schema.map(f =>
          if (f.name == "bucket")
            f.copy(dataType = org.apache.spark.sql.types.IntegerType)
          else f))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else
      spark.read.option("basePath", path).parquet(dirs.toIndexedSeq: _*)
  }
}

object MaterializedView {
  private val BakName = """bucket=(\d+)\.mview-bak""".r
  private val DataName = """bucket=\d+""".r
  /** Test-only failpoint: crash [[MaterializedView.refresh]] between
    * the bucket swaps and the stale-bucket deletes. */
  @volatile private[graft] var failAfterOverwrite: Boolean = false
}
