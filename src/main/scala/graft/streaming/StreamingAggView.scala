package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.cdc.{AggView, Merge}

/** [NORTH-STAR] STREAMING incremental aggregate-view maintenance: the
  * foreachBatch composition of [[graft.cdc.AggView]] — a grouped
  * count/sum view kept fresh from an endless changefeed, each
  * micro-batch folding in only its contribution deltas.
  *
  * Layout under `root`:
  *  - `log/batch_id=N/` — the change LOG, appended one partition per
  *    micro-batch (never rewritten; [[graft.cdc.Maintenance]]'s
  *    log-compaction pattern bounds it in steady state);
  *  - `view/` — the current (grp, n_rows, sum_cents) view, installed
  *    by [[DirSwap]], carrying its own `_gen` marker (the id of the
  *    last batch folded in) INSIDE the directory.
  *
  * Exactly-once without a two-directory transaction: the log append is
  * idempotent (dynamic overwrite of THIS batch's partition — a
  * redelivered batch rewrites identical bytes), and the view fold is
  * idempotent by generation — the marker rides the view's own DirSwap
  * rename, so view content and generation commit in ONE atomic step
  * and no crash can leave a folded view that claims otherwise. The
  * delta is always computed against the log RESTRICTED to
  * `batch_id < batchId`, so a crash in any window — after the append,
  * after the view swap, before the checkpoint commit — replays to the
  * same state: the recomputed delta never sees the current batch's own
  * log rows, whether or not they reached disk before the crash.
  *
  * Scale shape (100 TB): per batch the log gains a batch-sized
  * partition; the prior-state collapse is the one feed-wide aggregate
  * (at deployment scale the log is compacted so this reads
  * checkpoint + tail, and the semi-join prunes to touched entities);
  * the view join is group-cardinality. Nothing is rewritten but the
  * view — kilobytes — and the batch's own log partition.
  */
object StreamingAggView {

  val batchSchema: StructType = StructType(Seq(
    StructField("invoice_id", LongType),
    StructField("change_version", LongType),
    StructField("change_operation", StringType)))

  private def viewSchema: StructType = StructType(Seq(
    StructField("grp", StringType),
    StructField("n_rows", LongType),
    StructField("sum_cents", LongType)))

  private def minMaxSchema: StructType = StructType(Seq(
    StructField("grp", StringType),
    StructField("n_rows", LongType),
    StructField("min_cents", LongType),
    StructField("max_cents", LongType)))

  private def fsOf(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The id of the last batch folded into the view at
    * `root/<viewDir>`, or -1. The generation marker lives INSIDE the
    * view directory (`_gen`, invisible to the parquet reader like any
    * underscore file), so the DirSwap rename that installs the view
    * commits the marker in the SAME atomic step — there is no window
    * where the view is folded but the generation says otherwise (a
    * separate marker file would reopen the double-apply hazard this
    * module exists to close). */
  def viewGen(spark: SparkSession, root: String,
              viewDir: String = "view"): Long = {
    DirSwap.restoreIfTorn(spark, s"$root/$viewDir",
      if (viewDir == "view") "aggview" else "aggviewmm")
    val fs = fsOf(spark, root)
    val p = new Path(s"$root/$viewDir/_gen")
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeGenInto(spark: SparkSession, dir: String,
                           gen: Long): Unit = {
    val fs = fsOf(spark, dir)
    val out = fs.create(new Path(s"$dir/_gen"), true)
    try out.write(gen.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Latest-op-wins collapse WITHIN one batch (T5). */
  private def collapse(batch: DataFrame): DataFrame =
    batch.groupBy(col("invoice_id"))
      .agg(max(struct(col("change_version"), col("change_operation"))).as("m"))
      .select(col("invoice_id"),
        col("m.change_version").as("change_version"),
        col("m.change_operation").as("change_operation"))

  /** Shared per-batch mechanics: idempotent log append, then the
    * prior/touched/merged states derived from the log STRICTLY before
    * this batch — stable under redelivery whether or not this batch's
    * partition reached disk. */
  private case class BatchState(page: DataFrame, snap0: DataFrame,
                                touched0: DataFrame, newLive: DataFrame)

  private def appendAndDerive(spark: SparkSession, root: String,
                              batch: DataFrame, batchId: Long): BatchState = {
    val logDir = s"$root/log"
    val page = collapse(batch).localCheckpoint(true)
    page.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(logDir)
    val snap0 = spark.read.parquet(logDir)
      .filter(col("batch_id") < batchId)
      .groupBy(col("invoice_id"))
      .agg(max(struct(col("change_version"), col("change_operation"))).as("m"))
      .select(col("invoice_id"),
        col("m.change_version").as("change_version"),
        col("m.change_operation").as("change_operation"))
      .filter(col("change_operation") =!= "D")
    val touched0 = snap0.join(page.select("invoice_id"),
      Seq("invoice_id"), "left_semi")
    BatchState(page, snap0, touched0, Merge.mergeUpsert(touched0, page))
  }

  private def foldCountSum(spark: SparkSession, sfDir: String, root: String,
                           st: BatchState, batchId: Long): Unit = {
    if (viewGen(spark, root) >= batchId) return
    val oldView = DirSwap.readOrEmpty(spark, s"$root/view", viewSchema,
      tag = "aggview")
    val newView = AggView.applyDelta(oldView,
      AggView.contributions(spark, sfDir, st.touched0),
      AggView.contributions(spark, sfDir, st.newLive))
      .localCheckpoint(true)
    DirSwap.install(spark, s"$root/view", tag = "aggview") { tmp =>
      newView.coalesce(1).write.mode("overwrite").parquet(tmp)
      writeGenInto(spark, tmp, batchId)
    }
  }

  /** The min/max fold: its own generation-stamped view. The rescan
    * branch recomputes dirty groups from (snap0 minus touched) ∪
    * newLive — the v1 state derived from the log, no extra pass. */
  private def foldMinMax(spark: SparkSession, sfDir: String, root: String,
                         st: BatchState, batchId: Long): Unit = {
    if (viewGen(spark, root, "viewmm") >= batchId) return
    val snap1 = st.snap0.join(st.page.select("invoice_id"),
      Seq("invoice_id"), "left_anti").unionByName(st.newLive)
    val oldView = DirSwap.readOrEmpty(spark, s"$root/viewmm", minMaxSchema,
      tag = "aggviewmm")
    val newView = AggView.applyMinMaxDelta(oldView,
      AggView.contributions(spark, sfDir, st.touched0),
      AggView.contributions(spark, sfDir, st.newLive),
      groups => AggView.viewMinMax(
        AggView.contributions(spark, sfDir, snap1)
          .join(groups, Seq("grp"), "left_semi")))
      .localCheckpoint(true)
    DirSwap.install(spark, s"$root/viewmm", tag = "aggviewmm") { tmp =>
      newView.coalesce(1).write.mode("overwrite").parquet(tmp)
      writeGenInto(spark, tmp, batchId)
    }
  }

  /** Fold one micro-batch into the log and the count/sum view.
    * Idempotent for any redelivery pattern (see object doc). `sfDir`
    * locates the dimension side of the contribution join (orders). */
  def applyBatch(spark: SparkSession, sfDir: String, root: String,
                 batch: DataFrame, batchId: Long): Unit =
    foldCountSum(spark, sfDir, root,
      appendAndDerive(spark, root, batch, batchId), batchId)

  /** The min/max twin of [[applyBatch]]: same log append, its own
    * generation-stamped view. */
  def applyMinMaxBatch(spark: SparkSession, sfDir: String, root: String,
                       batch: DataFrame, batchId: Long): Unit =
    foldMinMax(spark, sfDir, root,
      appendAndDerive(spark, root, batch, batchId), batchId)

  /** The streaming maintainer: change pages arriving as parquet files
    * in `srcDir` fold into the selected view(s) continuously — ONE log
    * append per batch whatever the selection. One query = one
    * maintainer (own checkpoint); AvailableNow drains the backlog. */
  def maintain(spark: SparkSession, sfDir: String, srcDir: String,
               root: String, checkpointDir: String,
               countSum: Boolean = true,
               minMax: Boolean = false): StreamingQuery = {
    require(countSum || minMax, "select at least one view to maintain")
    spark.readStream.schema(batchSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val st = appendAndDerive(s, root, batch, batchId)
        if (countSum) foldCountSum(s, sfDir, root, st, batchId)
        if (minMax) foldMinMax(s, sfDir, root, st, batchId)
        ()
      }
      .start()
  }

  /** Compact the change log: collapse every applied batch to the
    * latest row per entity — INCLUDING tombstones, which later folds
    * still need to out-version — into one checkpoint partition at
    * `batch_id = -1`, installed with DirSwap. `-1 < batchId` for every
    * future batch, so [[appendAndDerive]]'s `batch_id < current`
    * prior-state read is untouched; only batches up to `upTo` CLAMPED
    * to the last FOLDED generation are folded in — an
    * appended-but-unfolded partition from a torn crash window stays a
    * separate partition whatever the caller asks. Run it from the T6
    * maintenance window; between compactions the per-batch prior-state
    * read costs checkpoint + tail, which is the standard log+compact
    * trade. */
  def compactLog(spark: SparkSession, root: String,
                 upTo: Option[Long] = None): Unit = {
    val logDir = s"$root/log"
    val fs = fsOf(spark, root)
    if (!fs.exists(new Path(logDir))) return
    // fold bound = the oldest generation any MAINTAINED view has
    // reached (a view dir that was never started doesn't hold the
    // compaction hostage); an explicit upTo is CLAMPED there too — a
    // caller must never fold an appended-but-unfolded (torn) partition
    // into the checkpoint, or its batch would replay to a zero delta
    // and vanish from the view
    // viewGen restores a torn swap before looking, so an
    // installed-but-torn view still bounds the compaction
    val gens = Seq("view", "viewmm")
      .map(g => viewGen(spark, root, g)).filter(_ >= 0)
    val folded = if (gens.isEmpty) -1L else gens.min
    val bound = math.min(upTo.getOrElse(folded), folded)
    if (bound < 0) return
    val compacted = spark.read.parquet(logDir)
      .filter(col("batch_id") <= bound)
      .groupBy(col("invoice_id"))
      .agg(max(struct(col("change_version"), col("change_operation"))).as("m"))
      .select(col("invoice_id"),
        col("m.change_version").as("change_version"),
        col("m.change_operation").as("change_operation"))
      .withColumn("batch_id", lit(-1L))
    val tail = spark.read.parquet(logDir)
      .filter(col("batch_id") > bound)
      .select("invoice_id", "change_version", "change_operation", "batch_id")
    val next = compacted.unionByName(tail).localCheckpoint(true)
    DirSwap.install(spark, logDir, tag = "aggviewlog") { tmp =>
      next.write.mode("overwrite").partitionBy("batch_id").parquet(tmp)
    }
  }

  /** The current view (empty before the first fold). */
  def currentView(spark: SparkSession, root: String): DataFrame =
    DirSwap.readOrEmpty(spark, s"$root/view", viewSchema, tag = "aggview")

  /** The current min/max view (empty before the first fold). */
  def currentMinMaxView(spark: SparkSession, root: String): DataFrame =
    DirSwap.readOrEmpty(spark, s"$root/viewmm", minMaxSchema,
      tag = "aggviewmm")
}
