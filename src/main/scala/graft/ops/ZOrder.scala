package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two scaled
  * dimensions so that sorting by the single z-value co-locates rows
  * that are close in BOTH dimensions, giving every written file a
  * tight min/max envelope on each source column simultaneously — the
  * multi-dimensional clustering that makes stats-based skipping
  * (parquet row-group stats today, a table-format file index at
  * 100 TB) effective for 2-D box predicates. A single-column sort
  * tightens stats only on the sort key: every file still spans the
  * full range of the other column, and a predicate on it prunes
  * nothing.
  *
  * All pure column math (shift/and/or on longs — whole-stage codegen,
  * no UDF): each dimension is affinely scaled to a 16-bit code, the
  * codes are bit-spread with the classic Morton magic masks, and the
  * z-value is their interleave. The scan-time predicate stays on the
  * ORIGINAL columns — the z-value only drives the write-side
  * clustering, so there is no BIGMIN/false-negative concern: skipping
  * comes from per-file column stats, which are conservative.
  *
  * Reference anchor: the reference's only layout lever is the rowversion
  * clustered index (sqls/setup-invoice-db.sql:21-28, single-dimension);
  * multi-dimensional clustering is part of the 100 TB curation surface
  * the [NORTH-STAR] rows mandate (SURVEY §2.11).
  */
object ZOrder {

  /** Max code per dimension: 16 bits → z fits in 32 of a long's 64. */
  val MaxCode: Long = (1L << 16) - 1

  /** Spread the low 16 bits of `c` so bit i lands at position 2i
    * (Morton magic masks). */
  def spread16(c: Column): Column = {
    val masked = c.bitwiseAND(lit(MaxCode))
    val s1 = masked.bitwiseOR(shiftleft(masked, 8))
      .bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Affine scale of a long column with known [min, max] bounds to a
    * 16-bit code. Bounds come from a one-row aggregate (driver-side
    * literals — same trick as the ScalableRank band boundaries). The
    * multiply stays exact long arithmetic; only the final divide goes
    * through double (Column `/` is double division), exact while
    * (max−min)·65535 < 2⁵³ — any 37-bit domain. */
  def scale16(c: Column, min: Long, max: Long): Column =
    if (max <= min) lit(0L)
    else greatest(lit(0L), least(lit(MaxCode),
      floor((c.cast("long") - lit(min)) * lit(MaxCode) / lit(max - min))
        .cast("long")))

  /** The interleaved z-value of two 16-bit codes (a even bits, b odd). */
  def z2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Write `df` z-ordered by (`colA`, `colB`) (longs with the given
    * bounds) into `files` parquet files at `path`: range-partition by
    * z so each file owns a contiguous z-interval, sort within, drop
    * the helper column. `files` scales with data volume at the
    * caller (rows / target-file-rows), fixed small here for the test
    * geometry. Alongside the data a `_ZSTATS` index records each
    * file's (min, max) envelope on both columns — the file-skipping
    * index [[prunedScan]] consults (what a table format keeps in its
    * manifest; the leading underscore keeps parquet readers off it).
    * The index is one aggregate over the written files, file-count
    * rows to the driver. */
  def layout(df: DataFrame, path: String,
             colA: String, aMin: Long, aMax: Long,
             colB: String, bMin: Long, bMax: Long,
             files: Int): Unit = {
    df.withColumn("__z", z2(
        scale16(col(colA), aMin, aMax), scale16(col(colB), bMin, bMax)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    writeStats(df.sparkSession, path, colA, colB)
  }

  /** Incremental ingest into a [[layout]]: z-sort the batch UNDER THE
    * LAYOUT'S ORIGINAL BOUNDS (so old and new files share one curve)
    * and append its files, then extend the stats index with ONLY the
    * new files' envelopes (existing files are immutable, their lines
    * carry over) — no rewrite of existing data, cost ∝ batch (the
    * growing-corpus twin of the bucketed vector layouts' append).
    * Each append adds `files` files; fold back with a periodic
    * [[layout]] rebuild, the same maintenance-window trade the change
    * table makes with log compaction. Out-of-bounds batch values are
    * safe: [[scale16]] clamps their codes to the curve's edge cells
    * and the index records the files' TRUE envelopes, so pruning
    * stays conservative (edge files just carry wider envelopes until
    * a rebuild). A crash between the data commit and the index
    * refresh is also safe: [[prunedScan]] treats files the index
    * doesn't know as hot. */
  def append(batch: DataFrame, path: String,
             colA: String, aMin: Long, aMax: Long,
             colB: String, bMin: Long, bMax: Long,
             files: Int): Unit = {
    batch.withColumn("__z", z2(
        scale16(col(colA), aMin, aMax), scale16(col(colB), bMin, bMax)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("append").parquet(path)
    val spark = batch.sparkSession
    val known = readStatsLines(spark, path)
      .map(_.takeWhile(_ != '\t')).toSet
    val newFiles = listDataFiles(spark, path).filterNot(known)
    writeStats(spark, path, colA, colB, onlyFiles = Some(newFiles))
  }

  private def fsOf(spark: org.apache.spark.sql.SparkSession,
                   path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The layout's data files, in `input_file_name()` URI form so index
    * lines and listings compare exactly. */
  private def listDataFiles(spark: org.apache.spark.sql.SparkSession,
                            path: String): Seq[String] =
    fsOf(spark, path)
      .listStatus(new org.apache.hadoop.fs.Path(path))
      .toSeq.filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.toUri.toString)

  private def readStatsLines(spark: org.apache.spark.sql.SparkSession,
                             path: String): List[String] = {
    val fs = fsOf(spark, path)
    val p = new org.apache.hadoop.fs.Path(path, "_ZSTATS")
    if (!fs.exists(p)) Nil
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    }
  }

  /** (Re)build the `_ZSTATS` index — or, with `onlyFiles`, aggregate
    * just those files' envelopes and carry the existing lines over
    * (append cost ∝ batch). Installed via write-temp-then-rename so a
    * racing reader sees either the previous or the new COMPLETE index,
    * never a truncated one. */
  private def writeStats(spark: org.apache.spark.sql.SparkSession,
                         path: String, colA: String, colB: String,
                         onlyFiles: Option[Seq[String]] = None): Unit = {
    val scan = onlyFiles match {
      case Some(fs) if fs.isEmpty => return
      case Some(fs) => spark.read.parquet(fs: _*)
      case None => spark.read.parquet(path)
    }
    val stats = scan
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colA)).as("alo"), max(col(colA)).as("ahi"),
        min(col(colB)).as("blo"), max(col(colB)).as("bhi"))
      .collect() // one row per aggregated file
    val fresh = stats.map { r =>
      Seq(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)).mkString("\t")
    }
    val carried =
      if (onlyFiles.isEmpty) Nil else readStatsLines(spark, path)
    val body = (carried ++ fresh).sorted.distinct.mkString("", "\n", "\n")
    val fs = fsOf(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(path, "._ZSTATS-tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(path, "_ZSTATS")
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"graft zstats: cannot install $dst")
  }

  /** Scan the z-layout at `path` reading ONLY the files whose `_ZSTATS`
    * envelope intersects the [aLo,aHi]×[bLo,bHi] box — file-level
    * skipping off the driver-side index (file-count-sized), the move a
    * table-format scan makes from its manifest. CONSERVATIVE on every
    * edge: a data file the index doesn't know (crash between a data
    * commit and the index refresh, or no index at all) is treated as
    * hot and scanned — only a recorded non-intersecting envelope ever
    * skips a file. The box filter is re-applied to the surviving rows
    * (envelopes are conservative too), so the result is identical to
    * filtering a full scan. An empty candidate set returns the empty
    * relation with the layout's schema. */
  def prunedScan(spark: org.apache.spark.sql.SparkSession, path: String,
                 colA: String, aLo: Long, aHi: Long,
                 colB: String, bLo: Long, bHi: Long): DataFrame = {
    val cold = readStatsLines(spark, path).map(_.split('\t')).collect {
      case Array(f, alo, ahi, blo, bhi)
        if alo.toLong > aHi || ahi.toLong < aLo ||
          blo.toLong > bHi || bhi.toLong < bLo => f
    }.toSet
    val hot = listDataFiles(spark, path).filterNot(cold)
    val scan =
      if (hot.nonEmpty) spark.read.parquet(hot: _*)
      else spark.read.parquet(path).limit(0)
    scan.filter(col(colA).between(aLo, aHi) && col(colB).between(bLo, bHi))
  }
}
