package graft

import org.apache.spark.sql.functions._
import graft.ops.ZOrder

/** [[graft.ops.ZOrder]]: the Morton interleave is bit-exact against a
  * reference implementation, and the z-layout actually earns its keep —
  * per-file min/max envelopes prune a 2-D box that a single-column
  * sort cannot. */
class ZOrderSpec extends SparkSpec {

  private def refZ(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("z2 matches the reference bit interleave") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(512)(
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.z2(col("a"), col("b"))).as[Long].collect()
    assert(got.sameElements(pairs.map { case (a, b) => refZ(a, b) }))
  }

  test("z-layout files prune a 2-D box that a single-column sort cannot") {
    val ev = Tables.events(spark, sf).select(
      col("event_id").cast("long").as("event_id"),
      col("user_id").cast("long").as("user_id"),
      round(col("value") * 100).cast("long").as("cents"))
    val b = ev.agg(min("user_id"), max("user_id"),
      min("cents"), max("cents")).head()
    val (uMin, uMax, cMin, cMax) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val (uLo, uHi) = (uMin + (uMax - uMin) / 3, uMin + 2 * (uMax - uMin) / 3)
    val cHi = cMin + (cMax - cMin) / 2

    val zdir = tmpDir("graft-zorder-z")
    val ldir = tmpDir("graft-zorder-linear")
    ZOrder.layout(ev, zdir, "user_id", uMin, uMax, "cents", cMin, cMax, 8)
    // the contrast layout: clustered on an UNRELATED single key — every
    // file's stats envelope spans the full (user_id, cents) plane
    ev.repartitionByRange(8, col("event_id"))
      .sortWithinPartitions("event_id")
      .write.mode("overwrite").parquet(ldir)

    // per-file stats envelopes — what a stats-index scan would consult
    val zStats = spark.read.parquet(zdir)
      .groupBy(input_file_name()).agg(min("user_id").as("ulo"),
        max("user_id").as("uhi"), min("cents").as("clo"),
        max("cents").as("chi")).collect()
    val lStats = spark.read.parquet(ldir)
      .groupBy(input_file_name()).agg(min("user_id").as("ulo"),
        max("user_id").as("uhi"), min("cents").as("clo"),
        max("cents").as("chi")).collect()
    def intersects(r: org.apache.spark.sql.Row): Boolean =
      r.getLong(1) <= uHi && r.getLong(2) >= uLo &&
        r.getLong(3) <= cHi && r.getLong(4) >= cMin
    val (zHit, zAll) = (zStats.count(intersects), zStats.length)
    val (lHit, lAll) = (lStats.count(intersects), lStats.length)
    assert(zAll == 8 && lAll == 8, s"expected 8 files, got z=$zAll l=$lAll")
    assert(lHit == lAll,
      s"single-column sort should leave every file hot, hit $lHit/$lAll")
    assert(zHit < lHit && zHit <= 6,
      s"z-layout should skip files on the 2-D box: hit $zHit/$zAll")

    // the layout is lossless and the clustered read serves the same rows
    assert(spark.read.parquet(zdir).count() == ev.count())

    // prunedScan plans ONLY the intersecting files off the _ZSTATS
    // index, and re-filtering keeps it byte-identical to the full scan
    val pruned = ZOrder.prunedScan(spark, zdir,
      "user_id", uLo, uHi, "cents", cMin, cHi)
    val scannedFiles = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    val hotFiles = zStats.filter(intersects).map(_.getString(0)).toSet
    assert(scannedFiles.subsetOf(hotFiles),
      s"pruned scan read a cold file: ${scannedFiles -- hotFiles}")
    val full = spark.read.parquet(zdir)
      .filter(col("user_id").between(uLo, uHi) &&
        col("cents").between(cMin, cHi))
    assert(pruned.orderBy("event_id").collect()
      .sameElements(full.orderBy("event_id").collect()),
      "file skipping must be output-invisible")
  }

  test("append ingests a batch without rewriting existing files") {
    val ev = Tables.events(spark, sf).select(
      col("event_id").cast("long").as("event_id"),
      col("user_id").cast("long").as("user_id"),
      round(col("value") * 100).cast("long").as("cents"))
    val b = ev.agg(min("user_id"), max("user_id"),
      min("cents"), max("cents")).head()
    val (uMin, uMax, cMin, cMax) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val dir = tmpDir("graft-zorder-append")
    val base = ev.filter(col("event_id") % 2 === 0)
    val batch = ev.filter(col("event_id") % 2 =!= 0)
    ZOrder.layout(base, dir, "user_id", uMin, uMax, "cents", cMin, cMax, 4)
    val baseFiles = spark.read.parquet(dir)
      .select(input_file_name()).distinct().collect()
      .map(_.getString(0)).toSet
    ZOrder.append(batch, dir, "user_id", uMin, uMax, "cents", cMin, cMax, 2)
    val allFiles = spark.read.parquet(dir)
      .select(input_file_name()).distinct().collect()
      .map(_.getString(0)).toSet
    assert(baseFiles.subsetOf(allFiles) && allFiles.size > baseFiles.size,
      "append must add files, never rewrite the existing generation")
    // the refreshed index covers old AND new files, and the pruned
    // read over the union equals the plain filter over all rows
    val (uLo, uHi) = (uMin + (uMax - uMin) / 3, uMin + 2 * (uMax - uMin) / 3)
    val cHi = cMin + (cMax - cMin) / 2
    val pruned = ZOrder.prunedScan(spark, dir,
      "user_id", uLo, uHi, "cents", cMin, cHi)
    val want = ev.filter(col("user_id").between(uLo, uHi) &&
      col("cents").between(cMin, cHi))
    assert(pruned.count() == want.count() && pruned.count() > 0,
      "post-append pruned scan must serve the full union")
  }

  test("layout_zorder_scan declared query returns the box aggregate") {
    val rows = SparkEntry.queries("layout_zorder_scan")(spark, sf).collect()
    assert(rows.nonEmpty && rows.map(_.getLong(1)).sum > 0)
  }
}
