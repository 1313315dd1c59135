package graft

import graft.llm.TextOps
import graft.ops.SketchTable
import org.apache.spark.sql.functions._

/** HLL sketch table: rollups answered from sketches alone stay within
  * HLL error of exact, row counts stay exact, and a rollup through the
  * fine-grained table matches sketching the raw data directly. */
class SketchTableSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fps = Tables.documents(spark, sf)
    .select(col("source"), col("lang"),
      TextOps.fingerprint(col("text")).as("fp"))

  test("per-source rollup within 5% of exact, row counts exact") {
    val table = SketchTable.build(fps, Seq("source", "lang"), "fp")
    val rolled = SketchTable.rollup(table, Seq("source"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val exact = fps.groupBy($"source")
      .agg(countDistinct($"fp").as("d"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(rolled.keySet == exact.keySet)
    exact.foreach { case (src, (d, n)) =>
      val (ad, an) = rolled(src)
      assert(an == n, s"$src: row count must be exact ($an vs $n)")
      assert(math.abs(ad - d).toDouble / d <= 0.05,
        s"$src: approx $ad vs exact $d")
    }
  }

  test("sketches survive a parquet round-trip — the stored-table pattern") {
    // the serving shape: the sketch table is PERSISTED once and every
    // later question aggregates the stored binaries, raw data long gone
    val path = tmpDir("sketch-table") + "/t"
    SketchTable.build(fps, Seq("source", "lang"), "fp")
      .write.parquet(path)
    val restored = SketchTable.rollup(spark.read.parquet(path),
        Seq("source"))
      .select($"source", $"approx_distinct")
      .as[(String, Long)].collect().toMap
    val live = SketchTable.rollup(
        SketchTable.build(fps, Seq("source", "lang"), "fp"), Seq("source"))
      .select($"source", $"approx_distinct")
      .as[(String, Long)].collect().toMap
    assert(restored == live)
  }

  test("streaming build: per-batch sketch rows, rollup spans all history") {
    // continuous profiling of an ingest stream: each micro-batch appends
    // its own sketch rows; the rollup unions across batches — distinct
    // counts over the whole ingest history without retaining raw rows
    val srcDir = tmpDir("sketch-stream-src")
    val tablePath = tmpDir("sketch-stream") + "/t"
    import spark.implicits._
    val gen1 = fps.filter($"fp".substr(1, 1) < "8")
    val gen2 = fps.filter($"fp".substr(1, 1) >= "8")
    gen1.write.mode("overwrite").parquet(srcDir)
    def drain(ckpt: String): Unit = {
      val q = spark.readStream.schema(fps.schema).parquet(srcDir)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          SketchTable.build(b, Seq("source", "lang"), "fp")
            .write.mode("append").parquet(tablePath)
          ()
        }
        .start()
      q.awaitTermination(120000)
    }
    val ckpt = tmpDir("sketch-stream-ckpt")
    drain(ckpt)
    gen2.write.mode("append").parquet(srcDir)
    drain(ckpt)
    val rolled = SketchTable.rollup(spark.read.parquet(tablePath),
        Seq("source"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val exact = fps.groupBy($"source")
      .agg(countDistinct($"fp").as("d"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(rolled.keySet == exact.keySet)
    exact.foreach { case (src, (d, n)) =>
      val (ad, an) = rolled(src)
      assert(an == n, s"$src: row count must be exact across batches")
      assert(math.abs(ad - d).toDouble / d <= 0.05,
        s"$src: approx $ad vs exact $d")
    }
  }

  test("rollup through the sketch table == sketching raw data directly") {
    // the mergeability contract: union of per-(source, lang) sketches
    // is THE SAME sketch state as one pass per source — identical
    // estimate, not merely close
    val viaTable = SketchTable.rollup(
        SketchTable.build(fps, Seq("source", "lang"), "fp"), Seq("source"))
      .select($"source", $"approx_distinct")
      .as[(String, Long)].collect().toMap
    val direct = fps.groupBy($"source")
      .agg(hll_sketch_estimate(hll_sketch_agg($"fp"))
        .as("approx_distinct"))
      .as[(String, Long)].collect().toMap
    assert(viaTable == direct)
  }

  test("theta overlap matrix is exact below capacity") {
    val matrix = SketchTable.thetaOverlapMatrix(
        SketchTable.buildTheta(fps, "source", "fp"), "source")
      .select($"group_a", $"group_b", $"n_overlap")
      .as[(String, String, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    // exact ground truth by brute distinct-intersect per pair
    val bySrc = fps.select($"source", $"fp").distinct()
      .as[(String, String)].collect()
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).toSet }
    for (((a, b), got) <- matrix) {
      val want = (bySrc(a) & bySrc(b)).size.toLong
      assert(got == want, s"($a,$b): theta said $got, exact is $want")
    }
    assert(matrix.keySet ==
      (for (a <- bySrc.keys; b <- bySrc.keys if a < b) yield (a, b)).toSet)
  }

  test("theta overlap stays within 5% beyond the sketch capacity") {
    // two 60k-id sets sharing exactly 20k — far past the 4096-entry
    // nominal capacity, so the estimate is genuinely approximate
    val a = spark.range(0, 60000).select(lit("A").as("g"),
      concat(lit("v"), $"id").as("v"))
    val b = spark.range(40000, 100000).select(lit("B").as("g"),
      concat(lit("v"), $"id").as("v"))
    val m = SketchTable.thetaOverlapMatrix(
        SketchTable.buildTheta(a.unionByName(b), "g", "v"), "g")
      .select($"n_overlap").as[Long].head()
    assert(math.abs(m - 20000L) <= 1000L,
      s"theta overlap estimate $m vs true 20000")
  }
}
