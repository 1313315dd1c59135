package graft

import graft.functions.{QItem, QSketchBuf, QuantileSketch, QuantileSketchAgg}
import org.apache.spark.sql.functions._

/** The mergeable quantile sketch: exact below the compaction
  * threshold, self-certifying beyond it. */
class QuantileSketchSpec extends SparkSpec {

  private def summarize(agg: QuantileSketchAgg,
                        values: Seq[Long], chunks: Int) = {
    val parts = values.grouped(
      math.max(1, values.size / chunks)).toSeq
    val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    agg.finish(bufs.reduce(agg.merge))
  }

  private def trueRank(sorted: IndexedSeq[Long], v: Long): Long =
    sorted.count(_ <= v).toLong

  test("exact regime: no compaction, err = 0, ranks exact") {
    val agg = new QuantileSketchAgg(256)
    val values = (1L to 400L).map(i => (i * 7919) % 1000)
    val s = summarize(agg, values, 7)
    assert(s.err == 0L, s"exact regime reported err=${s.err}")
    assert(s.n == 400L)
    val sorted = values.sorted.toIndexedSeq
    for (q <- Seq(0.01, 0.25, 0.5, 0.9, 0.99)) {
      val target = math.ceil(q * s.n).toLong
      assert(QuantileSketch.rankValue(s.items, target) ==
        sorted((target - 1).toInt),
        s"exact-regime quantile $q diverged")
    }
  }

  test("forced compaction: carried bound certifies every rank query") {
    val agg = new QuantileSketchAgg(64)
    val rnd = new scala.util.Random(42)
    val values = Seq.fill(10000)(rnd.nextLong(1000000L))
    val s = summarize(agg, values, 13)
    assert(s.err > 0L, "compaction never triggered — bound untested")
    assert(s.err <= s.n / 10,
      s"bound too loose to be useful: err=${s.err} of n=${s.n}")
    val sorted = values.sorted.toIndexedSeq
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val target = math.ceil(q * s.n).toLong
      val est = QuantileSketch.rankValue(s.items, target)
      val r = trueRank(sorted, est)
      assert(math.abs(r - target) <= s.err,
        s"q=$q: |true_rank($est)=$r - $target| > certified ${s.err}")
    }
    // total weight is conserved by compaction
    assert(s.items.map(_.w).sum == s.n, "compaction lost weight")
  }

  test("odd-sized level compaction conserves weight (the merge() shape)") {
    val agg = new QuantileSketchAgg(8)
    // reduce alone compacts level 0 only at exactly 2k (even); merge()
    // concatenates arbitrary partial sizes — force 9 + 8 = 17 ≥ 16,
    // an ODD level, whose compaction must leave one item behind
    // rather than drop its weight
    val b1 = (1L to 9L).foldLeft(agg.zero)(agg.reduce)
    val b2 = (100L to 107L).foldLeft(agg.zero)(agg.reduce)
    val s = agg.finish(agg.merge(b1, b2))
    assert(s.n == 17L)
    assert(s.items.map(_.w).sum == 17L,
      s"odd compaction lost weight: ${s.items.map(_.w).sum} of 17")
    assert(s.err > 0L, "the 17-item level must have compacted")
    // and the certified bound still holds for the median
    val all = ((1L to 9L) ++ (100L to 107L)).sorted.toIndexedSeq
    val target = math.ceil(0.5 * 17).toLong
    val est = QuantileSketch.rankValue(s.items, target)
    assert(math.abs(all.count(_ <= est) - target) <= s.err)
  }

  test("merge order changes the summary, never breaks the bound") {
    val agg = new QuantileSketchAgg(64)
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(4000)(rnd.nextLong(100000L))
    val sorted = values.sorted.toIndexedSeq
    for (chunks <- Seq(2, 5, 17)) {
      val s = summarize(agg, values, chunks)
      val target = math.ceil(0.5 * s.n).toLong
      val r = trueRank(sorted, QuantileSketch.rankValue(s.items, target))
      assert(math.abs(r - target) <= s.err,
        s"$chunks-way merge broke the certified bound")
    }
  }

  test("streaming build: per-batch summary rows roll up to the direct answer") {
    import spark.implicits._
    // the sketch table's streaming shape (the HLL table's round-5
    // idiom): each micro-batch appends its own per-group summary rows;
    // any later rollup merges summary ARRAYS across batches — raw rows
    // are never revisited. Exact regime → equality, not approximation.
    val docs = Tables.documents(spark, sf)
      .select($"source", $"lang", $"n_chars")
    val srcDir = tmpDir("qstream-src")
    docs.filter(pmod(xxhash64($"source"), lit(2)) === 0)
      .write.mode("overwrite").parquet(s"$srcDir/b0")
    docs.filter(pmod(xxhash64($"source"), lit(2)) === 1)
      .write.mode("overwrite").parquet(s"$srcDir/b1")
    val outDir = tmpDir("qstream-out")
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/*")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("qstream-ck"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.groupBy("source", "lang")
          .agg(QuantileSketch.agg(256)(col("n_chars")).as("qs"))
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(outDir)
      .groupBy("source")
      .agg(sum($"qs.n").as("n_docs"),
        array_sort(flatten(collect_list($"qs.items"))).as("items"))
      .select($"source", $"n_docs",
        QuantileSketch.quantileCol($"items", $"n_docs", 0.9).as("p90"))
    val direct = docs.groupBy("source")
      .agg(QuantileSketch.agg(256)($"n_chars").as("qs"))
      .select($"source", $"qs.n".as("n_docs"),
        QuantileSketch.quantileCol(
          array_sort($"qs.items"), $"qs.n", 0.9).as("p90"))
    assert(streamed.exceptAll(direct).isEmpty &&
      direct.exceptAll(streamed).isEmpty,
      "streaming-built quantile table rollup diverged from direct")
  }

  test("rollup equals direct in the exact regime (DataFrame path)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val direct = docs.groupBy("source")
      .agg(QuantileSketch.agg(256)($"n_chars").as("qs"))
      .select($"source", $"qs.n".as("n_docs"),
        QuantileSketch.quantileCol(
          array_sort($"qs.items"), $"qs.n", 0.5).as("p50"))
    val rolled = docs.groupBy("source", "lang")
      .agg(QuantileSketch.agg(256)($"n_chars").as("qs"))
      .groupBy("source")
      .agg(sum($"qs.n").as("n_docs"),
        array_sort(flatten(collect_list($"qs.items"))).as("items"))
      .select($"source", $"n_docs",
        QuantileSketch.quantileCol($"items", $"n_docs", 0.5).as("p50"))
    assert(direct.exceptAll(rolled).isEmpty &&
      rolled.exceptAll(direct).isEmpty,
      "rollup diverged from the direct sketch in the exact regime")
  }
}
