package graft

import org.apache.spark.sql.functions._
import graft.llm.Curate

/** Curation operators beyond what the DuckDB oracles pin: the nesting
  * property of stratified sampling and mixture-weight invariants. */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("weighted sampling: heavy rows win ∝ weight, exactly k, rerun-stable") {
    val n = 2000
    // ids 1..n, half weight 1000 ("heavy"), half weight 10
    val df = (1 to n).map(i => (i.toLong, if (i % 2 == 0) 1000L else 10L))
      .toDF("doc_id", "w")
    val k = 200
    val got = Curate.sampleWeighted(df, "doc_id", col("w"), k).cache()
    try {
      assert(got.count() == k, "must return exactly k winners")
      val heavy = got.filter(col("w") === 1000L).count()
      // E[heavy] ≈ k·(1000/1010-ish share under the race) — with a 100×
      // weight ratio the heavy half must dominate; the exact value is
      // deterministic, so a regression shows up as a count change
      assert(heavy > 160, s"heavy rows underrepresented: $heavy of $k")
      val again = Curate.sampleWeighted(df, "doc_id", col("w"), k)
      assert(got.select("doc_id").exceptAll(again.select("doc_id")).isEmpty,
        "weighted sample must be a pure function of (id, weight)")
    } finally got.unpersist()
  }

  test("boilerplate scrub removes exactly the chunks shared by >= minDocs docs") {
    // an 8-word banner planted in docs 1-3 and banner-only doc 6 (df=4
    // ≥ 3 → boilerplate); per-doc unique 8-word payloads have df=1
    val banner = "subscribe to our newsletter for free daily updates"
    def uniq(i: Int) = s"unique payload $i alpha beta gamma delta epsilon"
    val df = Seq(
      (1L, s"$banner ${uniq(1)}"), (2L, s"$banner ${uniq(2)}"),
      (3L, s"$banner ${uniq(3)}"), (4L, uniq(4)), (5L, uniq(5)),
      (6L, banner)).toDF("doc_id", "text")
    val got = Curate.scrubBoilerplate(df, "doc_id", "text",
      chunkWords = 8, minDocs = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, uniq(1)), (2L, 2L, 1L, uniq(2)), (3L, 2L, 1L, uniq(3)),
      (4L, 1L, 1L, uniq(4)), (5L, 1L, 1L, uniq(5)),
      (6L, 1L, 0L, "")), // fully-scrubbed doc survives with empty text
      s"unexpected scrub output: ${got.toSeq}")
  }

  test("weighted sampling is invariant to partitioning") {
    val df = (1 to 500).map(i => (i.toLong, (i % 17 + 1).toLong))
      .toDF("doc_id", "w")
    val a = Curate.sampleWeighted(df, "doc_id", col("w"), 50)
      .select("doc_id")
    val b = Curate.sampleWeighted(df.repartition(13), "doc_id", col("w"), 50)
      .select("doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "the winner set must not depend on the physical layout")
  }

  test("stratified strata NEST: raising a rate only adds documents") {
    val low = Curate.sampleStratified(docs, "doc_id", "lang",
      Map("en" -> 1000L), 3000L).select("doc_id").as[Long].collect().toSet
    val high = Curate.sampleStratified(docs, "doc_id", "lang",
      Map("en" -> 4000L), 6000L).select("doc_id").as[Long].collect().toSet
    assert(low.subsetOf(high),
      s"lost docs when raising rates: ${(low -- high).take(5)}")
  }

  test("stratified respects per-group rates (en sampled hardest)") {
    val kept = Curate.sampleStratified(docs, "doc_id", "lang",
      Map("en" -> 0L, "zh" -> 10000L), 5000L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!kept.contains("en"), "rate 0 must drop every en doc")
    assert(kept("zh") == totals("zh"), "rate 10000 must keep every zh doc")
  }

  test("n-gram decontamination drops partial overlap exact-fp misses") {
    val eval_ = Seq((1L, "q one two three four five six seven eight end"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // embeds eval 8-gram "one two ... eight" inside unrelated text
      (10L, "intro words here one two three four five six seven eight and more trailing prose"),
      (11L, "totally unrelated document with none of those words at all okay"),
      (12L, "q one two three four five six seven eight end")) // exact copy
      .toDF("doc_id", "text")
    val kept = Curate.decontaminateNgrams(corpus, eval_, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L), s"partial (10) and exact (12) must drop: $kept")
    // exact-fingerprint decontamination misses the embedded overlap
    val keptFp = Curate.decontaminate(corpus, eval_, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(keptFp == Set(10L, 11L), "sanity: fp method keeps the partial leak")
    // minShared above the actual overlap keeps the partial doc
    val keptStrict = Curate.decontaminateNgrams(corpus, eval_, "doc_id",
      "text", minShared = 5L)
      .select("doc_id").as[Long].collect().toSet
    assert(keptStrict.contains(10L))
    // an eval set naming its text column differently (question/prompt)
    val evalQ = eval_.withColumnRenamed("text", "question")
    val keptQ = Curate.decontaminateNgrams(corpus, evalQ, "doc_id",
      "text", evalTextCol = Some("question"))
      .select("doc_id").as[Long].collect().toSet
    assert(keptQ == Set(11L), s"renamed eval column must behave identically: $keptQ")
  }

  test("mixture weights: flat across equal groups, sum ≈ 1e6, tail up") {
    val flat = Seq.tabulate(40)(i => (i.toLong, s"g${i % 4}"))
      .toDF("id", "lang")
    val w = Curate.mixtureWeights(flat, "lang")
      .select("weight_e6").as[Long].collect()
    assert(w.toSet == Set(250000L), s"equal groups must weigh equally: ${w.toSeq}")

    val real = Curate.mixtureWeights(docs, "lang")
      .select("lang", "n_docs", "weight_e6").as[(String, Long, Long)].collect()
    val sum = real.map(_._3).sum
    assert(math.abs(sum - 1000000L) <= real.length, s"weights sum to $sum")
    // α = 0.5 upweights tails: weight ratio must be flatter than count ratio
    val en = real.find(_._1 == "en").get
    val de = real.find(_._1 == "de").get
    assert(en._3.toDouble / de._3 < en._2.toDouble / de._2,
      "temperature must compress the head/tail ratio")
  }

  test("training shards reproduce the global shuffle order exactly") {
    val path = tmpDir("curate-shards")
    Curate.writeShards(docs, "doc_id", numShards = 4, path)
    val back = spark.read.parquet(path)
    assert(back.count() == docs.count(), "shards must hold every doc once")
    // reading shards in key order reproduces the exact shuffle order
    val fromShards = back.orderBy($"shuffle_key", $"doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val direct = Curate.globalShuffle(docs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(fromShards == direct, "shard order must equal globalShuffle")
    // shards own DISJOINT contiguous key ranges (range partitioning,
    // not hash): max(key) of shard i < min(key) of shard i+1
    import org.apache.spark.sql.functions.{input_file_name, min => fmin, max => fmax}
    val ranges = back
      .select(input_file_name().as("f"), $"shuffle_key")
      .groupBy($"f").agg(fmin($"shuffle_key").as("lo"), fmax($"shuffle_key").as("hi"))
      .orderBy($"lo")
      .select("lo", "hi").as[(Long, Long)].collect().toSeq
    assert(ranges.size > 1, "expected multiple shard files")
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"shard ranges overlap: $ranges")
      case _ =>
    }
  }

  test("span scrub cuts duplicated spans at any alignment, merges overlaps") {
    // span1 appears at DIFFERENT offsets in docs 1/2 (alignment the
    // chunk-based scrub cannot see); docs 5/6 share a 5-token run whose
    // two overlapping 4-gram windows must merge into one maximal span;
    // doc 3 is a sub-window-length copy (< 4 tokens → untouched); doc 4
    // is unique
    val df = Seq(
      (1L, "aaa bbb the quick brown fox ccc"),
      (2L, "the quick brown fox zzz qqq"),
      (3L, "the quick brown"),
      (4L, "xxx yyy www vvv uuu"),
      (5L, "pad one two three four five tail"),
      (6L, "one two three four five")).toDF("doc_id", "text")
    val got = Curate.scrubDupSpans(df, "doc_id", "text",
        spanWords = 4, minDocs = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 7L, 3L, "aaa bbb ccc"),
      (2L, 6L, 2L, "zzz qqq"),
      (3L, 3L, 3L, "the quick brown"),
      (4L, 5L, 5L, "xxx yyy www vvv uuu"),
      (5L, 7L, 2L, "pad tail"),
      (6L, 5L, 0L, "")),
      s"unexpected span scrub output: ${got.toSeq}")
  }

  test("prototype pruning drops the most-prototypical quarter per cluster") {
    // two planted clusters on orthogonal axes, 4 members each with
    // strictly decreasing cosine to their centroid: rank 1 (the most
    // prototypical) must be the pruned quarter, ranks 2-4 kept
    val members = Seq(
      (10L, Array(1f, 0f)), (11L, Array(1f, 0.1f)),
      (12L, Array(1f, 0.5f)), (13L, Array(1f, 0.9f)),
      (20L, Array(0f, 1f)), (21L, Array(0.1f, 1f)),
      (22L, Array(0.5f, 1f)), (23L, Array(0.9f, 1f)))
      .toDF("id", "v")
    val centroids = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("centroid_id", "cvec")
    val got = Curate.prunePrototypes(members, "id", "v", centroids)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (10L, 0L, 1L, 4L, 0L), (11L, 0L, 2L, 4L, 1L),
      (12L, 0L, 3L, 4L, 1L), (13L, 0L, 4L, 4L, 1L),
      (20L, 1L, 1L, 4L, 0L), (21L, 1L, 2L, 4L, 1L),
      (22L, 1L, 3L, 4L, 1L), (23L, 1L, 4L, 4L, 1L)),
      s"unexpected pruning output: ${got.toSeq}")
  }

  test("target-affinity selection ranks target-like pool docs first") {
    // target speaks alpha/beta/gamma; pool docs graded by how much of
    // that vocabulary they carry — selection must follow the gradient
    val df = Seq(
      (1L, "alpha beta gamma", true), (2L, "alpha beta gamma", true),
      (3L, "alpha beta gamma alpha", true),
      (10L, "alpha beta gamma", false),
      (11L, "alpha beta noise", false),
      (12L, "alpha noise noise", false),
      (13L, "noise noise noise", false),
      (14L, "noise filler junk", false),
      (15L, "filler junk words", false),
      (16L, "junk words blob", false),
      (17L, "words blob mass", false))
      .toDF("doc_id", "text", "is_t")
    val got = Curate.selectByTargetAffinity(df, "doc_id", "text",
        col("is_t"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(5)))
    val byRank = got.sortBy(_._3)
    // 8 pool docs → floor(8/4) = 2 selected; the full-vocab doc wins
    assert(got.count(_._4 == 1L) == 2, s"selected count: ${got.toSeq}")
    assert(byRank.head._1 == 10L, s"rank 1 must be the full-vocab doc: ${byRank.toSeq}")
    // weights must be non-increasing in rank and the all-noise docs
    // must score below every doc carrying target vocabulary
    assert(byRank.map(_._2).toSeq == byRank.map(_._2).sortBy(-_).toSeq)
    val noiseWeights = got.filter(t => t._1 >= 13L).map(_._2)
    val vocabWeights = got.filter(t => t._1 <= 12L).map(_._2)
    assert(noiseWeights.max < vocabWeights.min,
      s"noise docs must rank below vocab docs: ${got.toSeq}")
    // pure function of the input: repartitioned rerun is identical
    val again = Curate.selectByTargetAffinity(df.repartition(7), "doc_id",
        "text", col("is_t"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(5)))
    assert(got.toSeq == again.toSeq, "selection must be partition-invariant")
  }
}
