package graft

import graft.Tables
import graft.llm.Bpe
import org.apache.spark.sql.functions._

/** [NORTH-STAR] Real BPE tokenizer: the distributed merge-table training
  * and dictionary-join encoding ([[graft.llm.Bpe]]) pinned against an
  * independent naive in-memory implementation of the textbook algorithm
  * (overlapping pair counts, (count desc, pair asc) argmax, greedy
  * left-to-right non-overlapping replace) over the same sf0.001 corpus.
  * Since round 8 `llm_bpe_train` / `llm_bpe_encode` are ALSO
  * DuckDB-oracled via the exported-merges recursive replay; the
  * wrapped-string-replace property below pins the algebra that replay
  * relies on.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- naive reference implementation (driver-side, corpus-small) ----
  private val preTok = Bpe.preTokRe.r

  private def naiveWords(text: String): Seq[String] =
    preTok.findAllIn(text).toSeq

  private def pairCounts(vocab: Map[Seq[String], Long])
      : Map[(String, String), Long] = {
    val m = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
      m((syms(i), syms(i + 1))) = m.getOrElse((syms(i), syms(i + 1)), 0L) + c
    m.toMap
  }

  private def naiveApply(syms: Seq[String], a: String, b: String)
      : Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  private def naiveTrain(texts: Seq[String], k: Int, minCount: Long = 2L)
      : Seq[(Int, String, String, Long)] = {
    var vocab: Map[Seq[String], Long] = texts.flatMap(naiveWords)
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString): Seq[String], ws.size.toLong) }
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < k && !done) {
      val pc = pairCounts(vocab)
      if (pc.isEmpty || pc.values.max < minCount) done = true
      else {
        val ((a, b), c) = pc.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((rank, a, b, c))
        vocab = vocab.groupMapReduce {
          case (syms, _) => naiveApply(syms, a, b) }(_._2)(_ + _)
        rank += 1
      }
    }
    merges.toSeq
  }

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val texts =
    docs.select("text").as[String].collect().toSeq

  test("BPE train: distributed merge table equals the naive algorithm") {
    val (got, _) = Bpe.train(docs, "text", k = 24)
    val want = naiveTrain(texts, k = 24)
    assert(got.map(m => (m.rank, m.left, m.right, m.pairCount)) === want)
    assert(got.nonEmpty && got.forall(m => m.merged == m.left + m.right))
  }

  test("BPE encode: per-doc piece totals equal the naive encoder") {
    val (merges, _) = Bpe.train(docs, "text", k = 24)
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().toMap2
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
    for ((id, text) <- rows) {
      val ws = naiveWords(text)
      val nPieces = ws.map { w =>
        var syms: Seq[String] = w.map(_.toString)
        merges.foreach(m => syms = naiveApply(syms, m.left, m.right))
        syms.length.toLong
      }.sum
      assert(got(id) === ((ws.length.toLong, nPieces)),
        s"doc $id: got ${got(id)}, want (${ws.length}, $nPieces)")
    }
  }

  test("BPE merge replay: single-symbol and empty-word edges hold") {
    // one-char words produce no pairs; a word equal to a merged pair
    // collapses to one symbol; overlapping runs merge left-to-right.
    val df = Seq((1L, "a bb ababab x"), (2L, "aaa")).toDF("doc_id", "text")
    val (merges, _) = Bpe.train(df, "text", k = 4, minCount = 1L)
    val want = naiveTrain(Seq("a bb ababab x", "aaa"), k = 4, minCount = 1L)
    assert(merges.map(m => (m.rank, m.left, m.right, m.pairCount)) === want)
  }

  /** Property: the higher-order-fold merge ([[Bpe.applyMerge]]) equals
    * the imperative greedy replace on random symbol arrays — including
    * multi-char symbols (mid-training states), overlapping runs, and
    * pairs absent from the array. */
  test("applyMerge fold equals the greedy replace (property)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CheckTest}
    val sym = Gen.oneOf("a", "b", "c", "ab", "bc")
    val arrGen = Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, sym))
    val pairGen = Gen.zip(sym, sym)
    val prop = forAll(arrGen, pairGen) { case (syms, (a, b)) =>
      val df = Seq(Tuple1(syms)).toDF("syms")
      val got = df.select(Bpe.applyMerge(col("syms"), a, b).as("r"))
        .as[Seq[String]].head()
      got == naiveApply(syms, a, b)
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  /** Property (the BPE oracles' algebra): one greedy merge round
    * equals one string `replace` over the chr(1)-WRAPPED symbol string
    * (every symbol as ␁sym␁ — no separator sharing, so a consumed
    * occurrence cannot donate its boundary to an overlapping match).
    * This is exactly what the DuckDB `llm_bpe_train` /
    * `llm_bpe_encode` oracles replay per recursion round; Java's
    * `String.replace` and DuckDB's `replace` share the left-to-right
    * non-overlapping contract. */
  test("applyMerge equals the wrapped-string replace model (property)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CheckTest}
    val S = "\u0001"
    def wrap(syms: Seq[String]): String = syms.map(S + _ + S).mkString
    def unwrap(s: String): Seq[String] =
      if (s.isEmpty) Nil
      else s.split(S + S).toSeq.map(_.stripPrefix(S).stripSuffix(S))
    val sym = Gen.oneOf("a", "b", "c", "ab", "bc", "aa")
    val arrGen = Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, sym))
    val prop = forAll(arrGen, Gen.zip(sym, sym)) { case (syms, (a, b)) =>
      val replaced = wrap(syms).replace(S + a + S + S + b + S, S + a + b + S)
      unwrap(replaced) == naiveApply(syms, a, b)
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.status.toString)
  }

  private implicit class ToMap2(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] =
      rows.map { case (a, b, c) => a -> ((b, c)) }.toMap
  }
}
