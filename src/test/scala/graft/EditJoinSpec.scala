package graft

import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import graft.llm.EditJoin

/** The PassJoin segment pigeonhole ([[graft.llm.EditJoin]]): candidate
  * completeness as a property, whole-query equality against the naive
  * all-pairs join, and the no-cross-product plan shape. */
class EditJoinSpec extends SparkSpec {

  private val L = 30
  private val K = 3

  // ---- reference pieces (independent of the Spark implementation) ----

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** The candidate predicate the join computes: some fixed segment of
    * `a` equals some ±K-shifted window of `b` at the same index. */
  private def isCandidate(a: String, b: String): Boolean = {
    val segs = EditJoin.scheme(L, K).map { case (i, st, l) =>
      (i, a.substring(st - 1, st - 1 + l))
    }.toSet
    (segs intersect EditJoin.probes(b, L, K)).nonEmpty
  }

  test("scheme partitions the string exactly") {
    val sch = EditJoin.scheme(L, K)
    assert(sch.map(_._3).sum == L)
    assert(sch.head._2 == 1)
    assert(sch.sliding(2).forall { case Seq((_, s1, l1), (_, s2, _)) =>
      s2 == s1 + l1 })
  }

  /** Pigeonhole completeness: ANY pair of 30-char strings within edit
    * distance 3 must be a candidate. Pairs are generated as base +
    * random length-preserving edit scripts (substitutions and
    * compensating insert/delete pairs, which move characters the way
    * pure substitutions cannot), so shifts genuinely occur. */
  test("every pair within distance K is a candidate (property)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CheckTest}
    val alpha = Gen.oneOf('a', 'b', 'c')
    val baseGen = Gen.listOfN(L, alpha).map(_.mkString)
    val editGen = for {
      nSub <- Gen.choose(0, 1)
      nPair <- Gen.choose(0, 1) // one ins+del pair = 2 ops, shifts a run
      subs <- Gen.listOfN(nSub, Gen.zip(Gen.choose(0, L - 1), alpha))
      pairs <- Gen.listOfN(nPair,
        Gen.zip(Gen.choose(0, L - 1), Gen.choose(0, L - 1), alpha))
    } yield (subs, pairs)
    val prop = forAll(baseGen, editGen) { case (base, (subs, pairs)) =>
      var s = base
      subs.foreach { case (p, c) => s = s.updated(p, c) }
      pairs.foreach { case (del, ins, c) =>
        val t = s.substring(0, del) + s.substring(del + 1) // delete
        val at = math.min(ins, t.length)
        s = t.substring(0, at) + c + t.substring(at) // insert
      }
      val d = lev(base, s)
      d <= K && isCandidate(base, s) && isCandidate(s, base)
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("fixedLenSelfJoin equals the naive all-pairs join on sf0.001") {
    val heads = Tables.documents(spark, sf)
      .filter(length(col("text")) >= L)
      .select(col("doc_id"), substring(col("text"), 1, L).as("head"))
    val got = EditJoin.fixedLenSelfJoin(heads, "doc_id", "head", L, K)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = heads.select(col("doc_id").as("id_a"), col("head").as("ha"))
    val b = heads.select(col("doc_id").as("id_b"), col("head").as("hb"))
    val want = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("ha"), col("hb")).cast("long"))
      .filter(col("dist") <= K)
      .select("id_a", "id_b", "dist").orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(want.nonEmpty, "fixture should contain near-dup heads")
    assert(got.sameElements(want))
  }

  test("plan never forms a cross product — candidates come from the " +
      "(segment, bytes) shuffle join") {
    // inspect the INITIAL plan (the PlanLintSpec idiom): the final AQE
    // plan wraps operators inside query-stage leaves; the initial plan
    // shows the join strategy Catalyst actually picked
    val df = SparkEntry.queries("llm_fuzzy_pairs_global")(spark, sf)
    val ns = planNodes(df.queryExecution.executedPlan)
    assert(!ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) &&
      !ns.exists(_.getClass.getSimpleName.startsWith("CartesianProduct")),
      "PassJoin must never fall back to a cross product")
    val joins = ns.filter(_.getClass.getSimpleName.matches(
      ".*(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)Exec"))
    assert(joins.exists(_.toString.contains("piece")),
      "candidate join must key on the segment bytes")
  }

  // --------------------------------------------- variable-length form ----

  /** Candidate predicate of [[EditJoin.selfJoin]]: the pair survives
    * the main path (index side `a`, probe side `b`) or the short path. */
  private def isVarCandidate(a: String, b: String): Boolean = {
    val (la, lb) = (a.length, b.length)
    if (la <= K || lb <= K) math.abs(la - lb) <= K // short length-band path
    else {
      val segs = EditJoin.scheme(la, K).map { case (i, st, l) =>
        (i, a.substring(st - 1, st - 1 + l))
      }.toSet
      math.abs(la - lb) <= K &&
        (segs intersect EditJoin.varProbes(b, la, K)).nonEmpty
    }
  }

  /** Drift-refined completeness: ANY pair of variable-length strings
    * within edit distance K must be a candidate in BOTH orientations
    * (each orientation's pigeonhole stands on its own script). Edits
    * here genuinely change lengths — independent inserts and deletes,
    * not only compensating pairs. */
  test("every variable-length pair within distance K is a candidate " +
      "(property)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CheckTest}
    val alpha = Gen.oneOf('a', 'b', 'c')
    val baseGen = for {
      n <- Gen.choose(1, 14)
      cs <- Gen.listOfN(n, alpha)
    } yield cs.mkString
    type Op = (String, Int, Char) => String
    val subOp: Op = (s, p, c) =>
      if (s.isEmpty) s else s.updated(p % s.length, c)
    val insOp: Op = (s, p, c) => {
      val at = p % (s.length + 1)
      s.substring(0, at) + c + s.substring(at)
    }
    val delOp: Op = (s, p, _) =>
      if (s.isEmpty) s
      else { val at = p % s.length; s.substring(0, at) + s.substring(at + 1) }
    val opGen = Gen.oneOf(subOp, insOp, delOp)
    val editsGen = for {
      nOps <- Gen.choose(0, K)
      ops <- Gen.listOfN(nOps, Gen.zip(opGen, Gen.choose(0, 63), alpha))
    } yield ops
    val prop = forAll(baseGen, editsGen) { case (base, ops) =>
      val edited = ops.foldLeft(base) { case (s, (op, p, c)) => op(s, p, c) }
      val d = lev(base, edited)
      d <= K &&
        (d == 0 || (isVarCandidate(base, edited) &&
          isVarCandidate(edited, base)))
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("selfJoin equals the naive all-pairs join on mixed-length keys, " +
      "short strings included") {
    import spark.implicits._
    // the declared query's geometry (24-36 char heads) PLUS planted
    // sub-(K+1) strings that must route through the length-band path
    val heads = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text").substr(lit(1),
        (lit(24) + pmod(col("doc_id"), lit(13))).cast("int")).as("head"))
      .unionByName(Seq((900001L, "ab"), (900002L, "b"), (900003L, "abc"),
        (900004L, "abcd"), (900005L, "abcde"), (900006L, ""))
        .toDF("doc_id", "head"))
    val got = EditJoin.selfJoin(heads, "doc_id", "head", K)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = heads.select(col("doc_id").as("id_a"), col("head").as("ha"))
    val b = heads.select(col("doc_id").as("id_b"), col("head").as("hb"))
    val want = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("ha"), col("hb")).cast("long"))
      .filter(col("dist") <= K)
      .select("id_a", "id_b", "dist").orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(want.nonEmpty, "fixture should contain near-dup mixed heads")
    // the planted shorts must appear in the result (short path works)
    assert(want.exists(p => p._1 >= 900001L || p._2 >= 900001L),
      "fixture shorts should pair up")
    assert(got.sameElements(want))
  }

  test("the blocked fuzzy query and its over-cap failover are " +
      "output-identical, and the failover keys on segments") {
    import graft.llm.LlmQueries
    val direct = LlmQueries.fuzzyPairs(spark, sf, Long.MaxValue)
      .collect().map(_.toSeq)
    assert(LlmQueries.fuzzyPairs(spark, sf, 0L)
        .collect().map(_.toSeq).sameElements(direct),
      "failover must be output-invisible")
    // plan inspected on a FRESH instance, before any action — the
    // final AQE plan hides joins inside query-stage leaves
    val ns = planNodes(LlmQueries.fuzzyPairs(spark, sf, 0L)
      .queryExecution.executedPlan)
    assert(ns.filter(_.getClass.getSimpleName.matches(
        ".*(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)Exec"))
      .exists(j => j.toString.contains("piece") &&
        j.toString.contains("source")),
      "over-cap candidates must come from the (block, segment, bytes) join")
  }

  test("serving shapes: summary is the exact histogram of the full " +
      "emission, capped is its deterministic per-anchor truncation") {
    // the round-8 deployment shapes for the output-bound global form:
    // same discovery pipeline, bounded emission — both must be pure
    // functions of the full pair set
    import graft.llm.LlmQueries
    import spark.implicits._
    val full = LlmQueries.queries("llm_fuzzy_pairs_global")(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val summary = LlmQueries.queries("llm_fuzzy_pairs_summary")(spark, sf)
      .as[(Long, Long)].collect().toMap
    val expectedHist = full.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    assert(summary == expectedHist,
      s"summary histogram diverged from the full emission: " +
        s"$summary vs $expectedHist")

    val capped = LlmQueries.queries("llm_fuzzy_pairs_capped")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // TRUE per-anchor semantics (round-8 ADVICE): every pair counts
    // toward BOTH endpoints' caps, so symmetrize the full emission
    // before the per-anchor truncation
    val sym = full.flatMap { case (a, b, dist) =>
      Seq((a, b, dist), (b, a, dist)) }
    val expectedCapped = sym.groupBy(_._1).toSeq.flatMap {
      case (anchor, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(5).zipWithIndex.map {
          case ((a, b, dist), i) => (a, b, dist, i + 1L)
        }
    }.sortBy(r => (r._1, r._4))
    assert(capped == expectedCapped,
      "capped output is not the per-anchor (dist, id) truncation of " +
        "the symmetrized full emission")
    assert(capped.groupBy(_._1).values.forall(_.size <= 5),
      "an anchor exceeded the emission cap")
    // every doc that appears in any pair anchors at least once — the
    // round-8 ADVICE defect was the max-id doc never anchoring
    val anchors = capped.map(_._1).toSet
    val inPairs = full.flatMap(r => Seq(r._1, r._2)).toSet
    assert(inPairs.subsetOf(anchors),
      s"docs in pairs but never anchoring: ${(inPairs -- anchors).take(5)}")
  }
}
