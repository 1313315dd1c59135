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
}
