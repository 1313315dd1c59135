package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => CheckTest}
import graft.ops.AsofJoin

/** As-of join semantics (pinned to DuckDB ASOF LEFT JOIN by the
  * `join_asof` oracle; these specs pin the corners the corpus may not
  * exercise): inclusive bound, deterministic tie-break, left-outer
  * nulls, and the one-shuffle plan shape. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (100L, 1L, 50L), // after two right rows at t=10,40
    (101L, 1L, 10L), // equal-time: inclusive bound matches t=10
    (102L, 1L, 5L),  // before every right row → null
    (103L, 2L, 99L)  // key with no right rows at all → null
  ).toDF("event_id", "user_id", "t")

  private val right = Seq(
    (200L, 1L, 10L),
    (201L, 1L, 40L)
  ).toDF("event_id", "user_id", "t")

  private def run(l: org.apache.spark.sql.DataFrame,
                  r: org.apache.spark.sql.DataFrame) =
    AsofJoin.asofJoin(l, r, "user_id", "t", "event_id")
      .select("event_id", "r_event_id")
      .as[(Long, Option[Long])].collect().toMap

  test("latest-at-or-before semantics, inclusive bound, outer nulls") {
    assert(run(left, right) == Map(
      100L -> Some(201L), 101L -> Some(200L),
      102L -> None, 103L -> None))
  }

  test("ties among right rows at the same (key, time) take the max tie id") {
    val r2 = right.unionByName(Seq((205L, 1L, 10L)).toDF("event_id", "user_id", "t"))
    assert(run(left, r2)(101L) == Some(205L))
  }

  test("NULL times: right row never matches, left row matches nothing") {
    val l2 = Seq((110L, 1L, Option(60L)), (111L, 1L, Option.empty[Long]))
      .toDF("event_id", "user_id", "t")
    val r2 = Seq((210L, 1L, Option(55L)), (211L, 1L, Option.empty[Long]))
      .toDF("event_id", "user_id", "t")
    assert(run(l2, r2) == Map(110L -> Some(210L), 111L -> None))
  }

  test("property: equals the naive per-row reference on random inputs") {
    // small key/time domains force collisions: equal times across sides,
    // right-side ties at one (key, time), empty keys — every corner the
    // window ordering has to get right
    val genSide = Gen.listOfN(12, for {
      k <- Gen.chooseNum(0L, 2L); t <- Gen.chooseNum(0L, 9L)
    } yield (k, t))
    val prop = forAll(genSide, genSide) { (ls, rs) =>
      val lRows = ls.zipWithIndex.map { case ((k, t), i) => (100L + i, k, t) }
      val rRows = rs.zipWithIndex.map { case ((k, t), i) => (500L + i, k, t) }
      val got = run(lRows.toDF("event_id", "user_id", "t"),
        rRows.toDF("event_id", "user_id", "t"))
      val want = lRows.map { case (id, k, t) =>
        val cands = rRows.filter(r => r._2 == k && r._3 <= t)
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(r => (r._3, r._1))._1))
      }.toMap
      got == want
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: FORWARD (negated-time) join equals naive first-at-or-after") {
    // the join_asof_forward recipe: negate the time column, run the
    // backward operator — the property pins the negation algebra on the
    // same collision-heavy domains, including the tie rule it induces
    // (max tie id among the EARLIEST at-or-after rows)
    val genSide = Gen.listOfN(12, for {
      k <- Gen.chooseNum(0L, 2L); t <- Gen.chooseNum(0L, 9L)
    } yield (k, t))
    val prop = forAll(genSide, genSide) { (ls, rs) =>
      val lRows = ls.zipWithIndex.map { case ((k, t), i) => (100L + i, k, t) }
      val rRows = rs.zipWithIndex.map { case ((k, t), i) => (500L + i, k, t) }
      def negate(rows: Seq[(Long, Long, Long)]) =
        rows.map { case (id, k, t) => (id, k, -t) }
      val got = run(negate(lRows).toDF("event_id", "user_id", "t"),
        negate(rRows).toDF("event_id", "user_id", "t"))
      val want = lRows.map { case (id, k, t) =>
        val cands = rRows.filter(r => r._2 == k && r._3 >= t)
        id -> (if (cands.isEmpty) None
               else Some(cands.minBy(r => (r._3, -r._1))._1))
      }.toMap
      got == want
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("plan: one exchange on the key, no join/cartesian node") {
    val plan = AsofJoin.asofJoin(left, right, "user_id", "t", "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"as-of must not plan a join:\n$plan")
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1,
      s"expected exactly one exchange (the key window):\n$plan")
  }
}
