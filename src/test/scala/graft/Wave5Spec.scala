package graft

import org.apache.spark.sql.functions._
import graft.llm.Curate
import graft.ops.RelationalOps

/** Properties of the round-4 additions the DuckDB oracles can't
  * express: scrub completeness, shuffle permutation/stability, and the
  * shared-window plan shape. */
class Wave5Spec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("piiScrub redacts every planted email and phone") {
    val planted = docs.select(
      concat(col("text"), lit(" a.user+tag@sub.example.org or 555-0199 x"),
        col("source"), lit("@host.io")).as("dirty"))
    val leaked = planted.select(Curate.piiScrub(col("dirty")).as("clean"))
      .filter(col("clean").rlike("@") || col("clean").rlike("[0-9]{3}-[0-9]{4}"))
    assert(leaked.isEmpty,
      s"PII survived: ${leaked.limit(3).collect().mkString("; ")}")
    // and the tags landed (scrub is a replace, not a delete)
    val tagged = planted.select(Curate.piiScrub(col("dirty")).as("clean"))
    assert(tagged.filter(col("clean").contains("<EMAIL>") &&
      col("clean").contains("<PHONE>")).count() == docs.count())
  }

  test("globalShuffle is a stable permutation that scatters id order") {
    val n = docs.count()
    val shuffled = Curate.globalShuffle(docs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0))
    assert(shuffled.length == n && shuffled.toSet.size == n,
      "shuffle must be a permutation of the corpus")
    // deterministic: a rerun deals the identical order
    val again = Curate.globalShuffle(docs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0))
    assert(shuffled.sameElements(again), "shuffle order must be stable")
    // and it actually shuffles: few fixed points vs the sorted order
    val sorted = shuffled.sorted
    val fixed = shuffled.zip(sorted).count { case (a, b) => a == b }
    assert(fixed < n / 10, s"$fixed of $n docs kept their sorted position")
  }

  test("window_ntile ranks via banded windows, never a whole event_type") {
    // the two-pass ScalableRank shape: every Window node partitions on
    // (event_type, __band) — the band column bounds each task's sort at
    // |group|/bands, so no task ever sorts one event type's whole corpus
    import org.apache.spark.sql.execution.window.WindowExec
    val windows = planNodes(RelationalOps.windowNtile(spark, sf)
      .queryExecution.executedPlan).collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the banded rank windows")
    val wholeGroup = windows.filter(_.partitionSpec.forall(
      _.references.map(_.name).toSet.subsetOf(Set("event_type"))))
    assert(wholeGroup.isEmpty,
      s"window sorts a whole event_type in one task:\n${wholeGroup.mkString}")
  }

  test("Interpolate.linear: interior line, leading backfill, trailing carry") {
    import spark.implicits._
    val grid = Seq(
      ("a", "2024-01-01 00:00:00", null.asInstanceOf[java.lang.Long]), // leading → backfill 100
      ("a", "2024-01-01 01:00:00", java.lang.Long.valueOf(100L)),
      ("a", "2024-01-01 02:00:00", null.asInstanceOf[java.lang.Long]), // 1/3 of the way 100→400
      ("a", "2024-01-01 03:00:00", null.asInstanceOf[java.lang.Long]), // 2/3
      ("a", "2024-01-01 04:00:00", java.lang.Long.valueOf(400L)),
      ("a", "2024-01-01 05:00:00", null.asInstanceOf[java.lang.Long])  // trailing → carry 400
    ).toDF("k", "ts", "v")
      .select($"k", $"ts".cast("timestamp").as("ts"), $"v")
    val got = graft.ops.Interpolate.linear(grid, "k", "ts", "v", "out")
      .orderBy("ts").select("out").as[Long].collect().toSeq
    assert(got == Seq(100L, 100L, 200L, 300L, 400L, 400L), s"got $got")
  }

  test("ScalaCheck: Interpolate.linear matches a straight-line model") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CheckTest}
    import spark.implicits._
    // per-key series: strictly increasing hour indexes, ≥1 present value
    val genSeries = for {
      n <- Gen.choose(1, 12)
      vals <- Gen.listOfN(n, Gen.option(Gen.choose(-500L, 500L)))
      if vals.exists(_.isDefined)
    } yield vals
    def model(vals: List[Option[Long]]): List[Long] = {
      val idx = vals.zipWithIndex
      val present = idx.collect { case (Some(v), i) => (i, v) }
      idx.map {
        case (Some(v), _) => v
        case (None, i) =>
          val prev = present.filter(_._1 < i).lastOption
          val next = present.find(_._1 > i)
          (prev, next) match {
            case (Some((pi, pv)), Some((ni, nv))) =>
              // same rounding as the op: double math, HALF_UP
              BigDecimal(pv + (nv - pv) *
                ((i - pi).toDouble / (ni - pi).toDouble))
                .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            case (Some((_, pv)), None) => pv
            case (None, Some((_, nv))) => nv
            case _ => sys.error("unreachable: ≥1 present value")
          }
      }
    }
    val prop = forAll(genSeries) { vals =>
      val rows = vals.zipWithIndex.map { case (v, i) =>
        ("k", new java.sql.Timestamp(3600000L * i),
          v.map(java.lang.Long.valueOf).orNull)
      }
      val grid = rows.toDF("k", "ts", "v")
      val got = graft.ops.Interpolate.linear(grid, "k", "ts", "v", "out")
        .orderBy("ts").select("out").as[Long].collect().toList
      got == model(vals)
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("partitioned corpus read prunes to the one lang directory") {
    val q = RelationalOps.sourcePartitionedCorpus(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(scanLine.exists(l => l.contains("lang") && l.contains("= en")),
      s"expected the lang filter in PartitionFilters:\n$plan")
    // the filter must be a PARTITION filter, not a post-scan data filter
    assert(scanLine.exists(_.contains("PushedFilters: []")) ||
      !plan.contains("PushedFilters: [IsNotNull(lang)"),
      s"lang should prune partitions, not push into row groups:\n$plan")
  }

  test("grouping sets margins are internally consistent") {
    val rows = RelationalOps.aggGroupingSets(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val grand = rows.collect { case ("ALL", "ALL", c) => c }.sum
    val bandMargin = rows.collect { case ("ALL", b, c) if b != "ALL" => c }.sum
    val leaves = rows.collect {
      case (t, b, c) if t != "ALL" && b != "ALL" => c }.sum
    assert(grand == bandMargin && grand == leaves,
      s"margins disagree: grand=$grand bands=$bandMargin leaves=$leaves")
  }
}
