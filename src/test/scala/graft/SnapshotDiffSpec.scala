package graft

import graft.cdc.{SnapshotDiff, TombstoneCdc}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff: the batch-driven form (cost ∝ change batch) must
  * equal the direct diff of the two full snapshots — at every split of
  * the synthetic feed and on arbitrary ScalaCheck feeds. */
class SnapshotDiffSpec extends SparkSpec {

  private def feed: DataFrame =
    TombstoneCdc.headerFeedOps(spark, sf)
      .unionByName(TombstoneCdc.lineFeedOps(spark, sf))

  private def assertSame(a: DataFrame, b: DataFrame, hint: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, hint)

  test("batch-driven diff equals the direct snapshot diff at every split") {
    val vB = 2500L
    for (vA <- Seq(0L, 1L, 700L, 1500L, 2499L, 2500L))
      assertSame(
        SnapshotDiff.diff(feed, vA, vB),
        SnapshotDiff.directDiff(feed, vA, vB),
        s"split at $vA diverges from the direct diff")
  }

  test("event-feed diff equals the direct diff at every split") {
    val f = SnapshotDiff.eventFeedOps(spark, sf)
    for (vA <- Seq(0L, 300L, 500L, 900L))
      assertSame(
        SnapshotDiff.diff(f, vA, 950L),
        SnapshotDiff.directDiff(f, vA, 950L),
        s"event split at $vA diverges from the direct diff")
  }

  test("classification shape: A has no vA version, R ends at the delete") {
    val d = SnapshotDiff.eventDiff(spark, sf, 300L, 700L).cache()
    try {
      assert(d.filter(col("diff_op") === "A" && col("version_a").isNotNull)
        .isEmpty, "added rows must not carry a vA version")
      assert(d.filter(col("diff_op") =!= "A" && col("version_a").isNull)
        .isEmpty, "changed/removed rows must carry their vA version")
      assert(d.filter(col("version_b").isNull).isEmpty,
        "every diff row reports the vB-side version (deletes included)")
      // all three classes occur in the synthetic feed at this split
      val ops = d.select("diff_op").distinct().collect().map(_.getString(0))
      assert(ops.toSet == Set("A", "R", "C"), s"expected A/R/C, got ${ops.toSet}")
    } finally d.unpersist()
  }

  test("empty window diffs to nothing") {
    assert(SnapshotDiff.diff(feed, 6000L, 6000L).isEmpty)
  }

  test("ScalaCheck: batch-driven == direct for arbitrary feeds and splits") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CheckTest}
    import spark.implicits._
    val genRow = for {
      id <- Gen.choose(1L, 20L)
      v <- Gen.choose(1L, 40L)
      op <- Gen.oneOf("I", "U", "D")
    } yield (id, v, op)
    val prop = forAll(Gen.listOfN(60, genRow), Gen.choose(0L, 40L)) {
      (rows, vA) =>
        val f = rows.toDF("invoice_id", "change_version", "change_operation")
        val inc = SnapshotDiff.diff(f, vA, 40L)
        val direct = SnapshotDiff.directDiff(f, vA, 40L)
        inc.exceptAll(direct).isEmpty && direct.exceptAll(inc).isEmpty
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
