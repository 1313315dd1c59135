package graft

import graft.cdc.AggView
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate view maintenance: view(v0) + batch deltas must
  * equal the view recomputed from the v1 snapshot — at every split of
  * the synthetic feed, and on ScalaCheck feeds whose PAYLOAD changes
  * across versions (the update-delta path the static invoice payload
  * cannot exercise). */
class AggViewSpec extends SparkSpec {

  private def assertSame(a: DataFrame, b: DataFrame, hint: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, hint)

  test("incremental view equals the direct view at every split") {
    val v1 = 2500L
    for (v0 <- Seq(0L, 1L, 700L, 1000L, 2499L, 2500L))
      assertSame(
        AggView.incrementalView(spark, sf, v0, v1),
        AggView.directView(spark, sf, v1),
        s"split at $v0 diverges from the direct view")
  }

  test("empty batch leaves the view unchanged") {
    assertSame(
      AggView.incrementalView(spark, sf, 2500L, 2500L),
      AggView.directView(spark, sf, 2500L),
      "an empty batch must be a no-op")
  }

  test("a group emptied by deletes drops out of the view") {
    import spark.implicits._
    val view = Seq(("a", 1L, 10L), ("b", 2L, 30L))
      .toDF("grp", "n_rows", "sum_cents")
    val old = Seq(("a", 10L)).toDF("grp", "measure")
    val nw = spark.emptyDataset[(String, Long)].toDF("grp", "measure")
    val after = AggView.applyDelta(view, old, nw)
    assert(after.filter(col("grp") === "a").isEmpty,
      "group a lost its only contributor and must vanish")
    assertSame(after, Seq(("b", 2L, 30L)).toDF("grp", "n_rows", "sum_cents"),
      "group b must be untouched")
  }

  test("ScalaCheck: delta-apply == recompute when payloads change across versions") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CheckTest}
    import spark.implicits._
    // feed rows carry their own payload: (id, version, op, grp, measure);
    // an entity's live contribution is its LATEST row's payload
    def collapse(feed: DataFrame, since: Long, to: Long) =
      feed.filter(col("change_version") > since && col("change_version") <= to)
        .groupBy("invoice_id")
        .agg(max(struct(col("change_version"), col("change_operation"),
          col("grp"), col("measure"))).as("m"))
        .select(col("invoice_id"), col("m.change_version").as("change_version"),
          col("m.change_operation").as("change_operation"),
          col("m.grp").as("grp"), col("m.measure").as("measure"))
    def live(feed: DataFrame, v: Long) =
      collapse(feed, 0L, v).filter(col("change_operation") =!= "D")
    def contrib(snap: DataFrame) = snap.select("grp", "measure")
    // payload-carrying merge: the newest row wins whole (same algebra as
    // Merge.mergeUpsert, payload riding the version compare)
    def merge(state: DataFrame, changes: DataFrame) = {
      val s = state.select(col("invoice_id"), struct(col("change_version"),
        col("change_operation"), col("grp"), col("measure")).as("s"))
      val c = changes.select(col("invoice_id"), struct(col("change_version"),
        col("change_operation"), col("grp"), col("measure")).as("c"))
      val pickC = col("s").isNull ||
        (col("c").isNotNull && col("c.change_version") >= col("s.change_version"))
      s.join(c, Seq("invoice_id"), "full_outer")
        .select(col("invoice_id"),
          when(pickC, col("c")).otherwise(col("s")).as("m"))
        .select(col("invoice_id"), col("m.change_version").as("change_version"),
          col("m.change_operation").as("change_operation"),
          col("m.grp").as("grp"), col("m.measure").as("measure"))
        .filter(col("change_operation") =!= "D")
    }
    val genRow = for {
      id <- Gen.choose(1L, 15L)
      v <- Gen.choose(1L, 40L)
      op <- Gen.oneOf("I", "U", "D")
      g <- Gen.oneOf("x", "y", "z")
      m <- Gen.choose(-50L, 100L)
    } yield (id, v, op, g, m)
    val prop = forAll(Gen.listOfN(50, genRow), Gen.choose(0L, 40L)) {
      (rows, v0) =>
        val feed = rows.toDF("invoice_id", "change_version",
          "change_operation", "grp", "measure")
        val snap0 = live(feed, v0)
        val batch = collapse(feed, v0, 40L)
        val touched0 = snap0.join(batch.select("invoice_id"),
          Seq("invoice_id"), "left_semi")
        val inc = AggView.applyDelta(
          AggView.viewOf(contrib(snap0)),
          contrib(touched0), contrib(merge(touched0, batch)))
        val direct = AggView.viewOf(contrib(live(feed, 40L)))
        inc.exceptAll(direct).isEmpty && direct.exceptAll(inc).isEmpty
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
