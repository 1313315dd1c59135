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

  test("min/max incremental view equals the direct view at every split") {
    val v1 = 2500L
    for (v0 <- Seq(0L, 1L, 700L, 1000L, 2499L, 2500L))
      assertSame(
        AggView.incrementalMinMaxView(spark, sf, v0, v1),
        AggView.directMinMaxView(spark, sf, v1),
        s"min/max split at $v0 diverges from the direct view")
  }

  test("removing the extremum holder forces a correct rescan") {
    import spark.implicits._
    val view = Seq(("a", 3L, 5L, 90L), ("b", 1L, 7L, 7L))
      .toDF("grp", "n_rows", "min_cents", "max_cents")
    // group a loses its max holder (90) and gains 40: new max must come
    // from the remaining rows {5, 20} ∪ {40} = 40, which only the rescan
    // can know; group b is untouched and must not be rescanned
    val old = Seq(("a", 90L)).toDF("grp", "measure")
    val nw = Seq(("a", 40L)).toDF("grp", "measure")
    var rescanAsked: Seq[String] = Nil
    val after = AggView.applyMinMaxDelta(view, old, nw, groups => {
      rescanAsked = groups.as[String].collect().toSeq
      Seq(("a", 3L, 5L, 40L)).toDF("grp", "n_rows", "min_cents", "max_cents")
    })
    assertSame(after,
      Seq(("a", 3L, 5L, 40L), ("b", 1L, 7L, 7L))
        .toDF("grp", "n_rows", "min_cents", "max_cents"),
      "rescan result must replace the dirty group only")
    assert(rescanAsked == Seq("a"), s"rescan set was $rescanAsked, want only a")
  }

  test("inserts alone never rescan: extremes extend outward incrementally") {
    import spark.implicits._
    val view = Seq(("a", 2L, 10L, 20L)).toDF("grp", "n_rows", "min_cents", "max_cents")
    val nw = Seq(("a", 5L), ("a", 25L), ("c", 7L)).toDF("grp", "measure")
    // the rescan plan is constructed lazily either way; what must hold
    // is that the DIRTY SET an insert-only delta hands it is empty
    var dirtyGroups = -1L
    val after = AggView.applyMinMaxDelta(view,
      spark.emptyDataset[(String, Long)].toDF("grp", "measure"), nw,
      groups => {
        dirtyGroups = groups.count()
        AggView.viewMinMax(
          spark.emptyDataset[(String, Long)].toDF("grp", "measure"))
      })
    assertSame(after,
      Seq(("a", 4L, 5L, 25L), ("c", 1L, 7L, 7L))
        .toDF("grp", "n_rows", "min_cents", "max_cents"),
      "insert-only extremes must fold in without a rescan")
    assert(dirtyGroups == 0L,
      s"insert-only delta marked $dirtyGroups groups dirty, want 0")
  }

  test("ScalaCheck: min/max delta-apply == recompute when payloads change") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CheckTest}
    import spark.implicits._
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
        val inc = AggView.applyMinMaxDelta(
          AggView.viewMinMax(contrib(snap0)),
          contrib(touched0), contrib(merge(touched0, batch)),
          groups => AggView.viewMinMax(contrib(live(feed, 40L)))
            .join(groups, Seq("grp"), "left_semi"))
        val direct = AggView.viewMinMax(contrib(live(feed, 40L)))
        inc.exceptAll(direct).isEmpty && direct.exceptAll(inc).isEmpty
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
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
