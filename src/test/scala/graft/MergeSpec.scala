package graft

import graft.cdc.{Merge, TombstoneCdc}

/** MERGE/upsert state maintenance: incremental == batch (the
  * view-maintenance identity), and idempotence under batch replay (the
  * at-least-once redelivery case). */
class MergeSpec extends SparkSpec {

  private def assertSame(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame,
                         hint: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, hint)

  test("incremental merge equals the direct snapshot at every split") {
    val v1 = 6000L
    for (v0 <- Seq(0L, 1L, 1500L, 3000L, 5999L, 6000L)) {
      assertSame(
        Merge.incrementalSnapshot(spark, sf, v0, v1),
        Merge.liveSnapshot(spark, sf, v1),
        s"split at $v0 diverges from the direct snapshot")
    }
  }

  test("merge is idempotent under full batch replay") {
    val batch = TombstoneCdc.changedInvoicesOps(spark, sf, 3000L, 6000L)
    val once = Merge.incrementalSnapshot(spark, sf, 3000L, 6000L)
    assertSame(Merge.mergeUpsert(once, batch), once,
      "replaying the same batch must not change the state")
  }

  test("ScalaCheck: incremental == direct for arbitrary feeds and splits") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CheckTest}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // generic collapse/live over an arbitrary feed — the same
    // latest-op-wins shape TombstoneCdc uses on the synthetic feed
    def collapse(feed: org.apache.spark.sql.DataFrame,
                 since: Long, to: Long) =
      feed.filter(col("change_version") > since && col("change_version") <= to)
        .groupBy(col("invoice_id"))
        .agg(max(struct(col("change_version"), col("change_operation"))).as("m"))
        .select(col("invoice_id"),
          col("m.change_version").as("change_version"),
          col("m.change_operation").as("change_operation"))
    def live(feed: org.apache.spark.sql.DataFrame, v: Long) =
      collapse(feed, 0L, v).filter(col("change_operation") =!= "D")
    val genRow = for {
      id <- Gen.choose(1L, 20L)
      v <- Gen.choose(1L, 40L)
      op <- Gen.oneOf("I", "U", "D")
    } yield (id, v, op)
    val prop = forAll(Gen.listOfN(60, genRow), Gen.choose(0L, 40L)) {
      (rows, v0) =>
        val feed = rows.toDF("invoice_id", "change_version", "change_operation")
        val inc = Merge.mergeUpsert(live(feed, v0), collapse(feed, v0, 40L))
        val direct = live(feed, 40L)
        inc.exceptAll(direct).isEmpty && direct.exceptAll(inc).isEmpty
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("bucketed state merges without shuffling the state side") {
    import org.apache.spark.sql.functions._
    // the 100 TB claim in Merge's doc: with the state table bucketed on
    // the entity key, the full-outer merge join needs no exchange on
    // the state side — only the (small) change batch sorts/shuffles
    graft.plans.StateLayout.writeBucketed(
      Merge.liveSnapshot(spark, sf, 3000L), "merge_state_b", "invoice_id", 4)
    val state = spark.table("merge_state_b")
    val changes = TombstoneCdc.changedInvoicesOps(spark, sf, 3000L, 6000L)
    val merged = Merge.mergeUpsert(state, changes)
    // correctness first: bucketed-state merge == plain merge
    val plain = Merge.incrementalSnapshot(spark, sf, 3000L, 6000L)
    assert(merged.exceptAll(plain).isEmpty && plain.exceptAll(merged).isEmpty)
    // plan: exactly one shuffle (the changes side); the state side
    // reads its buckets in place
    val n = graft.plans.StateLayout.countShuffles(merged)
    assert(n <= 1,
      s"expected at most one exchange (the change batch); got $n:\n" +
        merged.queryExecution.executedPlan)
  }

  test("a winning delete removes the entity from the state") {
    // header deletes every 10th id at version 2k; an id whose line
    // change (version 2k+1, the newer one) is ALSO a delete must be
    // absent — ids ≡ 0 (mod 70) have both rules delete
    val gone = Merge.liveSnapshot(spark, sf, Long.MaxValue)
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("invoice_id"),
        org.apache.spark.sql.functions.lit(70)) === 0)
    assert(gone.isEmpty, "doubly-deleted entities must not survive")
  }
}
