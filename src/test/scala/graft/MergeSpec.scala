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
