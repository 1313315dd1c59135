package graft

import org.apache.spark.sql.functions._
import graft.cdc.{Merge, TombstoneCdc}
import graft.streaming.StreamingMerge

/** Streaming MERGE state maintenance: the streamed state table equals
  * the batch snapshot, and a crash in the swap→commit window converges
  * after restart (merge idempotence end-to-end). */
class StreamingMergeSpec extends SparkSpec {

  private def writeChangeTable(): String = {
    val table = tmpDir("smerge-feed")
    TombstoneCdc.headerFeedOps(spark, sf)
      .unionByName(TombstoneCdc.lineFeedOps(spark, sf))
      .coalesce(2).write.mode("overwrite").parquet(table)
    table
  }

  private def assertStateEqualsSnapshot(statePath: String): Unit = {
    val got = StreamingMerge.stateTable(spark, statePath)
      .select("invoice_id", "change_version", "change_operation")
    val want = Merge.liveSnapshot(spark, sf, Long.MaxValue)
      .select("invoice_id", "change_version", "change_operation")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streamed state diverges from the batch snapshot")
  }

  test("streamed merge over bounded pages equals the batch snapshot") {
    val state = tmpDir("smerge-state") + "/state"
    val q = StreamingMerge.maintain(spark, writeChangeTable(),
      "change_version", "invoice_id", "change_operation",
      state, tmpDir("smerge-ckpt"), pageVersions = 800L)
    q.awaitTermination(180000)
    assertStateEqualsSnapshot(state)
  }

  test("a torn swap (state moved aside, new state not installed) restores from bak") {
    val state = tmpDir("smerge-torn") + "/state"
    Merge.liveSnapshot(spark, sf, 1000L)
      .write.mode("overwrite").parquet(state)
    val before = spark.read.parquet(state).count()
    assert(before > 0)
    // simulate a crash between the two renames: the state dir is gone,
    // the only copy lives under .merge-bak
    val moved = new java.io.File(state)
      .renameTo(new java.io.File(state + ".merge-bak"))
    assert(moved, "test setup: could not move the state dir aside")
    val restored = StreamingMerge.stateTable(spark, state)
    assert(restored.count() == before,
      "stateTable must restore the bak copy, not start from empty")
    assert(new java.io.File(state).exists() &&
      !new java.io.File(state + ".merge-bak").exists())
  }

  test("crash between state swap and checkpoint commit converges on restart") {
    val table = writeChangeTable()
    val state = tmpDir("smerge-crash-state") + "/state"
    val ckpt = tmpDir("smerge-crash-ckpt")
    val q1 = StreamingMerge.maintain(spark, table,
      "change_version", "invoice_id", "change_operation",
      state, ckpt, pageVersions = 800L,
      onBatchMerged = bid =>
        if (bid == 1) throw new RuntimeException("injected crash after swap"))
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(failed).exists(_.contains("injected crash")),
      s"wrong failure: $failed")
    // batch 1's merge IS on disk (swap preceded the crash)...
    assert(StreamingMerge.stateTable(spark, state).count() > 0)
    // ...and the restart redelivers it; version-compare merge replays
    // to the same state, then drains the rest of the feed
    val q2 = StreamingMerge.maintain(spark, table,
      "change_version", "invoice_id", "change_operation",
      state, ckpt, pageVersions = 800L)
    q2.awaitTermination(180000)
    assertStateEqualsSnapshot(state)
  }
}
