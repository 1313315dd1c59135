package graft

import graft.llm.Dedup
import graft.streaming.StreamingNearDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.streaming.StreamingNearDedup]]: the streamed cumulative
  * accepted corpus must equal the batch
  * [[graft.llm.Dedup.incrementalNearDedup]] fold over the same pages —
  * crash window included (a redelivered batch recomputes identical
  * state), fed by the graft-cdc source. */
class StreamingNearDedupSpec extends SparkSpec {
  import org.apache.spark.sql.Encoders

  private val pageVersions = 125L

  /** The version pages the cdc source will deliver: (lo, hi] windows
    * of `pageVersions`, version = doc_id + 1. */
  private def pages(docs: DataFrame): Seq[DataFrame] =
    (0 until 4).map { i =>
      docs.filter(col("doc_id") + 1 > i * pageVersions &&
        col("doc_id") + 1 <= (i + 1) * pageVersions)
    }

  /** Driver-side reference: the batch contract folded page by page. */
  private def batchFold(docs: DataFrame): Set[Long] = {
    val spark = docs.sparkSession
    var accepted = docs.limit(0).localCheckpoint()
    var bands = Dedup.minhashBands(docs.limit(0), "doc_id", "text")
      .localCheckpoint()
    pages(docs).foreach { page =>
      val surv = Dedup.incrementalNearDedup(page, bands, accepted,
        "doc_id", "text").localCheckpoint()
      accepted = accepted.unionByName(surv).localCheckpoint()
      bands = bands.unionByName(
        Dedup.minhashBands(surv, "doc_id", "text")).localCheckpoint()
    }
    accepted.select("doc_id").as[Long](Encoders.scalaLong).collect().toSet
  }

  test("streamed cumulative near-dedup == the batch fold over the same " +
      "pages, with a crash window redelivering one batch") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val feedDir = tmpDir("snd-feed")
    val stateDir = tmpDir("snd-state")
    val ckpt = tmpDir("snd-ckpt")
    docs.withColumn("change_version", col("doc_id") + 1)
      .write.mode("overwrite").parquet(feedDir)

    // the cdc source delivers canonical change records; the document
    // payload rehydrates via a stream-static join on the entity id —
    // the same shape as CdcPipeline's header rehydration (J2)
    def stream() = spark.readStream.format("graft-cdc")
      .option("path", feedDir)
      .option("entityColumn", "doc_id")
      .option("versionColumn", "change_version")
      .option("maxVersionsPerBatch", pageVersions.toString)
      .load()
      .select(col("entity_id").as("doc_id"))
      .join(docs, Seq("doc_id"))

    // run 1: crash AFTER batch 1's state write, BEFORE its checkpoint
    // commit — the at-least-once hazard window
    val q1 = StreamingNearDedup.flow(stream(), stateDir, ckpt,
      onBatchDone = id =>
        if (id == 1) throw new RuntimeException("injected crash"))
    val failed = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(failed).exists(_.contains("injected crash")),
      s"wrong failure: $failed")
    // batch 1's uncommitted state is on disk at the crash point
    assert(new java.io.File(s"$stateDir/accepted/batch-1").exists(),
      "crash fired after the state write")

    // run 2: restart redelivers batch 1 (identical recompute over the
    // same prior state, idempotent overwrite), then drains the feed
    val q2 = StreamingNearDedup.flow(stream(), stateDir, ckpt)
    q2.awaitTermination(180000)

    val got = StreamingNearDedup.accepted(spark, stateDir, docs.schema)
      .select("doc_id").as[Long](Encoders.scalaLong).collect()
    assert(got.length == got.toSet.size,
      "redelivery must not duplicate accepted docs")
    val want = batchFold(docs)
    assert(got.toSet == want,
      s"missing=${(want -- got.toSet).take(5)} " +
        s"extra=${(got.toSet -- want).take(5)}")
    // the fixture is non-trivial in both directions: every page landed
    // state, and cross-batch dups were actually rejected
    assert((0 until 4).forall(i =>
      new java.io.File(s"$stateDir/accepted/batch-$i").exists()))
    assert(want.size < docs.count(),
      "fixture must contain near-dups that the fold rejects")
  }
}
