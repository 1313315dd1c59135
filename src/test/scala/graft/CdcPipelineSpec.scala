package graft

import graft.streaming.CdcPipeline
import org.apache.spark.sql.functions._

/** End-to-end streaming CDC delivery: custom source pages → collapse →
  * rehydrate → nest → versioned sink, exactly-once. */
class CdcPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("streaming delivery produces one document per (entity, page) at max version") {
    val sink = tmpDir("pipe-sink")
    val err = tmpDir("pipe-err")
    val ckpt = tmpDir("pipe-ckpt")
    val q = CdcPipeline.deliver(spark, sf, sink, err, ckpt, pageVersions = 250L)
    q.awaitTermination(180000)

    // recompute the expected (entity, version) set from the same paging
    val events = Tables.events(spark, sf)
      .select($"user_id", $"event_id").as[(Long, Long)].collect()
    val minV = events.map(_._2).min
    val maxV = events.map(_._2).max
    val orderKeys = Tables.orders(spark, sf)
      .select($"o_orderkey").as[Long].collect().toSet
    val start = minV - 1
    val expected = Iterator.iterate(start)(_ + 250L)
      .takeWhile(_ < maxV).map(lo => (lo, math.min(lo + 250L, maxV)))
      .flatMap { case (lo, hi) =>
        events.filter(e => e._2 > lo && e._2 <= hi)
          .groupBy(_._1).map { case (uid, es) => (uid, es.map(_._2).max) }
          .filter(d => orderKeys.contains(d._1))
      }.toSet

    val docs = graft.sinks.DocumentSink.readBack(spark, sink)
      .select($"invoice_id".cast("long"), $"change_version".cast("long"))
      .as[(Long, Long)].collect()
    assert(docs.length == docs.toSet.size, "no duplicate documents")
    assert(docs.toSet == expected,
      s"missing=${(expected -- docs.toSet).take(3)} extra=${(docs.toSet -- expected).take(3)}")

    // document payload: nested lines survive the trip
    val withLines = graft.sinks.DocumentSink.readBack(spark, sink)
      .filter(length($"lines") > 2)
    assert(withLines.count() > 0)

    // restart with same checkpoint: nothing redelivered
    val q2 = CdcPipeline.deliver(spark, sf, sink, err, ckpt, pageVersions = 250L)
    q2.awaitTermination(60000)
    assert(graft.sinks.DocumentSink.readBack(spark, sink).count() == docs.length)
  }

  test("T2: a crash between sink write and checkpoint commit redelivers exactly once") {
    val sink = tmpDir("crash-sink")
    val err = tmpDir("crash-err")
    val ckpt = tmpDir("crash-ckpt")

    // run 1: kill the query AFTER batch 1's page reached the sink but
    // BEFORE its offset commit — the exactly-once hazard window
    val q1 = CdcPipeline.deliver(spark, sf, sink, err, ckpt,
      pageVersions = 250L,
      onBatchDelivered = bid =>
        if (bid == 1) throw new RuntimeException("injected crash after sink write"))
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(failed).exists(_.contains("injected crash")), s"wrong failure: $failed")
    val afterCrash = graft.sinks.DocumentSink.readBack(spark, sink).count()
    assert(afterCrash > 0, "batch 1's page must be on disk at the crash point")

    // run 2 (restart, no injection): the uncommitted batch is REDELIVERED
    // — raw sink gains duplicate appends for it — and the run drains the feed
    val q2 = CdcPipeline.deliver(spark, sf, sink, err, ckpt, pageVersions = 250L)
    q2.awaitTermination(180000)
    val raw = graft.sinks.DocumentSink.readBack(spark, sink)
      .select($"invoice_id".cast("long"), $"change_version".cast("long"))
      .as[(Long, Long)].collect()
    assert(raw.length > raw.toSet.size,
      "the crashed batch must appear twice in the raw append-only sink")

    // end effect: deduplicated read-back == a clean never-crashed run
    val sink2 = tmpDir("clean-sink")
    val q3 = CdcPipeline.deliver(spark, sf, sink2, tmpDir("clean-err"),
      tmpDir("clean-ckpt"), pageVersions = 250L)
    q3.awaitTermination(180000)
    def canonical(dir: String) =
      graft.sinks.DocumentSink.deduplicated(spark, dir)
        .select($"invoice_id".cast("long"), $"change_version".cast("long"),
          $"invoice_number", $"lines")
        .as[(Long, Long, String, String)].collect().toSet
    assert(canonical(sink) == canonical(sink2),
      "crashed+restarted delivery must equal the never-crashed delivery")
    // and the error dir stayed empty — redelivery is not an error path
    val errFiles = Option(new java.io.File(err).listFiles())
      .getOrElse(Array.empty[java.io.File]).filter(_.getName.endsWith(".json"))
    assert(errFiles.isEmpty, "redelivery is not an error path")
  }
}
