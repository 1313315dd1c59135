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
}
