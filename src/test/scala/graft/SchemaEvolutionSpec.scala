package graft

import graft.cdc.SchemaEvolution
import org.apache.spark.sql.functions._

/** Additive schema evolution on the change table: old pages stay
  * untouched on disk, the merged read null-backfills, the T5 collapse
  * keeps latest-row-wins semantics, and the DSv2 cdc source still
  * serves the key feed from the evolved directory. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvolved(dir: String): Unit = {
    // v1 pages: (entity, version, amount) — versions 1..4
    Seq((1L, 1L, 100L), (2L, 2L, 200L), (1L, 3L, 150L), (3L, 4L, 300L))
      .toDF("entity_id", "change_version", "amount_cents")
      .write.mode("overwrite").parquet(dir)
    // the ALTER: later pages add `status` — versions 5..6
    Seq((2L, 5L, 250L, "paid"), (4L, 6L, 400L, "open"))
      .toDF("entity_id", "change_version", "amount_cents", "status")
      .write.mode("append").parquet(dir)
  }

  test("readEvolved: union schema, null backfill, canonical order") {
    val dir = tmpDir("evolve")
    writeEvolved(dir)
    val df = SchemaEvolution.readEvolved(spark, dir,
      Seq("entity_id", "change_version"))
    assert(df.columns.toSeq ==
      Seq("entity_id", "change_version", "amount_cents", "status"))
    val rows = df.as[(Long, Long, Long, Option[String])]
      .collect().sortBy(_._2)
    assert(rows.map(_._4).toSeq ==
      Seq(None, None, None, None, Some("paid"), Some("open")),
      "pre-evolution rows must be null-backfilled, later rows intact")
  }

  test("latestSnapshot: latest-row-wins, no per-column splice") {
    val dir = tmpDir("evolve-snap")
    writeEvolved(dir)
    val snap = SchemaEvolution.latestSnapshot(spark, dir,
        Seq("entity_id", "change_version"))
      .as[(Long, Long, Long, Option[String])].collect()
      .map(r => r._1 -> r).toMap
    assert(snap.keySet == Set(1L, 2L, 3L, 4L))
    // entity 1's winner (v3) predates the evolution: NULL status
    assert(snap(1L) == ((1L, 3L, 150L, None)))
    // entity 2's winner (v5) is post-evolution: carries status
    assert(snap(2L) == ((2L, 5L, 250L, Some("paid"))))
  }

  test("three generations: each page backfills exactly its own gaps") {
    val dir = tmpDir("evolve-3gen")
    writeEvolved(dir) // gen1: amount; gen2: +status
    Seq((5L, 7L, 500L, "void", "eu")) // gen3: +region
      .toDF("entity_id", "change_version", "amount_cents", "status",
        "region")
      .write.mode("append").parquet(dir)
    val df = SchemaEvolution.readEvolved(spark, dir,
      Seq("entity_id", "change_version"))
    assert(df.columns.toSeq == Seq("entity_id", "change_version",
      "amount_cents", "region", "status"))
    val byVer = df.as[(Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._2 -> r).toMap
    assert(byVer(1L) == ((1L, 1L, 100L, None, None)))
    assert(byVer(5L) == ((2L, 5L, 250L, None, Some("paid"))))
    assert(byVer(7L) == ((5L, 7L, 500L, Some("eu"), Some("void"))))
  }

  test("the DSv2 cdc source still serves the key feed after evolution") {
    val dir = tmpDir("evolve-dsv2")
    writeEvolved(dir)
    val feed = spark.read.format("graft-cdc").option("path", dir).load()
    assert(feed.columns.toSeq == Seq("entity_id", "change_version"))
    assert(feed.count() == 6L)
    // version pushdown across old- and new-schema files alike
    assert(feed.filter($"change_version" > 4L).count() == 2L)
  }

  test("streaming: an evolution mid-stream is just more pages") {
    val dir = tmpDir("evolve-stream")
    val sink = tmpDir("evolve-stream-sink")
    val ckpt = tmpDir("evolve-stream-ckpt")
    // gen1 only
    Seq((1L, 1L, 100L), (2L, 2L, 200L))
      .toDF("entity_id", "change_version", "amount_cents")
      .write.mode("overwrite").parquet(dir)
    def drain(): Unit = {
      val q = spark.readStream.format("graft-cdc")
        .option("path", dir).load()
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(sink); ()
        }
        .start()
      q.awaitTermination(120000)
    }
    drain()
    assert(spark.read.parquet(sink).count() == 2L)
    // the ALTER lands: later pages carry the extra column; the key-feed
    // stream must resume from its checkpoint and serve ONLY the new
    // versions, unaffected by the payload schema change
    Seq((1L, 3L, 150L, "paid"), (3L, 4L, 300L, "open"))
      .toDF("entity_id", "change_version", "amount_cents", "status")
      .write.mode("append").parquet(dir)
    drain()
    val out = spark.read.parquet(sink)
      .as[(Long, Long)].collect().sortBy(_._2)
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (1L, 3L), (3L, 4L)),
      s"exactly-once across the evolution boundary; got ${out.toSeq}")
  }
}
