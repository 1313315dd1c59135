package graft

import graft.cdc.Retention
import graft.sources.{CdcFiles, CdcOptions}
import org.apache.spark.sql.functions._

/** T6 retention/compaction and its interaction with the changefeed
  * source's footer-stats pruning. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def changes = Tables.events(spark, sf).select(
    col("user_id").as("entity_id"), col("event_id").as("change_version"))

  test("expire drops everything at or below the watermark") {
    val kept = Retention.expire(changes, 400L)
    assert(kept.agg(min($"change_version")).head().getLong(0) == 401L)
    assert(kept.count() == changes.filter($"change_version" > 400).count())
  }

  test("logCompact keeps one newest record per entity below the bound") {
    val compacted = Retention.logCompact(changes, upTo = 500L).cache()
    val oldPart = compacted.filter($"change_version" <= 500L)
    // exactly one row per entity that had any old change
    assert(oldPart.groupBy($"entity_id").count()
      .filter($"count" > 1).isEmpty)
    val expectOld = changes.filter($"change_version" <= 500L)
      .groupBy($"entity_id").agg(max($"change_version").as("v"))
      .as[(Long, Long)].collect().toSet
    assert(oldPart.as[(Long, Long)].collect().toSet == expectOld)
    // tail unchanged
    assert(compacted.filter($"change_version" > 500L).count() ==
      changes.filter($"change_version" > 500L).count())
  }

  test("compacted layout yields disjoint per-file version ranges the source prunes") {
    val out = tmpDir("compact")
    Retention.writeCompacted(changes, out, nFiles = 4)
    val opts = CdcOptions(Map("path" -> out))
    val ranges = CdcFiles.files(opts)
      .map(CdcFiles.versionRange(_, "change_version", "entity_id")).sortBy(_._1)
    assert(ranges.size == 4)
    ranges.sliding(2).foreach { w =>
      if (w.size == 2) assert(w(0)._2 < w(1)._1, s"overlap: $w")
    }
    // a narrow version page must touch exactly one file
    val (lo, hi) = ranges(2)
    val mid = (lo + hi) / 2
    val parts = CdcFiles.partitionsFor(opts, mid, mid + 1)
    assert(parts.length == 1, s"expected 1 pruned partition, got ${parts.length}")
    // and the source reads back exactly the full set
    val viaSource = spark.read.format("graft-cdc").option("path", out).load()
    assert(viaSource.count() == changes.count())
  }
}
