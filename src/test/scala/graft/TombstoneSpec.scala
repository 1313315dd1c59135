package graft

import org.apache.spark.sql.functions._
import graft.cdc.{ConsumerStateStore, TombstoneCdc, TombstoneFeed}
import graft.sinks.DocumentSink

/** Delete/tombstone change semantics (the round-3 capability add): the
  * operation column through the DSv2 source, latest-op-wins collapse,
  * tombstone emission on rehydration, and a delete crossing a crash
  * boundary in the exactly-once protocol. */
class TombstoneSpec extends SparkSpec {
  import spark.implicits._

  test("DSv2 source carries the change operation column (I/U/D)") {
    val out = tmpDir("ops-src")
    Seq((1L, 10L, "I"), (2L, 11L, "U"), (1L, 12L, "D"), (3L, 13L, "U"))
      .toDF("entity_id", "change_version", "op")
      .coalesce(1).write.mode("overwrite").parquet(out)
    val df = spark.read.format("graft-cdc")
      .option("path", out)
      .option("operationColumn", "op")
      .load()
    assert(df.schema.fieldNames.toSeq ==
      Seq("entity_id", "change_version", "change_operation"))
    val got = df.as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 10L, "I"), (2L, 11L, "U"), (1L, 12L, "D"),
      (3L, 13L, "U")))
  }

  test("DSv2 source: version pushdown still prunes with the op column on") {
    val out = tmpDir("ops-src-push")
    Seq((1L, 10L, "I"), (2L, 20L, "D")).toDF("entity_id", "change_version", "op")
      .coalesce(1).write.mode("overwrite").parquet(out)
    val got = spark.read.format("graft-cdc")
      .option("path", out).option("operationColumn", "op").load()
      .filter(col("change_version") > 15)
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((2L, 20L, "D")))
  }

  test("DSv2 source: a null operation reads as null, not an error") {
    val out = tmpDir("ops-src-null")
    Seq((1L, 10L, Some("I")), (2L, 11L, None))
      .toDF("entity_id", "change_version", "op")
      .coalesce(1).write.mode("overwrite").parquet(out)
    val got = spark.read.format("graft-cdc")
      .option("path", out).option("operationColumn", "op").load()
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got == Set((1L, 10L, Some("I")), (2L, 11L, None)))
  }

  test("DSv2 source: a non-string operation column fails loudly at planning") {
    val out = tmpDir("ops-src-bad")
    Seq((1L, 10L, 5L)).toDF("entity_id", "change_version", "op")
      .coalesce(1).write.mode("overwrite").parquet(out)
    val e = intercept[Exception] {
      spark.read.format("graft-cdc")
        .option("path", out).option("operationColumn", "op").load().collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("op") && m.contains("BINARY")),
      s"unhelpful error: ${messages(e)}")
  }

  test("DSv2 source: a raw-bytes BINARY op column (no UTF8 annotation) is rejected") {
    val out = tmpDir("ops-src-rawbin")
    // Spark writes BinaryType as parquet BINARY with NO String logical
    // annotation — exactly the column that must not pass for 'string'
    Seq((1L, 10L, Array[Byte](0x49)))
      .toDF("entity_id", "change_version", "op")
      .coalesce(1).write.mode("overwrite").parquet(out)
    val e = intercept[Exception] {
      spark.read.format("graft-cdc")
        .option("path", out).option("operationColumn", "op").load().collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("op") && m.contains("UTF8")),
      s"raw BINARY accepted as string: ${messages(e)}")
  }

  test("rehydrate derives each key's op by version parity == collapse op") {
    val store = new ConsumerStateStore(spark, tmpDir("parity-state"))
    val feed = new TombstoneFeed(spark, sf, store)
    val page = feed.poll("parity", limit = 200).data
      .select($"invoice_id".cast("long"), $"change_operation")
      .as[(Long, String)].collect().toMap
    assert(page.nonEmpty)
    val truth = TombstoneCdc.changedInvoicesOps(spark, sf, 0L, Long.MaxValue)
      .as[(Long, Long, String)].collect().map(t => t._1 -> t._3).toMap
    page.foreach { case (id, op) =>
      assert(op == truth(id), s"invoice $id: rehydrated op $op != collapse op ${truth(id)}")
    }
  }

  test("latest-op-wins collapse: final op comes from the newest feed row") {
    val collapsed = TombstoneCdc.changedInvoicesOps(spark, sf, 0L, Long.MaxValue)
      .as[(Long, Long, String)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val withLines = Tables.lineitem(spark, sf)
      .select($"l_orderkey").distinct().as[Long].collect().toSet
    collapsed.foreach { case (id, (v, op)) =>
      if (withLines(id)) {
        assert(v == 2 * id + 1, s"invoice $id: newest version should be the line row")
        val want = if (id % 7 == 0) "D" else if (id % 7 == 1) "I" else "U"
        assert(op == want, s"invoice $id: line rule, got $op")
      } else {
        assert(v == 2 * id, s"invoice $id: newest version should be the header row")
        val want = if (id % 10 == 0) "D" else if (id % 10 < 3) "I" else "U"
        assert(op == want, s"invoice $id: header rule, got $op")
      }
    }
    // both rules must actually fire somewhere or the test is vacuous
    assert(collapsed.keys.exists(withLines), "no line-final invoice")
    assert(collapsed.keys.exists(id => !withLines(id)), "no header-final invoice")
  }

  test("deletes become tombstones with null payload; others keep theirs") {
    val page = TombstoneCdc.pageQueryDeletes(spark, sf, 0L, Long.MaxValue, 200)
      .collect()
    val (tomb, live) = page.partition(_.getAs[Long]("is_tombstone") == 1L)
    assert(tomb.nonEmpty, "no tombstones in the page — delete rule never fired")
    assert(live.nonEmpty)
    tomb.foreach { r =>
      assert(r.getAs[String]("change_operation") == "D")
      assert(r.isNullAt(r.fieldIndex("invoice_number")))
      assert(r.isNullAt(r.fieldIndex("total_amount")))
      assert(r.isNullAt(r.fieldIndex("lines")))
      assert(!r.isNullAt(r.fieldIndex("invoice_id")))
      assert(!r.isNullAt(r.fieldIndex("change_version")))
    }
    live.foreach { r =>
      assert(r.getAs[String]("change_operation") != "D")
      assert(!r.isNullAt(r.fieldIndex("invoice_number")))
    }
  }

  test("T2+D: a delete crossing a crash boundary delivers exactly one tombstone") {
    val store = new ConsumerStateStore(spark, tmpDir("tomb-state"))
    val feed = new TombstoneFeed(spark, sf, store)
    val sink = tmpDir("tomb-sink")
    val err = tmpDir("tomb-err")

    // poll #1: the page (which contains deletes) reaches the sink, then
    // the process "crashes" before the cursor commit
    val p1 = feed.poll("c1", limit = 150)
    DocumentSink.writeVersioned(p1.data, sink, err)
    val tombstones1 = p1.data.filter($"is_tombstone" === 1).count()
    assert(tombstones1 > 0, "page must contain at least one delete")

    // poll #2 after restart: same page redelivered (cursor unchanged)
    feed.pollAndDeliver("c1", limit = 150) { df =>
      DocumentSink.writeVersioned(df, sink, err)
    }

    // raw sink holds the duplicates; the idempotent read collapses them
    val deduped = DocumentSink.deduplicated(spark, sink)
    assert(deduped.count() == p1.count, "exactly-once end effect")
    val tombstonesDelivered = deduped.filter($"is_tombstone" === 1).count()
    assert(tombstonesDelivered == tombstones1,
      "every delete delivered exactly once as a tombstone")
    // tombstones were NOT misrouted to the error dir
    val errFiles = Option(new java.io.File(err).listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".json"))
    assert(errFiles.isEmpty,
      "tombstones must flow to the sink, not the error dir")
    // and the drain completes with the cursor at the feed head
    feed.drain("c1", 400)(df => DocumentSink.writeVersioned(df, sink, err))
    val expectedIds = TombstoneCdc.changedInvoicesOps(spark, sf, 0L, Long.MaxValue)
      .select($"invoice_id").as[Long].collect().toSet
    val deliveredIds = DocumentSink.deduplicated(spark, sink)
      .select($"invoice_id".cast("long")).as[Long].collect().toSet
    assert(deliveredIds == expectedIds, "full feed delivered after drain")
  }
}
