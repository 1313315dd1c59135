package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Online near-dup detection: later batches match against the full
  * ingestion history held in per-bucket state. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("edited copies arriving in a later batch match their originals") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf).filter($"doc_id" < 30)
      .select($"doc_id", $"text").as[(Long, String)].collect()

    val mem = MemoryStream[(Long, String)]
    val feed = mem.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.dupStream(feed, "doc_id", "text")
      .writeStream.format("memory").queryName("dups")
      .outputMode("append").start()
    try {
      // batch 1: originals — no planted history yet; any match here is
      // within the original corpus itself (allowed: the fixture contains
      // its own near-dups)
      mem.addData(docs.toIndexedSeq: _*)
      q.processAllAvailable()
      val pairs1 = spark.table("dups")
        .select($"docId", $"dupOfId").as[(Long, Long)].collect().toSet

      // batch 2: edited copies (drop last token, add marker)
      val copies = docs.map { case (id, text) =>
        (id + 100000L, text.split(' ').init.mkString(" ") + " zz")
      }
      mem.addData(copies.toIndexedSeq: _*)
      q.processAllAvailable()

      val matches = spark.table("dups")
        .select($"docId", $"dupOfId").as[(Long, Long)]
        .collect().toSet
      val expected = docs.map { case (id, _) => (id + 100000L, id) }.toSet
      assert(expected.subsetOf(matches),
        s"missed copies: ${(expected -- matches).take(5)}")
      // direction invariant: a match names the NEW doc and points back to
      // the EARLIER stored one — with originals ingested first and copies
      // id-offset by 100000, every pair must flow copy → lower-id history
      assert(matches.forall { case (docId, dupOfId) => dupOfId < docId },
        s"reversed match: ${matches.find { case (d, o) => o >= d }}")
      // batch 1 could not have reported any planted pair (copies hadn't
      // been ingested), and both its endpoints are original-corpus ids
      assert(pairs1.forall { case (d, o) => d < 100000L && o < 100000L },
        s"batch 1 leaked a planted id: ${pairs1.find(p => p._1 >= 100000L || p._2 >= 100000L)}")
    } finally q.stop()
  }

  test("estJaccardE4 estimator: identical sigs 1e4, disjoint ~0") {
    val a = Array.fill(16)(7L)
    assert(StreamingDedup.estJaccardE4(a, a) == 10000L)
    val b = Array.tabulate(16)(i => i.toLong)
    val c = Array.tabulate(16)(i => i + 100L)
    assert(StreamingDedup.estJaccardE4(b, c) == 0L)
  }
}
