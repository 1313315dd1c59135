package graft

import graft.llm.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Incremental dedup — the growing-corpus contract: new batches check
  * against the accepted corpus's index and within themselves; accepted
  * docs are immutable and never re-deduped. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact: index probe + within-batch lowest-id, index delta grows") {
    val corpus = Seq((10L, "alpha beta gamma"), (11L, "delta epsilon"))
      .toDF("doc_id", "text")
    val index = corpus.select(TextOps.fingerprint($"text").as("fp"))
    // 20 dups corpus doc 10; 21/23 are within-batch dups (21 wins)
    val batch1 = Seq((20L, "alpha beta gamma"), (21L, "zeta eta"),
      (23L, "zeta eta"), (24L, "theta iota"))
      .toDF("doc_id", "text")
    val s1 = Dedup.incrementalExact(batch1, index, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(s1.toSeq == Seq(21L, 24L))
    // accept batch1 survivors; a batch2 dup of 21 must now be dropped
    val index2 = index.unionByName(
      batch1.join(s1.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi")
        .select(TextOps.fingerprint($"text").as("fp")))
    val batch2 = Seq((30L, "zeta eta"), (31L, "kappa lambda"))
      .toDF("doc_id", "text")
    val s2 = Dedup.incrementalExact(batch2, index2, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(s2.toSeq == Seq(31L))
  }

  test("near: batch yields to a HIGHER-id corpus doc (immutable corpus)") {
    // under full re-dedup the higher id loses, so corpus doc 100 would
    // be dropped in favor of batch doc 5; incrementally the accepted
    // corpus is immutable — the batch doc must yield regardless of id
    val text = "one two three four five six seven eight nine ten"
    val corpus = Seq((100L, text), (101L, "unrelated words here entirely"))
      .toDF("doc_id", "text")
    val batch = Seq((5L, text), (6L, "something else altogether now"))
      .toDF("doc_id", "text")
    val survivors = Dedup.incrementalNearDedup(batch,
        Dedup.minhashBands(corpus, "doc_id", "text"), corpus,
        "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(survivors.toSeq == Seq(6L), s"batch dup of an accepted doc " +
      s"must yield even with a lower id; got ${survivors.toSeq}")
  }

  test("near pairs: equals the full run's batch-involving pairs") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(pmod($"doc_id", lit(5)) =!= 0)
    val batch = docs.filter(pmod($"doc_id", lit(5)) === 0)
    val full = Dedup.minhashNearDups(docs, "doc_id", "text")
      .filter($"id_a" % 5 === 0 || $"id_b" % 5 === 0)
      .as[(Long, Long, Long)].collect().toSet
    val inc = Dedup.incrementalNearDups(batch,
        Dedup.minhashBands(corpus, "doc_id", "text"), corpus,
        "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    // the incremental run can only find MORE true pairs (its buckets
    // are subsets of the full run's, so the giant-bucket cap splits
    // less); both sides are exact-Jaccard-verified, so ⊇ is the
    // correct relation and any extras are genuine near-dups
    assert(inc.intersect(full) == full,
      s"incremental missed full-run pairs: ${full.diff(inc)}")
  }
}
