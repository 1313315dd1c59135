package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.VectorFunctions

/** One banded LSH observation of a document. */
case class BandRow(band: Int, bucket: Long, docId: Long, sig: Array[Long])

/** A detected near-duplicate: `docId` matches the earlier `dupOfId`. */
case class DupMatch(docId: Long, dupOfId: Long, estJaccardE4: Long)

/** Per-bucket memory of previously seen documents (id + MinHash sig). */
case class BucketState(docs: List[(Long, Array[Long])])

/** [NORTH-STAR] Streaming near-dup dedup: incoming documents are checked
  * against the full ingestion history, continuously — the online flavor
  * of Dedup.minhashNearDups for a training-data pipeline that ingests
  * forever.
  *
  * Shape: per micro-batch, documents → codegen MinHash signatures →
  * explode to (band, bucket) keys → flatMapGroupsWithState keyed by
  * bucket. State per bucket is the MinHash signatures of its members —
  * 16 longs per doc, NOT the shingle sets — so state size is bounded and
  * similarity is estimated the MinHash way (fraction of agreeing lanes
  * is an unbiased Jaccard estimator). At cluster scale the state lives
  * in the state store (RocksDB), partitioned by bucket hash; a skewed
  * bucket is capped by `maxBucketDocs` (the same boilerplate-bucket
  * guard the batch path documents).
  */
object StreamingDedup {

  val defaultSigLanes = 16

  /** Estimated Jaccard (scaled 1e4) = agreeing lanes / lanes. */
  def estJaccardE4(a: Array[Long], b: Array[Long]): Long = {
    var eq = 0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    math.round(10000.0 * eq / n)
  }

  /** Stateful per-bucket matcher. Emits one DupMatch per (new doc,
    * stored doc) pair whose estimated Jaccard clears the threshold;
    * then remembers the new doc. */
  def matchBucket(maxBucketDocs: Int, minEstJaccardE4: Long)(
      bucket: Long, rows: Iterator[BandRow],
      state: GroupState[BucketState]): Iterator[DupMatch] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var docs = state.getOption.map(_.docs).getOrElse(Nil)
    val out = List.newBuilder[DupMatch]
    rows.toSeq.sortBy(_.docId).foreach { r =>
      docs.foreach { case (oldId, oldSig) =>
        if (oldId != r.docId) {
          val j = estJaccardE4(oldSig, r.sig)
          if (j >= minEstJaccardE4) out += DupMatch(r.docId, oldId, j)
        }
      }
      if (!docs.exists(_._1 == r.docId) && docs.size < maxBucketDocs)
        docs = (r.docId, r.sig) :: docs
    }
    state.update(BucketState(docs))
    out.result().iterator
  }

  /** Banded LSH rows for a (streaming or batch) document DataFrame. Band
    * geometry comes from the shared Dedup.bandBuckets so the online and
    * batch pipelines bucket identically. */
  def bandRows(docs: DataFrame, idCol: String, textCol: String,
               shingleN: Int = 3, lanes: Int = defaultSigLanes,
               bands: Int = 8): Dataset[BandRow] = {
    val spark = docs.sparkSession
    VectorFunctions.register(spark)
    import spark.implicits._
    docs.select(col(idCol).as("docId"),
      VectorFunctions.minhashSig(
        VectorFunctions.shingleHashes(
          split(col(textCol), " "), shingleN), lanes).as("sig"))
      .select(col("docId"), col("sig"),
        explode(graft.llm.Dedup.bandBuckets(col("sig"), lanes, bands)).as("bb"))
      .select(col("bb.band"), col("bb.bucket"), col("docId"), col("sig"))
      .as[BandRow]
  }

  /** The streaming dedup dataset: one DupMatch per detected pair (a pair
    * colliding in several bands may emit once per band — callers
    * `dropDuplicates("docId","dupOfId")` at the sink if needed). */
  def dupStream(docs: DataFrame, idCol: String, textCol: String,
                minEstJaccardE4: Long = 7000,
                maxBucketDocs: Int = 1000): Dataset[DupMatch] = {
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[DupMatch]
    bandRows(docs, idCol, textCol)
      .groupByKey(r => r.bucket)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        matchBucket(maxBucketDocs, minEstJaccardE4))
  }
}
