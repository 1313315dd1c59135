package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.llm.Dedup

/** Streaming incremental near-dedup — the batch contract
  * ([[graft.llm.Dedup.incrementalNearDedup]]) composed with a document
  * stream (the graft-cdc source in the specs) in a `foreachBatch` loop
  * that maintains the persisted state the contract reads:
  *
  * {{{
  *   stateDir/accepted/batch-N/   surviving docs of micro-batch N
  *   stateDir/bands/batch-N/      their LSH band rows — the index
  * }}}
  *
  * Each micro-batch dedups against the union of all PRIOR batches'
  * state — the driver lists `batch-i` dirs with `i < N`, so a torn
  * `batch-N` dir left by a crash mid-write is never read — then
  * installs its own survivors and band rows as an idempotent OVERWRITE
  * of the `batch-N` dirs. `foreachBatch` is at-least-once: a crash
  * between the state write and the checkpoint commit redelivers batch
  * N, which recomputes the SAME survivors from the same prior state
  * (everything in the chain is deterministic) and overwrites the same
  * dirs — the exactly-once end state without a transactional store,
  * the same idempotence argument as the versioned document sink (T2).
  *
  * Scale shape per micro-batch: identical to the batch contract — the
  * batch's bands semi-join the persisted index so only touched buckets
  * are pulled, old-vs-old pairs never form, and the per-batch state
  * append is batch-sized. The index grows one bounded directory per
  * batch; folding those into few files is a [[graft.cdc.Maintenance]]
  * -window concern, like every other append-accumulating layout here.
  */
object StreamingNearDedup {

  /** Committed state dirs of batches strictly below `upTo` (the
    * current batch never reads its own — possibly torn — output). */
  private def priorDirs(spark: SparkSession, dir: String,
                        upTo: Long): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).map(_.getPath).toSeq
      .filter { q =>
        q.getName.startsWith("batch-") &&
          q.getName.stripPrefix("batch-").toLong < upTo
      }
      .map(_.toString)
  }

  private def readPrior(spark: SparkSession, dir: String, upTo: Long,
                        schema: StructType): DataFrame = {
    val dirs = priorDirs(spark, dir, upTo)
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  /** One micro-batch: dedup `batch` against the persisted prior state,
    * install its survivors + band rows under `batch-<batchId>`.
    * Idempotent — redelivery overwrites with identical content. */
  def processBatch(stateDir: String, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 16, bands: Int = 8)
                  (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // NOT widened (r16 A/B): spreading the ~1 s single-task signature
    // pass over 32 tasks measured WORSE cold (21.6 → 31.3 s for the
    // whole drain — per-task overhead and 32 tiny state files per
    // batch dir swamped the parallelism); the batch stays one
    // partition and the state writes one file per batch dir.
    val docs = batch.select(col(idCol), col(textCol))
    val bandSchema = Dedup.minhashBands(docs.limit(0), idCol, textCol,
      shingleN, numHashes, bands).schema
    val priorBands = readPrior(spark, s"$stateDir/bands", batchId, bandSchema)
    val priorDocs = readPrior(spark, s"$stateDir/accepted", batchId,
      docs.schema)
    // ONE signature pass per batch (r16): the staged band rows feed
    // the dedup AND the index append — the append is the batch bands
    // semi-joined to the survivor ids (minhashBands is deterministic
    // per row, so this is exactly minhashBands(survivors) without
    // re-shingling the texts)
    val bBands = Dedup.minhashBands(docs, idCol, textCol,
      shingleN, numHashes, bands).localCheckpoint()
    // staged: the survivors feed both state writes, and the second
    // write must not recompute the dedup against state it just changed
    val survivors = Dedup.incrementalNearDedupFrom(
        Dedup.incrementalNearDupsWithBands(bBands, docs, priorBands,
          priorDocs, idCol, textCol, shingleN),
        docs, idCol)
      .localCheckpoint()
    survivors.coalesce(1).write.mode("overwrite")
      .parquet(s"$stateDir/accepted/batch-$batchId")
    bBands.join(survivors.select(col(idCol)), Seq(idCol), "left_semi")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$stateDir/bands/batch-$batchId")
  }

  /** The cumulative accepted corpus (all committed batches). */
  def accepted(spark: SparkSession, stateDir: String,
               schema: StructType): DataFrame =
    readPrior(spark, s"$stateDir/accepted", Long.MaxValue, schema)

  /** Launch the flow over a streaming document DataFrame: one consumer
    * = one checkpoint (T1); `onBatchDone(batchId)` fires AFTER the
    * state write but BEFORE the checkpoint commit — the crash-window
    * hook the exactly-once spec drives. */
  def flow(docs: DataFrame, stateDir: String, checkpoint: String,
           idCol: String = "doc_id", textCol: String = "text",
           onBatchDone: Long => Unit = _ => ()): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(stateDir, idCol, textCol)(b, id)
        onBatchDone(id)
      }
      .start()
}
