package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Shared maintenance-stream scaffold for the graft-cdc-driven state
  * maintainers: one consumer = one checkpoint dir, bounded version
  * pages, `AvailableNow` drain, per-batch callback AFTER the state
  * install and BEFORE the checkpoint commit (the T2 crash window the
  * specs inject into). [[StreamingMerge]] and [[StreamingScd2]] differ
  * only in their per-batch body — contract changes (source options,
  * trigger, checkpoint wiring) live here once. */
private[streaming] object ChangeStream {

  def maintain(spark: SparkSession, changeTablePath: String,
               versionColumn: String, entityColumn: String,
               operationColumn: String, checkpointDir: String,
               pageVersions: Long,
               onBatchDone: Long => Unit)
              (perBatch: (DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream.format("graft-cdc")
      .option("path", changeTablePath)
      .option("versionColumn", versionColumn)
      .option("entityColumn", entityColumn)
      .option("operationColumn", operationColumn)
      .option("maxVersionsPerBatch", pageVersions.toString)
      .load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        perBatch(batch, batchId)
        onBatchDone(batchId)
        ()
      }
      .start()
}
