package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4-S6 — the versioned document sink.
  *
  * Reference semantics (invoice-api/server.js:33-42,62-80,368-421): one
  * document per (invoice, change version), named
  * `${invoiceNumber}_v${version}_${yyyyMMdd_HHmmss}.bson`; failed documents
  * segregated to an error dir; a listing endpoint (newest first, with
  * size); and per-document read-back.
  *
  * Spark-first shape: documents are JSON-lines records written
  * `partitionBy(change_version)` — one directory per version, written in
  * parallel, append-only (a version never rewrites, so the layout is
  * idempotent under redelivery: re-appending an identical record is
  * deduplicated by the `doc_name` key on read). The reference's filename
  * becomes a `doc_name` column — at 100 TB one-file-per-document is a
  * small-files catastrophe; the name travels as data instead, and the
  * partition dir carries the version.
  */
object DocumentSink {

  /** Stamp the document name (filename scheme, server.js:64-66). */
  def withDocName(df: DataFrame): DataFrame =
    df.withColumn("doc_name",
      concat(col("invoice_number"), lit("_v"), col("change_version"),
        lit("_"), date_format(current_timestamp(), "yyyyMMdd_HHmmss")))

  /** Write one page of documents, segregating invalid records to the
    * error dir (server.js:34,40-42 error path). `valid` defaults to the
    * reference's implicit contract: a document must have an invoice
    * number and a version. */
  def writeVersioned(df: DataFrame, dir: String, errorDir: String): Unit = {
    val stamped = withDocName(df).cache()
    val valid = stamped.filter(
      col("invoice_number").isNotNull && col("change_version").isNotNull)
    val invalid = stamped.filter(
      col("invoice_number").isNull || col("change_version").isNull)
    // co-locate each version's documents in one task before the
    // partitioned write: one file per version dir instead of one per
    // (task × version) — the small-files guard that matters at scale
    valid.repartition(col("change_version"))
      .write.mode("append").partitionBy("change_version").json(dir)
    if (!invalid.isEmpty)
      invalid.write.mode("append").json(errorDir)
    stamped.unpersist()
  }

  /** S5 — sink listing, newest first with size (server.js:368-398).
    * binaryFile gives (path, modificationTime, length) without reading
    * content — a distributed `ls`. */
  def listSink(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.json")
      .load(dir)
      .select(col("path"), col("length"), col("modificationTime"))
      .orderBy(col("modificationTime").desc, col("path"))

  /** S6 — document read-back by name (server.js:401-421). Version-dir
    * partition pruning applies when the caller filters change_version.
    * Pass `schema` when the page shape is known — JSON schema inference
    * costs a full extra pass over every sink file. */
  def readBack(spark: SparkSession, dir: String,
               schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    schema.fold(spark.read)(s => spark.read.schema(s)).json(dir)

  /** Exactly-once on redelivery: the same (invoice, version) appended
    * twice collapses to one document — last-writer-wins on the stamp. */
  def deduplicated(spark: SparkSession, dir: String): DataFrame = {
    val docs = readBack(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("invoice_id"), col("change_version"))
      .orderBy(col("doc_name").desc)
    docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }
}
