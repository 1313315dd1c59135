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
  * `partitionBy(version_bucket)` where `version_bucket =
  * change_version / 1000` (the reference's default poll page size,
  * server.js:89) — append-only, written in parallel, idempotent under
  * redelivery (re-appended records are deduplicated by `doc_name` on
  * read). The reference's filename becomes a `doc_name` column — at
  * 100 TB one-file-per-document is a small-files catastrophe, and so is
  * one-DIRECTORY-per-version (a busy feed mints millions of versions);
  * bucketing bounds the directory count at versions/1000 while keeping
  * partition pruning for version-range reads (every read-by-version
  * touches exactly one bucket dir).
  */
object DocumentSink {

  /** Versions per partition directory (the reference's server-side poll
    * page default, server.js:89). */
  val VersionsPerBucket = 1000L

  /** Stamp the document name (filename scheme, server.js:64-66). A
    * tombstone (see graft.cdc.TombstoneCdc) has no invoice_number — its
    * payload is gone by definition — so its name is keyed by the id:
    * `DEL-<invoice_id>_v<version>_<stamp>`. */
  def withDocName(df: DataFrame): DataFrame = {
    val base =
      if (df.columns.contains("is_tombstone"))
        when(col("is_tombstone") === 1,
          concat(lit("DEL-"), col("invoice_id")))
          .otherwise(col("invoice_number"))
      else col("invoice_number")
    df.withColumn("doc_name",
      concat(base, lit("_v"), col("change_version"),
        lit("_"), date_format(current_timestamp(), "yyyyMMdd_HHmmss")))
  }

  /** Write one page of documents, segregating invalid records to the
    * error dir (server.js:34,40-42 error path). `valid` defaults to the
    * reference's implicit contract: a document must have an invoice
    * number and a version. */
  def writeVersioned(df: DataFrame, dir: String, errorDir: String): Unit = {
    val stamped = withDocName(df).cache()
    try {
      // a tombstone is a VALID document despite its null payload — it is
      // the delete notification itself (dropping it to the error dir
      // would re-create the reference's ghost-state bug downstream)
      // `<=>` (null-safe): a null is_tombstone must evaluate the OR to
      // false, not SQL NULL — with `===`, a malformed row (null number
      // AND null flag) fails BOTH filter(ok) and filter(!ok) and is
      // silently dropped instead of landing in the error dir
      val ok =
        if (df.columns.contains("is_tombstone"))
          (col("invoice_number").isNotNull || (col("is_tombstone") <=> 1)) &&
            col("change_version").isNotNull
        else
          col("invoice_number").isNotNull && col("change_version").isNotNull
      val valid = stamped.filter(ok)
      val invalid = stamped.filter(!ok)
      // co-locate each bucket's documents in one task before the
      // partitioned write: one file per bucket dir instead of one per
      // (task × bucket) — the small-files guard that matters at scale
      // integral `div`, not `/`: Spark's `/` computes in double, which can
      // cross a bucket boundary for versions beyond 2^53 and diverge from
      // readVersion's exact Long division
      val spark = df.sparkSession
      val bucketed = valid.withColumn("version_bucket",
          expr(s"change_version div $VersionsPerBucket"))
        .repartition(col("version_bucket"))
      if (graft.streaming.DirSwap.appendsAreManifest(spark, dir)) {
        // MANIFEST protocol (round-14): each delivered page is one
        // immutable generation listed by the keyed manifest — the
        // object-store-sound sink layout. The key is fresh per call
        // (delivery is at-least-once BY DESIGN here; exactly-once
        // lives in [[deduplicated]]'s read-side collapse, same as the
        // rename protocol's mode=append). Inside the generation the
        // page is partitioned by a `vb_part` twin while
        // `version_bucket` stays a DATA column, so [[readVersion]]
        // prunes to one leaf dir per generation and plain reads need
        // no partition discovery across generation roots.
        graft.streaming.ManifestSwap.appendKeyed(spark, dir, "sink",
          "page-" + java.util.UUID.randomUUID().toString) { gen =>
          bucketed.withColumn("vb_part", col("version_bucket"))
            .write.mode("overwrite").partitionBy("vb_part").json(gen)
        }
      } else
        bucketed
          .write.mode("append").partitionBy("version_bucket").json(dir)
      if (!invalid.isEmpty)
        invalid.write.mode("append").json(errorDir)
    } finally stamped.unpersist()
    // finally: a failing write is retried by the delivery protocol —
    // leaking one cached page per retry would accumulate executor
    // storage for the life of a long-running consumer
  }

  /** The sink's json leaf directories under the MANIFEST protocol:
    * every `vb_part=` partition dir across the committed generations,
    * optionally pruned to one bucket (the [[readVersion]] path — one
    * existence-filtered listing per generation, never a sink walk). */
  private def manifestLeafDirs(spark: SparkSession, dir: String,
                               onlyBucket: Option[Long]): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.streaming.DirSwap.readDataPaths(spark, dir, "compact")
      .flatMap { g =>
        val entries =
          try fs.listStatus(new org.apache.hadoop.fs.Path(g)).toSeq
          catch { case _: java.io.FileNotFoundException => Seq.empty }
        entries.filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("vb_part=") &&
            onlyBucket.forall(b => st.getPath.getName == s"vb_part=$b"))
          .map(_.getPath.toString)
      }
  }

  /** S5 — sink listing, newest first with size (server.js:368-398).
    * binaryFile gives (path, modificationTime, length) without reading
    * content — a distributed `ls`. Restores a compaction interrupted
    * between its two renames first (the sink would otherwise read as
    * missing until manual intervention); a manifest sink lists the
    * committed generations instead (nothing to heal). */
  def listSink(spark: SparkSession, dir: String): DataFrame = {
    val base = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.json")
    val loaded =
      if (graft.streaming.DirSwap.isManifestRoot(spark, dir)) {
        val paths = graft.streaming.DirSwap
          .readDataPaths(spark, dir, "compact")
        // a manifest root before its first commit has nothing to
        // list — load() with zero paths throws "path not specified"
        // instead of the empty listing the rename branch returns for
        // an empty dir (round-14 ADVICE)
        if (paths.isEmpty)
          return spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("path",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("length",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("modificationTime",
                org.apache.spark.sql.types.TimestampType))))
        base.option("recursiveFileLookup", "true").load(paths: _*)
      } else {
        graft.streaming.DirSwap.restoreIfTorn(spark, dir, "compact")
        base.load(dir)
      }
    loaded
      .select(col("path"), col("length"), col("modificationTime"))
      .orderBy(col("modificationTime").desc, col("path"))
  }

  /** S6 — document read-back (server.js:401-421). Pass `schema` when the
    * page shape is known — JSON schema inference costs a full extra pass
    * over every sink file. Restores a torn compaction first. */
  def readBack(spark: SparkSession, dir: String,
               schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    if (graft.streaming.DirSwap.isManifestRoot(spark, dir)) {
      // manifest sink: version_bucket is a DATA column inside the
      // generations (the vb_part twin held the partitioning), so the
      // multi-dir read needs no partition discovery
      val leafs = manifestLeafDirs(spark, dir, None)
      if (leafs.isEmpty) schema match {
        case Some(s) => return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
          .drop("version_bucket")
        case None => throw new IllegalArgumentException(
          s"graft sink: $dir has no delivered documents; pass a schema " +
            "to get an empty result instead")
      }
      return schema.fold(spark.read)(s => spark.read.schema(s))
        .json(leafs: _*).drop("version_bucket")
    }
    graft.streaming.DirSwap.restoreIfTorn(spark, dir, "compact")
    schema.fold(spark.read)(s => spark.read.schema(s)).json(dir)
      .drop("version_bucket")
  }

  /** Read the documents of one change version. The bucket directory is
    * derivable from the version, so ONLY that directory is listed, read —
    * and, when no schema is passed, schema-inferred — regardless of sink
    * size (pointing inference at the whole sink would cost a full pass
    * even though the scan itself prunes). A version whose bucket was
    * never written returns empty when a schema is provided (the
    * existence-probe contract); without a schema there is nothing to
    * shape an empty result with, so it throws a named error. */
  def readVersion(spark: SparkSession, dir: String, version: Long,
                  schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    if (graft.streaming.DirSwap.isManifestRoot(spark, dir)) {
      // one pruned leaf dir per generation holding this version's
      // bucket — the same read-one-bucket contract, manifest-resolved
      val leafs = manifestLeafDirs(spark, dir,
        Some(version / VersionsPerBucket))
      if (leafs.isEmpty) schema match {
        case Some(s) => return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
          .drop("version_bucket")
        case None => throw new IllegalArgumentException(
          s"graft sink: version $version was never delivered under " +
            s"$dir; pass a schema to get an empty result instead")
      }
      return schema.fold(spark.read)(s => spark.read.schema(s))
        .json(leafs: _*)
        .filter(col("change_version") === version)
        .drop("version_bucket")
    }
    val bucketDir = new org.apache.hadoop.fs.Path(
      dir, s"version_bucket=${version / VersionsPerBucket}")
    val fs = bucketDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(bucketDir)) schema match {
      case Some(s) =>
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
          .drop("version_bucket")
      case None => throw new IllegalArgumentException(
        s"graft sink: version $version was never delivered " +
          s"(no ${bucketDir.getName} under $dir); pass a schema to get " +
          "an empty result instead")
    }
    schema.fold(spark.read)(s => spark.read.schema(s)).json(bucketDir.toString)
      .filter(col("change_version") === version)
      .drop("version_bucket") // tolerate callers whose schema includes it
  }

  /** Exactly-once on redelivery: the same (invoice, version) appended
    * twice collapses to one document — last-writer-wins on the stamp.
    * THE single survivor rule: [[compact]] physically materializes this
    * exact DataFrame, so the two can never drift. */
  def deduplicated(spark: SparkSession, dir: String,
                   schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val docs = readBack(spark, dir, schema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("invoice_id"), col("change_version"))
      .orderBy(col("doc_name").desc)
    docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Maintenance compaction: the append-only sink accumulates one file
    * per (poll × bucket) plus redelivered duplicates; a month of polls
    * degrades every read-back. This job rewrites the sink to the
    * [[deduplicated]] survivors — last-writer-wins per (invoice,
    * version) — repartitioned one file per bucket dir, then swaps the
    * directory in. Read-back before and after is IDENTICAL by
    * construction (the survivors keep their doc_name stamps).
    *
    * The swap is rename-based, not atomic: a reader racing the two
    * renames can see a missing directory, and a crash between them
    * leaves the data intact under `<dir>.compact-bak` — every sink
    * reader restores it automatically ([[graft.streaming.DirSwap]]).
    * Run it like the reference runs its retention cleanup: as a
    * scheduled maintenance window, not concurrent with delivery. */
  def compact(spark: SparkSession, dir: String,
              schema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    if (graft.streaming.DirSwap.appendsAreManifest(spark, dir)) {
      // MANIFEST protocol: fold every delivered generation into one —
      // an atomic whole-sink cutover readers can never see half of.
      // keepLedger = false: sink pages carry no content-keyed
      // idempotence contract (read-side dedup is the exactly-once
      // layer), so absorbed page keys just drop. The survivors are
      // derived from the SAME resolution as the absorbed keys
      // (foldSnapshot) — a page landing mid-compaction keeps its own
      // generation, neither folded nor hidden.
      val (dirs, absorbed) =
        graft.streaming.ManifestSwap.foldSnapshot(spark, dir)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val survivors =
        if (dirs.isEmpty) {
          // MIGRATION: an in-place sink under a manifest-mode config —
          // this full-snapshot fold is the documented migration step
          // (appendKeyed's guard points here); the structural read
          // serves the in-place files one last time
          if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) return
          deduplicated(spark, dir, schema)
        } else {
          val leafs = dirs.flatMap { g =>
            (try fs.listStatus(new org.apache.hadoop.fs.Path(g)).toSeq
            catch { case _: java.io.FileNotFoundException => Seq.empty })
              .filter(st => st.isDirectory &&
                st.getPath.getName.startsWith("vb_part="))
              .map(_.getPath.toString)
          }
          if (leafs.isEmpty) return
          val docs = schema.fold(spark.read)(s => spark.read.schema(s))
            .json(leafs: _*).drop("version_bucket")
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("invoice_id"), col("change_version"))
            .orderBy(col("doc_name").desc)
          docs.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1).drop("_rn")
        }
      graft.streaming.ManifestSwap.installFold(spark, dir, "compact",
        absorbed, keepLedger = false) { gen =>
        survivors
          .withColumn("version_bucket",
            expr(s"change_version div $VersionsPerBucket"))
          .repartition(col("version_bucket"))
          .withColumn("vb_part", col("version_bucket"))
          .write.mode("overwrite").partitionBy("vb_part").json(gen)
      }
      return
    }
    val survivors = deduplicated(spark, dir, schema)
    graft.streaming.DirSwap.install(spark, dir, "compact")(tmp =>
      survivors
        .withColumn("version_bucket",
          expr(s"change_version div $VersionsPerBucket"))
        .repartition(col("version_bucket"))
        .write.mode("overwrite").partitionBy("version_bucket").json(tmp))
  }
}
