package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media payload. */
case class MediaMeta(format: String, width: Int, height: Int,
                     durationMs: Long)

/** A multimodal record: media payload as an opaque binary column plus typed
  * metadata — the 100 TB-scale shape for image/audio/video corpora
  * (payload bytes stay columnar/compressed in Parquet; metadata is
  * filterable without touching the bytes). */
case class MediaRecord(mediaId: Long, kind: String,
                       payload: Array[Byte], meta: MediaMeta)

/** Extracted per-media features (decode output). */
case class MediaFeatures(mediaId: Long, kind: String, nBytes: Int,
                         byteSum: Long, frameCount: Int,
                         thumbnail: Array[Byte])

/** [NORTH-STAR] N5 — multimodal column handling (BASELINE.json mandate).
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB; everything Spark-side — schema,
  * binary columns, partitioning, batch iteration shape, feature
  * extraction plumbing — is real and tested. In production the stub body
  * is replaced by the actual codec call; the operator shape (mapPartitions
  * over a typed Dataset, one codec init per partition, streaming
  * iterator, never materializing a partition in memory) is exactly what
  * a real decoder needs.
  */
object Multimodal {
  import org.apache.spark.sql.Encoders

  /** Build a deterministic synthetic media corpus from the documents
    * table: payload = utf-8 bytes of the text (a stand-in blob), kind
    * cycled by id, metadata derived from n_chars. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("mediaId"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        lit("raw").as("format"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 10L).as("durationMs")).as("meta"))
      .as[MediaRecord]
  }

  /** ======== STUB ========
    * Deterministic fake decode: real codecs (JPEG/PNG/ffmpeg) are not in
    * this container. Replace the body with the codec call in production;
    * the signature (bytes in, features out) and the partition-level
    * plumbing around it are the real contract. */
  private[llm] def decodeStub(payload: Array[Byte]): (Long, Array[Byte]) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    (sum, payload.take(8)) // (checksum-ish feature, fake thumbnail)
  }

  /** Decode / feature-extract over the binary column. mapPartitions so a
    * real implementation initializes its codec once per partition and
    * streams records through it — the batch shape Pandas-UDF decode uses
    * in the Python flavor of this engine. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      // real impl: val codec = Codec.open() — once per partition
      it.map { m =>
        val (sum, thumb) = decodeStub(m.payload)
        val frames =
          if (m.kind == "video") (m.meta.durationMs / 40L).toInt // 25 fps STUB
          else 1
        MediaFeatures(m.mediaId, m.kind, m.payload.length, sum, frames, thumb)
      }
    }
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size
    * chunk of the payload plays a frame (STUB chunking; real impl seeks
    * keyframes). One output row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 4,
                   frameBytes: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, idx) => (m.mediaId, idx, chunk) }
    }.toDF("media_id", "frame_idx", "frame_payload")
  }

  /** Resize = thumbnail the payload to `maxBytes` (STUB: truncate; real
    * impl: scale the decoded image). Demonstrates binary-out transforms. */
  def resize(media: Dataset[MediaRecord], maxBytes: Int): DataFrame =
    media.toDF().select(col("mediaId").as("media_id"), col("kind"),
      expr(s"substring(payload, 1, $maxBytes)").as("payload_small"),
      col("meta"))

  /** [NORTH-STAR] Binary-file ingestion — the layout every image/audio
    * corpus starts in: one payload per file on a shared store, ingested
    * with Spark's `binaryFile` source into (path, modificationTime,
    * length, content) rows with the payload as an opaque binary column.
    * The media id rides in the directory name (the hive-ish `doc_id=N/`
    * layout), and the digest/feature step runs straight over the bytes
    * — no driver-side file handling anywhere.
    *
    * Here the payload files are STAGED from the documents table (one
    * text payload per file — the container has no image assets), which
    * is what makes the read-back DuckDB-oracle-checkable: byte length
    * and md5 of each file must equal the same expressions over the
    * source text (+1 for the writer's newline). Scale: binaryFile packs
    * small files into FilePartitions by `maxPartitionBytes`, so task
    * count follows volume, not file count; `pathGlobFilter` prunes
    * non-payload files at the file index, and metadata-only predicates
    * (path, length) never touch the bytes. */
  def binaryIngest(spark: SparkSession, docs: DataFrame,
                   scratchDir: String, maxId: Long = 64L): DataFrame = {
    docs.filter(col("doc_id") < maxId)
      .select(col("doc_id"), col("text").as("value"))
      .repartition(8, col("doc_id"))
      .write.mode("overwrite").partitionBy("doc_id").text(scratchDir)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.txt")
      .option("recursiveFileLookup", "true")
      .load(scratchDir)
      .select(
        regexp_extract(col("path"), "doc_id=(\\d+)", 1).cast("long")
          .as("media_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("digest"))
      .withColumn("kind", element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("media_id") % 3 + 1).cast("int")))
      .select(col("media_id"), col("kind"), col("n_bytes"), col("digest"))
      .orderBy("media_id")
  }
}
