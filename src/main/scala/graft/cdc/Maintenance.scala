package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.sinks.DocumentSink
import graft.streaming.DirSwap

/** T6 end-to-end maintenance window — ONE job wiring the pieces that
  * existed separately ([[Retention]], [[DocumentSink.compact]]):
  *
  *  1. expire the change table past the retention watermark (the
  *     reference's CHANGE_RETENTION AUTO_CLEANUP,
  *     setup-invoice-db.sql:70-72),
  *  2. log-compact the surviving prefix — newest FULL row per entity
  *     at or below the compaction bound, tail untouched so in-flight
  *     consumers keep a consistent feed — rewritten version-ordered so
  *     parquet footer stats keep the cdc source's O(1)-files-per-page
  *     pruning,
  *  3. compact the document sink to its deduplicated survivors, one
  *     file per version bucket,
  *  4. optionally retrain + rebuild a serving IVF-PQ vector index
  *     ([[VectorIndex]]) — incremental ingest
  *     ([[graft.llm.Pq.appendIvfPq]]) encodes against a FROZEN
  *     codebook, so a shifting embedding distribution drifts away from
  *     the centroids and degrades ADC ranking (never correctness: the
  *     exact rerank stands); the periodic retrain is this window,
  *  5. optionally compact lexical postings indexes
  *     ([[graft.llm.SimSearch.compactPostingsIndex]]) — each
  *     incremental ingest appends a file set per touched term bucket,
  *     so pruned serving reads grow one file per ingest until this
  *     fold bounds them again.
  *
  * Both rewrites install via the rollback-safe [[DirSwap]], so a crash
  * mid-maintenance leaves the previous generation restorable and every
  * reader self-heals. Rerunnable: a second run is a no-op on rows.
  * File counts after the job are bounded by `nFiles` + bucket count —
  * not by how many polls were ever delivered.
  */
object Maintenance {

  case class Report(changeRows: Long, changeFiles: Long,
                    sinkDocs: Long, sinkFiles: Long)

  /** Newest full row per entity among changes at or below `upTo`;
    * newer changes pass through untouched. Unlike
    * [[Retention.logCompact]] (the key-projection flavor) this keeps
    * every column — the rehydratable form a sink can replay from. One
    * shuffle on the high-cardinality entity key. The window order
    * tiebreaks on the whole remaining row (as a struct) so that even a
    * feed VIOLATING the one-row-per-(entity, version) contract keeps a
    * deterministic survivor instead of one picked by partition layout
    * — the same hardening as [[Scd2.history]]'s operation tiebreaker. */
  def logCompactRows(changes: DataFrame, upTo: Long,
                     entityCol: String = "entity_id",
                     versionCol: String = "change_version"): DataFrame = {
    val payload = changes.columns
      .filterNot(c => c == entityCol || c == versionCol)
    val w = Window.partitionBy(col(entityCol)).orderBy(
      col(versionCol).desc +:
        payload.map(c => col(c).asc_nulls_first): _*)
    changes.filter(col(versionCol) <= upTo)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .unionByName(changes.filter(col(versionCol) > upTo))
  }

  /** The largest change version SAFE to expire given the registered
    * consumers: a consumer committed at cursor v has consumed (…, v]
    * and resumes strictly above it, so only versions ≤ min(committed
    * cursors) are consumed by EVERY consumer. The reference's fixed
    * `CHANGE_RETENTION 3 DAYS` (setup-invoice-db.sql:70-72) silently
    * BREAKS a consumer slower than the window — its next poll resumes
    * over a hole; clamping the expiry watermark here is the safe
    * inverse: an idle consumer pins retention instead of losing data.
    * `maxLagVersions` caps how far one straggler may pin the table
    * (versions below head − maxLag expire anyway — the explicit
    * data-loss trade, not a silent one); no consumers → no clamp.
    * Feed the result to [[run]] / [[maintainChangeTable]] as the
    * `watermark` (min with any time-based bound). */
  def safeWatermark(store: ConsumerStateStore, requested: Long,
                    feedHead: Long,
                    maxLagVersions: Option[Long] = None): Long = {
    val cursors = store.list().map(_.lastSyncVersion)
    val consumerBound = if (cursors.isEmpty) Long.MaxValue else cursors.min
    val lagFloor = maxLagVersions.map(feedHead - _).getOrElse(Long.MinValue)
    math.min(requested, math.max(consumerBound, lagFloor))
  }

  /** Expire + log-compact + version-ordered rewrite of a parquet
    * change table, in place (DirSwap tag "retain"). The table follows
    * the feed schema contract the cdc source also relies on:
    * `entity_id` + `change_version` columns (CdcFiles). */
  /** Append one change page to the table, protocol-aware — the write
    * entry point feed producers use so the retention rewrite below has
    * a sound layout on every store: rename-capable filesystems keep
    * the plain in-place `mode=append` (what every producer did
    * already); manifest-mode filesystems get one immutable generation
    * per page, keyed by the page's content fingerprint, listed by the
    * table's manifest — which also makes a crashed-and-retried page
    * append structurally idempotent, something the plain append never
    * was. Readers (the graft-cdc source, [[maintainChangeTable]])
    * resolve the layout structurally. */
  def appendChangePage(spark: SparkSession, changeDir: String,
                       page: org.apache.spark.sql.DataFrame): Unit =
    if (DirSwap.appendsAreManifest(spark, changeDir))
      graft.streaming.StagedAppend.contentTag(page).foreach { tag =>
        graft.streaming.ManifestSwap.appendKeyed(spark, changeDir,
          "retain", tag)(gen => page.write.mode("overwrite").parquet(gen))
      }
    else page.write.mode("append").parquet(changeDir)

  def maintainChangeTable(spark: SparkSession, changeDir: String,
                          watermark: Long, compactUpTo: Long,
                          nFiles: Int): Unit = {
    // Manifest-capable since round 14: the rewrite folds the base +
    // every appended page generation into ONE new base in one atomic
    // pointer commit (consumers resolve a complete before-or-after
    // snapshot, never a mid-rewrite directory), dropping the absorbed
    // page keys — page tags are content fingerprints whose idempotence
    // window only needs to span producer retries, not retention
    // cycles, and an unbounded ledger would grow the manifest forever.
    val manifest = DirSwap.appendsAreManifest(spark, changeDir)
    // dirs and absorbed keys from ONE resolution (foldSnapshot) so a
    // page committing mid-rewrite keeps its own generation; an
    // in-place table under a manifest config folds into the first
    // manifest base here — the migration step
    val (dirs, absorbed) =
      if (manifest) {
        val (d, a) = graft.streaming.ManifestSwap.foldSnapshot(
          spark, changeDir)
        if (d.nonEmpty) (d, a)
        else (DirSwap.readDataPaths(spark, changeDir, "retain"),
          Set.empty[String])
      } else
        (DirSwap.readDataPaths(spark, changeDir, "retain"),
          Set.empty[String])
    if (dirs.isEmpty) return
    val kept = logCompactRows(
      Retention.expire(spark.read.parquet(dirs: _*), watermark),
      compactUpTo)
    if (manifest)
      graft.streaming.ManifestSwap.installFold(spark, changeDir, "retain",
        absorbed, keepLedger = false)(
        Retention.writeCompacted(kept, _, nFiles))
    else
      DirSwap.install(spark, changeDir, "retain")(tmp =>
        Retention.writeCompacted(kept, tmp, nFiles))
  }

  /** A serving IVF-PQ vector index due for its periodic
    * retrain+rebuild: the embeddings corpus it serves, the layout
    * directory probes read ([[graft.llm.Pq.ivfPqTopK]] — bucket dirs
    * of (id, codes) rows plus the `_codebook` subdir), and the PQ/IVF
    * geometry. Defaults match the declared `llm_simsearch_ivfpq`
    * query's geometry. */
  case class VectorIndex(embDir: String, layoutPath: String,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding",
                         m: Int = 8, dims: Int = 64, ks: Int = 16,
                         planes: Int = 6, iters: Int = 2)

  /** Retrain the PQ codebooks from the CURRENT corpus and rebuild the
    * IVF-PQ layout — codes and codebook written as ONE new generation
    * into the swap tmp dir, installed via the rollback-safe
    * [[DirSwap]] (tag "vecidx"): probes either read the full old
    * generation or the full new one, never a mix of new codes with an
    * old codebook, and the probe path heals a crash window
    * ([[graft.llm.Pq.indexCodebook]] restores before reading). Cost is
    * the training passes (`iters` corpus scans) + one encode pass +
    * the bucket-partitioned write — the same shape as the initial
    * build, budgeted like every other rewrite in this window. */
  def maintainVectorIndex(spark: SparkSession, vi: VectorIndex): Unit = {
    val emb = spark.read.parquet(vi.embDir)
    // [[graft.llm.Pq.appendIvfPq]]'s membership guard documents one
    // blind spot: a re-embedded id whose OLD vector hashes entirely
    // outside the probed buckets is invisible to the append-time check
    // and "surfaces as a duplicate id at the next retrain" — THIS is
    // that retrain, so the promise must be a check, not a comment
    // (round-11 verdict #1). One id-keyed count over the corpus the
    // rebuild is about to re-encode anyway (the retrain already scans
    // it `iters`+1 times); a duplicate would otherwise ride silently
    // into the new layout as two rows under one id with divergent
    // vectors, poisoning every probe that id serves.
    val dupIds = emb.groupBy(col(vi.idCol)).count()
      .filter(col("count") > 1)
      .select(col(vi.idCol)).limit(5).collect().map(_.get(0))
    require(dupIds.isEmpty,
      s"graft maintainVectorIndex: corpus ${vi.embDir} carries " +
        s"duplicate ${vi.idCol} rows (e.g. ${dupIds.mkString(", ")}) — " +
        "a re-embedding was appended past the membership guard's " +
        "probed buckets (appendIvfPq's documented blind spot); " +
        "resolve the corpus to one row per id before retraining")
    // Manifest-capable since round 14: under the manifest protocol the
    // install below writes codes + codebook + _APPGEN into ONE
    // generation and the pointer commit REPLACES the whole payload —
    // dropping every appended-batch key, which IS the superseded-
    // generation sweep the rename protocol does via _APPGEN. Probes
    // resolve the committed base + appends structurally
    // (DirSwap.readDataPaths).
    DirSwap.install(spark, vi.layoutPath, "vecidx") { tmp =>
      val cb = graft.llm.Pq.trainCodebooks(emb, vi.idCol, vi.vecCol,
        vi.m, vi.dims, vi.ks, vi.iters)
      graft.llm.Pq.writeIvfPq(emb, vi.idCol, vi.vecCol, cb,
        vi.m, vi.dims, vi.planes, tmp)
      cb.write.mode("overwrite")
        .parquet(tmp.stripSuffix("/") + "/_codebook")
      // the retrain re-encodes the FULL current corpus, superseding
      // every prior incremental append — mint a fresh append
      // generation (atomic with the layout swap) so staged appends of
      // the old layout are swept, never replayed into this one
      graft.streaming.StagedAppend.mintGeneration(spark, tmp)
    }
  }

  /** A manifest-published table root due for generation GC in this
    * window ([[graft.streaming.ManifestSwap.gc]]) with its PER-TABLE
    * grace. SIZING RULE (round-13 verdict finding #2): the reader
    * guarantee — "a snapshot resolved at time T stays readable until
    * T + graceMs" — only protects scans that FINISH inside the grace,
    * so set `graceMs` strictly above the longest plausible scan of one
    * committed snapshot of THIS table (a 100 TB full-table scan can
    * run hours; the 15-minute default fits serving-sized tables, not
    * that). Superseded generations cost storage until the grace
    * elapses, never correctness — err long. gc logs loudly when it
    * reaps under a sub-default grace. */
  case class ManifestGc(root: String,
                        graceMs: Long =
                          graft.streaming.ManifestSwap.DefaultGraceMs,
                        keepManifests: Int = 2)

  /** A z-ordered layout ([[graft.ops.ZOrder]]) that has accumulated
    * append generations: each [[graft.ops.ZOrder.appendN]] adds a file
    * set and a `_ZSTATS` line per file, so after N ingests the file
    * count (and the driver-side index) is N·files — the rebuild folds
    * it back to `files` and re-tightens edge-clamped envelopes under
    * the current bounds. */
  case class ZLayout(path: String, dims: Seq[graft.ops.ZOrder.Dim],
                     files: Int)

  /** One full maintenance window over a change table + document sink,
    * plus any serving vector indexes due for retrain and z-layouts
    * due for re-clustering. */
  def run(spark: SparkSession, changeDir: String, sinkDir: String,
          watermark: Long, compactUpTo: Long, nFiles: Int,
          sinkSchema: Option[StructType] = None,
          vectorIndexes: Seq[VectorIndex] = Nil,
          zLayouts: Seq[ZLayout] = Nil,
          aggViewRoots: Seq[String] = Nil,
          postingsIndexes: Seq[String] = Nil,
          manifestGcs: Seq[ManifestGc] = Nil): Report = {
    maintainChangeTable(spark, changeDir, watermark, compactUpTo, nFiles)
    DocumentSink.compact(spark, sinkDir, sinkSchema)
    vectorIndexes.foreach(maintainVectorIndex(spark, _))
    zLayouts.foreach(z =>
      graft.ops.ZOrder.rebuild(spark, z.path, z.dims, z.files))
    // lexical postings indexes: fold per-ingest append files back to
    // one per term bucket (serving reads stay pruned AND bounded)
    postingsIndexes.foreach(
      graft.llm.SimSearch.compactPostingsIndex(spark, _))
    // streaming view maintainers: fold their change logs to the
    // checkpoint partition (bounded by the folded generation — see
    // StreamingAggView.compactLog for the torn-tail guarantee)
    aggViewRoots.foreach(
      graft.streaming.StreamingAggView.compactLog(spark, _))
    // manifest-published roots: reap superseded/orphan generations
    // under each table's own grace (see [[ManifestGc]]'s sizing rule)
    manifestGcs.foreach(g => graft.streaming.ManifestSwap.gc(
      spark, g.root, g.keepManifests, g.graceMs))
    // through the Hadoop FileSystem like every other path here — a
    // java.io walk would silently report 0 on hdfs://-style stores
    def filesUnder(dir: String, suffix: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext)
        if (it.next().getPath.getName.endsWith(suffix)) n += 1
      n
    }
    // report over the SERVED layout: the in-place root, or the
    // committed manifest generations (counting a manifest root's whole
    // tree would double-count superseded generations until gc)
    val changeDirs = DirSwap.readDataPaths(spark, changeDir, "retain")
    val sinkDirs = DirSwap.readDataPaths(spark, sinkDir, "compact")
    Report(
      changeRows = spark.read.parquet(changeDirs: _*).count(),
      changeFiles = changeDirs.map(filesUnder(_, ".parquet")).sum,
      sinkDocs = DocumentSink.readBack(spark, sinkDir, sinkSchema).count(),
      sinkFiles = sinkDirs.map(filesUnder(_, ".json")).sum)
  }
}
