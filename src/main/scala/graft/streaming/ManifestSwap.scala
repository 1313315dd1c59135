package graft.streaming

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Object-store-safe publish protocol: immutable generation directories
  * plus one atomic single-file pointer commit — the twin of [[DirSwap]]
  * for filesystems whose directory "rename" is a non-atomic copy+delete
  * emulation (s3a/gs/abfs/...), where the two-rename swap is unsound
  * (round-12 verdict ask #1). The industry-standard shape (the
  * Delta-log / Iceberg-snapshot commit, re-derived here over the plain
  * Hadoop FileSystem API):
  *
  *  - data is only ever WRITTEN to a fresh, never-reused generation
  *    directory `<path>/_gens/g-<uuid>/` — no reader can observe it
  *    until the pointer lands, so there is no torn window at all;
  *  - the current snapshot is named by the HIGHEST numbered manifest
  *    file `<path>/_ptr/<%020d>.mf`, whose payload maps logical keys
  *    to generation-relative data dirs (the single-dir twin stores one
  *    key, [[ManifestSwap.DataKey]]; the materialized view stores one
  *    key per bucket — a whole refresh page cuts over in ONE commit,
  *    which the per-bucket DirSwap could never do);
  *  - a commit is a CREATE-IF-ABSENT of the next manifest number:
  *    write-tmp + [[DirSwap.renameNoReplace]] where rename is atomic
  *    (local/HDFS — the testable branch), a single conditional object
  *    PUT (`FileSystem.create(overwrite = false)`, the
  *    If-None-Match/ifGenerationMatch=0 mapping) on object stores,
  *    where object visibility is atomic by store contract. Losing the
  *    race means another writer committed that number first: re-read,
  *    re-merge, retry — the CAS loop in [[commitUpdate]].
  *
  * Crash behavior, window by window: before the generation write —
  * nothing visible; after it but before the pointer — an ORPHAN
  * generation no reader ever resolves ([[gc]] reaps it after a grace
  * age); after the pointer — fully committed, superseded generations
  * linger until [[gc]]. Readers therefore need NO heal step (the
  * [[DirSwap.restoreIfTorn]] twin is a no-op here); their only
  * obligation is to resolve the pointer before reading and to treat
  * the resolved generation as immutable.
  *
  * GC safety: [[gc]] guarantees a resolved snapshot stays readable for
  * at least `graceMs` after the resolve — the grace is measured from
  * SUPERSESSION (via manifest mtimes), not from generation creation;
  * see [[gc]] for the rule, the proof, and the live-race find that
  * forced it. Pick graceMs above the longest plausible scan;
  * superseded data costs storage, never correctness. */
private[graft] object ManifestSwap {

  /** The single logical key used by the [[DirSwap]]-twin API, where a
    * snapshot is one whole data directory. */
  val DataKey = "data"

  /** Test-only failpoint, the [[DirSwap.failpoint]] convention: when
    * set to (tag, window), [[install]]/[[commitUpdate]] for a matching
    * tag throws at that window — "afterGenWrite" (generation staged,
    * pointer untouched: the orphan window), "beforeCommit" (between
    * resolving the next number and the atomic create: the CAS window),
    * "afterCommit" (pointer landed, superseded generations not yet
    * GC'd). */
  @volatile private[graft] var failpoint: Option[(String, String)] = None
  /** Test-only non-throwing window hook (the [[DirSwap.windowAction]]
    * convention): runs `body` at the window, one-shot, for landing a
    * concurrent reader/writer INSIDE the commit window. */
  @volatile private[graft] var windowAction
      : Option[(String, String, () => Unit)] = None
  private def trip(tag: String, window: String): Unit = {
    windowAction match {
      case Some((t, w, body)) if t == tag && w == window =>
        windowAction = None
        body()
      case _ => ()
    }
    if (failpoint.contains((tag, window)))
      throw new RuntimeException(s"graft manifest failpoint: $tag@$window")
  }

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // "_gens", not "_gen": a StreamingAggView generation carries its own
  // `_gen` MARKER FILE inside the data dir — same protocol family,
  // different level; distinct names keep a directory listing readable
  private def ptrDir(path: String) = new Path(path.stripSuffix("/"), "_ptr")
  private def genRoot(path: String) = new Path(path.stripSuffix("/"), "_gens")
  private val PtrName = """(\d{20})\.mf""".r

  /** Fresh, never-reused generation name. */
  private def newGenName(): String =
    "g-" + java.util.UUID.randomUUID().toString

  // ---------------------------------------------------------- resolve --

  /** The highest committed (manifestNumber, payload), or None before
    * the first commit. The pointer file is complete by construction on
    * every branch (rename publishes whole files; an object PUT is
    * all-or-nothing), so the read never sees a torn payload. A pointer
    * created between our listing and our read is fine — we return a
    * slightly stale but fully-committed snapshot, exactly the reader
    * contract. */
  private[graft] def resolveRaw(spark: SparkSession, path: String)
      : Option[(Long, Map[String, String])] = {
    val fs = fsOf(spark, path)
    val pd = ptrDir(path)
    if (!fs.exists(pd)) return None
    val committed = fs.listStatus(pd).flatMap { st =>
      st.getPath.getName match {
        case PtrName(n) => Some((n.toLong, st.getPath))
        case _          => None
      }
    }
    if (committed.isEmpty) None
    else {
      val (n, p) = committed.maxBy(_._1)
      Some((n, parsePayload(readFully(fs, p))))
    }
  }

  private def readFully(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var r = in.read(buf)
      while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Payload wire format: one `key<TAB>generation-relative-dir` line
    * per entry. Keys here are dir-name-safe tokens (`data`,
    * `bucket=N`); a format this small has no parse ambiguity to get
    * wrong across engines or versions. */
  private def renderPayload(entries: Map[String, String]): String =
    entries.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        require(!k.contains("\t") && !k.contains("\n") &&
          !v.contains("\t") && !v.contains("\n"),
          s"manifest entry not wire-safe: $k -> $v")
        s"$k\t$v"
      }
      .mkString("", "\n", "\n")

  private def parsePayload(s: String): Map[String, String] =
    s.split("\n").iterator.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      require(i > 0, s"torn manifest line: '$line'")
      (line.substring(0, i), line.substring(i + 1))
    }.toMap

  /** Absolute data path for a manifest entry value. */
  private[graft] def entryPath(path: String, rel: String): String =
    new Path(genRoot(path), rel).toString

  /** Mint a fresh generation: (name for manifest entries, absolute
    * path to write data under). Never reused, invisible until some
    * manifest references it. */
  private[graft] def newGeneration(path: String): (String, String) = {
    val g = newGenName()
    (g, entryPath(path, g))
  }

  // ----------------------------------------------------------- commit --

  /** Atomically create manifest number `n` with `payload`; false if
    * that number is already taken (another writer won the CAS). Two
    * branches, one invariant — the manifest file appears COMPLETE or
    * not at all: where rename is atomic (local/HDFS) the payload is
    * staged to a tmp name and renamed-no-replace in; on object stores
    * (where DirSwap-style rename is unsound, which is this protocol's
    * reason to exist) `create(overwrite = false)` maps to the store's
    * conditional PUT and object visibility is atomic. */
  private def commitPtr(fs: FileSystem, path: String, n: Long,
                        payload: String): Boolean = {
    val pd = ptrDir(path)
    fs.mkdirs(pd)
    val dst = new Path(pd, f"$n%020d.mf")
    val bytes = payload.getBytes(StandardCharsets.UTF_8)
    fs match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
           _: org.apache.hadoop.fs.RawLocalFileSystem =>
        val tmp = new Path(pd,
          s".tmp-${java.util.UUID.randomUUID().toString}")
        val out = fs.create(tmp, true)
        try { out.write(bytes) } finally out.close()
        val won = DirSwap.renameNoReplace(fs, tmp, dst)
        if (!won) fs.delete(tmp, false)
        won
      case _ =>
        try {
          val out = fs.create(dst, false)
          try { out.write(bytes) } finally out.close()
          true
        } catch { case _: java.io.IOException => false }
    }
  }

  /** Read-modify-write CAS loop over the manifest map: stage nothing,
    * just re-merge `update` over the freshest payload until a commit
    * wins. The caller has already written its generation data — losing
    * a round costs one re-list + one tiny file write, never a data
    * rewrite. Returns the committed map. */
  private[graft] def commitUpdate(spark: SparkSession, path: String,
      tag: String)(update: Map[String, String] => Map[String, String])
      : Map[String, String] = {
    val fs = fsOf(spark, path)
    var attempts = 0
    while (attempts < 32) {
      val cur = resolveRaw(spark, path)
      val next = cur.map(_._1 + 1).getOrElse(0L)
      val merged = update(cur.map(_._2).getOrElse(Map.empty))
      trip(tag, "beforeCommit")
      if (commitPtr(fs, path, next, renderPayload(merged))) {
        trip(tag, "afterCommit")
        return merged
      }
      attempts += 1
    }
    throw new java.io.IOException(
      s"graft manifest: commit CAS lost 32 rounds at $path — " +
        "a writer storm this sustained means a misconfigured fleet " +
        "(many maintainers on one table), not contention to absorb")
  }

  // ------------------------------------------------ DirSwap-twin API --

  /** Write one immutable generation via `write(genDir)` and commit it
    * as the whole snapshot — the [[DirSwap.install]] twin. Concurrent
    * installs converge exactly as DirSwap's did: last committed pointer
    * wins, and every committed pointer names a COMPLETE generation. */
  def install(spark: SparkSession, path: String, tag: String = "merge")
             (write: String => Unit): Unit = {
    val gen = newGenName()
    write(entryPath(path, gen))
    trip(tag, "afterGenWrite")
    commitUpdate(spark, path, tag)(_ => Map(DataKey -> gen))
    ()
  }

  /** Absolute path of the current committed snapshot's data dir (the
    * single-key layout), or None before the first install. */
  def readPath(spark: SparkSession, path: String): Option[String] =
    resolveRaw(spark, path).flatMap(_._2.get(DataKey))
      .map(entryPath(path, _))

  /** The [[DirSwap.readOrEmpty]] twin. */
  def readOrEmpty(spark: SparkSession, path: String,
                  schema: StructType): DataFrame =
    readPath(spark, path) match {
      case Some(p) => spark.read.schema(schema).parquet(p)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  // --------------------------------------------------------------- gc --

  /** Reap superseded/orphan generations and old manifests.
    *
    * READER GUARANTEE: a snapshot resolved at time T stays fully
    * readable until AT LEAST T + graceMs. The grace is therefore
    * measured from SUPERSESSION, not creation — the first live
    * cross-process race cell (HealRaceSpec phase 9) caught the
    * creation-age draft being unsound: a generation that had been
    * CURRENT for minutes was reapable the instant two commits
    * superseded it, and a reader that resolved it a moment before
    * lost its files mid-scan. The sound rule (the Iceberg
    * expire-snapshots shape): find `mStar`, the newest manifest
    * already older than graceMs — it was the maximum at the grace
    * horizon, so every manifest numbered ≥ mStar was the maximum at
    * some instant within the last graceMs and may be held by a live
    * reader. Protect the generations of all of those, plus the newest
    * `keepManifests` unconditionally. Proof of the guarantee: a
    * reader that resolved manifest n at T saw n as max, so every
    * n' > n has mtime > T; gc deletes n's generations only once some
    * n' > n has mtime ≤ now − graceMs, hence now ≥ T + graceMs.
    *
    * Never-committed ORPHANS (crashed writers) have no supersession
    * event; they keep the creation-age rule — older than graceMs by
    * dir mtime — which also protects an in-flight writer's staged
    * generation. Manifest FILES below both the keep window and mStar
    * are dropped (a resolve holds the payload in memory, so deleting
    * a superseded manifest file never strands a reader mid-scan).
    * Returns generation directories deleted. */
  def gc(spark: SparkSession, path: String, keepManifests: Int = 2,
         graceMs: Long = 15 * 60 * 1000L): Int = {
    require(keepManifests >= 1, "gc must keep at least the current manifest")
    val fs = fsOf(spark, path)
    val pd = ptrDir(path)
    val gr = genRoot(path)
    if (!fs.exists(pd) || !fs.exists(gr)) return 0
    val manifests = fs.listStatus(pd).flatMap { st =>
      st.getPath.getName match {
        case PtrName(n) => Some((n.toLong, st))
        case _          => None
      }
    }.sortBy(-_._1)
    if (manifests.isEmpty) return 0
    val now = System.currentTimeMillis()
    // newest manifest older than the grace: the max at the horizon.
    // None ⇒ every manifest is young ⇒ protect them all
    val mStar: Option[Long] = manifests
      .find { case (_, st) => now - st.getModificationTime >= graceMs }
      .map(_._1)
    val protectedM = manifests.filter { case (n, _) =>
      mStar.forall(n >= _)
    } ++ manifests.take(keepManifests)
    val live: Set[String] = protectedM.flatMap { case (_, st) =>
      parsePayload(readFully(fs, st.getPath)).values
        // an entry may point INSIDE a generation (g-x/bucket_part=3):
        // liveness is by generation dir, the unit gc deletes
        .map(_.split("/")(0))
    }.toSet
    var deleted = 0
    fs.listStatus(gr).foreach { st =>
      val name = st.getPath.getName
      if (!live.contains(name) &&
          now - st.getModificationTime >= graceMs) {
        fs.delete(st.getPath, true)
        deleted += 1
      }
    }
    val protectedNs = protectedM.map(_._1).toSet
    manifests.foreach { case (n, st) =>
      if (!protectedNs.contains(n)) fs.delete(st.getPath, false)
    }
    deleted
  }
}
