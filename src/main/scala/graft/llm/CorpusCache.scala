package graft.llm

import org.apache.spark.sql.SparkSession

/** Corpus-identity cache for derived index artifacts (IVF layouts,
  * PQ code tables + codebooks, LSH band indexes): each artifact is a
  * pure function of (source file identity, geometry tag), so the
  * declared queries build it ONCE and every later run serves from the
  * persisted copy — the bench then measures the steady-state serving
  * path, with the one-time build paid only on a cache miss (fresh
  * corpus, changed geometry, or a wiped tmp dir).
  *
  * The key is an MD5 over the source's (uri, length, mtime) plus the
  * caller's version/geometry tag, so a regenerated corpus or a
  * geometry change mints a FRESH directory instead of silently serving
  * a stale one. Validity = ALL `markers` present (parquet `_SUCCESS`
  * plus any caller sentinels written last): a crash mid-build leaves
  * one missing and the next run rebuilds into the same key.
  *
  * In a deployment the same layout lives on the warehouse store next
  * to its corpus; java.io.tmpdir stands in for it on the single-node
  * harness (the verify recipe wipes `/tmp/graft-*` before cold-path
  * timings for exactly this reason).
  */
object CorpusCache {

  /** Resolve the cache dir for (`srcPath`, `tag`), invoking `build` on
    * a miss. `prefix` names the artifact family (`graft-ivf`,
    * `graft-pq`, ...); `markers` are file names inside the dir whose
    * joint existence marks a completed build — `build` must write
    * every one of them, sentinels last. */
  def resolve(spark: SparkSession, srcPath: String, prefix: String,
              tag: String, markers: Seq[String])
             (build: java.io.File => Unit): java.io.File = {
    require(markers.nonEmpty, "need at least one completion marker")
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val st = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(src)
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${src.toUri}|${st.getLen}|${st.getModificationTime}|$tag"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val dir = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"$prefix-$key")
    if (!markers.forall(mk => new java.io.File(dir, mk).exists()))
      build(dir)
    dir
  }

  /** Write an empty sentinel file `name` inside `dir` — the completion
    * marker a `build` writes LAST. */
  def touchMarker(dir: java.io.File, name: String): Unit =
    java.nio.file.Files.write(new java.io.File(dir, name).toPath,
      Array.emptyByteArray)
}
