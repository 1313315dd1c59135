package graft

import org.apache.spark.sql.SparkSession

/** Second-JVM half of the CorpusCache cross-process race spec
  * (CorpusCacheSpec): resolve the given (src, tag) key with a SLOW
  * two-step build — the payload is written incomplete, held for
  * `buildMs`, then completed with the marker last — and print the
  * payload actually served. The parent JVM races the same key
  * mid-build; the publish protocol must hand BOTH processes one
  * complete artifact, never the torn intermediate. */
object CorpusCacheRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(src, tag, buildMsS) = args.take(3)
    val buildMs = buildMsS.toLong
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ccrace-child")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stamp = s"child-${ProcessHandle.current().pid()}"
    val dir = graft.llm.CorpusCache.resolve(spark, src, "graft-ccrace",
        tag, Seq("_DONE")) { d =>
      d.mkdirs()
      val p = new java.io.File(d, "payload").toPath
      java.nio.file.Files.writeString(p, s"GEN $stamp START\n")
      Thread.sleep(buildMs)
      java.nio.file.Files.writeString(p,
        s"GEN $stamp START\n${"x" * 4096}\nGEN $stamp END")
      graft.llm.CorpusCache.touchMarker(d, "_DONE")
    }
    val served = java.nio.file.Files.readString(
      new java.io.File(dir, "payload").toPath)
    // single parse-safe line for the parent; newlines stripped
    println("CCRACE_SERVED=" + served.replace("\n", "\\n"))
    spark.stop()
  }
}
