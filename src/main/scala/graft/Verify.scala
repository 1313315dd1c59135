package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: restrict to these query names (dev loop)
    val only = args.drop(2).toSet
    // Verification instrumentation ON: the approximate-artifact
    // exports (kNN edges, index-picked candidate/pool ids, BPE merge
    // pairs, CMS term positions) that the DuckDB oracles replay are
    // produced ONLY under this property — Bench and production
    // callers run the pure serving plans (round-8 verdict #1).
    System.setProperty("graft.oracle.export", "1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the invariance axis the closing gate diffs (BenchProbe's env
      // convention): dumps must be byte-identical AQE on vs off
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a restricted run writes a SUBSET manifest; into an outDir holding
    // other queries' results it would silently shrink the next oracle
    // check to the subset — refuse, point at a fresh dir
    if (only.nonEmpty) {
      val foreign = Option(new java.io.File(outDir).list())
        .getOrElse(Array.empty[String])
        .filter(n => n != "oracle_sql.json" && !only(n))
      require(foreign.isEmpty,
        s"restricted run into $outDir which already holds results for " +
          s"${foreign.take(3).mkString(", ")}… — use a fresh outDir")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
