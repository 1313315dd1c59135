package graft
import java.nio.file.{Files, Paths}

/** Scratch plan dumper for the optimization rounds: writes
  * `plans/r16/<query>_<tag>.txt` with `.explain("formatted")` output at
  * the bench SF. Usage:
  *   sbt "runMain graft.ExplainDump before q1 q2 ..." */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val tag = args.head
    val names = args.tail
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get("plans/r16"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val capped = plan.linesIterator.map { l =>
        if (l.length > 500) l.take(500) + s"…(+${l.length - 500} chars)" else l
      }.mkString("\n")
      Files.writeString(Paths.get(s"plans/r16/${name}_$tag.txt"), capped)
      println(s"wrote plans/r16/${name}_$tag.txt")
    }
    spark.stop()
  }
}
