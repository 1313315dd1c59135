package graft

/** Mirrors the driver's t1 smoke: run SparkEntry.entry, expect rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = 60)
    println(s"ENTRY_ROWS=$n")
    spark.stop()
  }
}
