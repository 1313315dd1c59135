package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver test tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All engine queries take a scale-factor directory and read Parquet from it;
  * at cluster scale these would be catalog tables partitioned/bucketed on
  * their join keys (see ChangeFeed for the CDC layout). Keeping the reads
  * behind one function gives a single place to swap in bucketed tables.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: TIMESTAMP(NANOS) (no Spark type — read nanos as long,
    * floor to micros) and plain TIMESTAMP(MICROS) (arrives as NTZ; the
    * session runs UTC so the cast to TimestampType is value-identical).
    * Normalize both to a micros TimestampType column so every downstream
    * query and DuckDB oracle sees one shape. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** Widen a NARROW input to the session's parallelism before per-row-
    * expensive work (r15 opt; guide §2.5 "input skew: one huge
    * unsplittable file … repartition immediately after the read"). The
    * verify/bench corpora are single-row-group parquet files, so their
    * scans plan ONE partition and everything fused above the first
    * exchange — tokenize, n-gram explode, signature hashing — runs
    * single-threaded (measured 1.5-1.8 s single-task stages under the
    * gram family at sf0.1). The guard keeps it inert at scale: a corpus
    * whose scan already plans >= parallelism partitions passes through
    * untouched, so no 100 TB table is ever re-shuffled for this.
    * Round-robin repartition is deterministic under retries
    * (sortBeforeRepartition, on by default) and every declared query
    * ends in an ORDER BY, so results are partitioning-blind. */
  def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** One SparkSession config for library users: shuffle partitions sized for
    * the local harness; AQE on so skewed joins re-plan at runtime.
    */
  def session(master: String = "local[*]", appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
