package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed state-table layout — the 100 TB shape for the CDC
  * rehydration join (SURVEY.md §4: "state rehydration join (J2) is the
  * scale point").
  *
  * The reference keeps current state in SQL Server rowstore keyed by
  * InvoiceId (setup-invoice-db.sql:26-33); every poll joins the
  * changefeed page back to it (storedprocedure.sql:55). At 100 TB the
  * equivalent Spark anti-pattern is a shuffle of the state table per
  * join. Bucketing both state tables on the join key at write time
  * makes the join co-located: Spark reads matching buckets
  * side-by-side and sort-merge-joins them with NO Exchange in the
  * plan — the shuffle is paid once at layout time, amortized over
  * every subsequent query. Combined with the bounded-page broadcast
  * in InvoiceCdc.pageQuery, no steady-state CDC query ever shuffles
  * state.
  */
object StateLayout {

  /** Persist a DataFrame as a bucketed (+ sorted, for merge-join
    * locality) catalog table. Bucket count is a layout-time choice:
    * at 100 TB target ~128 MB per bucket file per partition. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Bucket-aligned inner join of two bucketed tables on their bucket
    * key: both sides scan co-located buckets, no shuffle exchange. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, leftKey: String,
                    rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey), "inner")
  }

  /** Number of shuffle exchanges the executed plan performs — the cost
    * bucketing is meant to eliminate. Forces execution first so AQE
    * finalizes, then walks through adaptive plan/query-stage boundaries
    * (stages are leaf nodes a plain collect won't enter). */
  def countShuffles(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // finalize AQE by executing the plan WITHOUT collecting rows to the
    // driver (executeCollect on a large join would OOM the driver; an
    // RDD count runs the same stages and discards the rows)
    df.queryExecution.executedPlan.execute().count()
    def scan(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
      case s: QueryStageExec => scan(s.plan)
      case e: ShuffleExchangeLike => 1 + e.children.map(scan).sum
      case other => other.children.map(scan).sum
    }
    scan(df.queryExecution.executedPlan)
  }

  /** True if executing the plan performs any shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean = countShuffles(df) > 0
}
