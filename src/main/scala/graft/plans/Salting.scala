package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §4 / the 100 TB mandate:
  * "Skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handles joins automatically; aggregations over a
  * power-law key (one customer with 10⁹ events) still funnel each key
  * through one reducer. Two-phase salted aggregation splits a hot key
  * across `saltBuckets` reducers, partially aggregates, then collapses
  * the partials — turning a single straggler task into `saltBuckets`
  * even ones at the cost of one extra (tiny, pre-aggregated) shuffle.
  */
object Salting {

  /** Two-phase salted sum/count aggregation: groupBy (key, salt) →
    * partial aggregates → groupBy key → final. Result is identical to
    * the direct groupBy (addition is associative; counts sum). */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
                     saltBuckets: Int = 16): DataFrame = {
    // the salt is purely per-row (the key contributes nothing to
    // spreading its own rows) — a row-id modulus spreads a hot key's
    // rows round-robin across buckets with no hash evaluation
    val salt: Column = pmod(monotonically_increasing_id(), lit(saltBuckets.toLong))
    df.withColumn("_salt", salt)
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("value_sum"))
  }
}
