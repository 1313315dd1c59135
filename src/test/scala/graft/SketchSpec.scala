package graft

import org.apache.spark.sql.functions._

/** Sketch-based aggregates: accuracy bounded here against the exact
  * answer. Since round 11 `agg_approx_distinct` is a theta sketch —
  * EXACT below its 4096-entry nominal capacity (which is what makes
  * the key oracle-checkable at the verify SFs) and a genuine ~1.6%
  * estimator above it; both regimes are pinned here. */
class SketchSpec extends SparkSpec {

  test("agg_approx_distinct (theta) is exact below nominal capacity " +
      "and within 5% above it") {
    val events = Tables.events(spark, sf)
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf)
      .head().getLong(0)
    // the oracle-checkable regime: every verify SF's user_id
    // cardinality (15 / 150 / 1500) sits below the 4096-entry exact
    // mode, so the estimate must EQUAL count(DISTINCT)
    assert(exact < 4096, s"fixture drifted: $exact >= theta capacity")
    assert(approx == exact,
      s"theta must be exact below capacity: approx=$approx exact=$exact")
    // mergeable partials: the sketch over a union equals running it once
    // — the property that makes it one-pass at 100 TB
    val viaUnion = events.limit(300).unionByName(events)
      .agg(expr("CAST(theta_sketch_estimate(theta_sketch_agg(user_id))" +
        " AS BIGINT)").as("a")).head().getLong(0)
    assert(viaUnion == exact, "duplicate rows must not inflate the sketch")
    // ABOVE capacity the estimate is genuinely approximate — bound it
    // (synthetic 100k-key domain, ~24x the nominal capacity) and pin
    // partition-independence (merge-order invariance) of the estimate
    val big = spark.range(0, 100000).toDF("u")
    val est = big.agg(expr(
      "CAST(theta_sketch_estimate(theta_sketch_agg(u)) AS BIGINT)"))
      .head().getLong(0)
    val err = math.abs(est - 100000L).toDouble / 100000L
    assert(err <= 0.05, s"theta above capacity: est=$est err=$err")
    val est13 = big.repartition(13).agg(expr(
      "CAST(theta_sketch_estimate(theta_sketch_agg(u)) AS BIGINT)"))
      .head().getLong(0)
    val err13 = math.abs(est13 - 100000L).toDouble / 100000L
    assert(err13 <= 0.05, s"theta above capacity (13 parts): est=$est13")
  }
}
