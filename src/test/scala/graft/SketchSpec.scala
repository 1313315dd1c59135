package graft

import org.apache.spark.sql.functions._

/** Sketch-based aggregates: engine-specific values (rows-only for the
  * oracle), so accuracy is bounded here against the exact answer. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct lands within 5% of the exact entity count") {
    val events = Tables.events(spark, sf)
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = events
      .agg(approx_count_distinct(col("user_id")).as("a")).head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.05, s"approx=$approx exact=$exact err=$err")
    // mergeable partials: the sketch over a union equals running it once
    // (same relative error bound) — the property that makes it one-pass
    // at 100 TB
    val viaUnion = events.limit(300).unionByName(events)
      .agg(approx_count_distinct(col("user_id")).as("a")).head().getLong(0)
    assert(math.abs(viaUnion - exact).toDouble / exact <= 0.05,
      "duplicate rows must not inflate the sketch")
  }
}
