package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-aggregatable distinct-count serving: a SKETCH TABLE of one HLL
  * binary (Apache DataSketches, Spark's `hll_sketch_agg` family) per
  * fine-grained group, built in one pass over the raw data.
  *
  * The 100 TB point: every later rollup — any coarsening of the group
  * key, any time-range union — is an aggregation over SKETCH-SIZED rows
  * (`hll_union_agg` then estimate), never a re-scan of the raw corpus.
  * `count(DISTINCT x) GROUP BY coarser` on raw data re-shuffles the
  * full key space per question asked; the sketch table answers all of
  * them from kilobytes per group. Exact row counts ride along and stay
  * exact under rollup (plain sums). */
object SketchTable {

  /** One pass over `df`: per-`fineCols` group, an HLL sketch of
    * `valueCol` plus the exact row count. */
  def build(df: DataFrame, fineCols: Seq[String],
            valueCol: String): DataFrame =
    df.groupBy(fineCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Rollup WITHOUT touching raw data: union the sketches down to
    * `keepCols`, estimate distincts, sum the exact row counts. */
  def rollup(sketchTable: DataFrame, keepCols: Seq[String]): DataFrame =
    sketchTable.groupBy(keepCols.map(col): _*)
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sketch")))
          .as("approx_distinct"),
        sum(col("n_rows")).as("n_rows"))
}
