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

  /** THETA sketch table: one theta sketch of `valueCol` per group.
    * Unlike HLL, theta sketches support INTERSECTION and DIFFERENCE —
    * the dedup-planning primitives ("how much of source A is already
    * inside source B?") that a union-only sketch cannot answer. Below
    * the sketch's nominal capacity (2^lgk retained hashes, default
    * 2^12) the estimates are EXACT, which is why the declared overlap
    * query carries a real DuckDB oracle at the verify scales. Size
    * `lgk` like every capacity bound here (the MG top-k note): cover
    * the cardinalities you serve exactly outright, while staying a
    * fixed kilobyte bound the corpus can never push past at 100 TB. */
  def buildTheta(df: DataFrame, groupCol: String,
                 valueCol: String, lgk: Int = 12): DataFrame =
    // one sketch aggregate per group; n_distinct is a post-projection
    // over the finished sketch, not a second aggregate Catalyst has to
    // recognize as a duplicate. The table CARRIES its lgk (a literal
    // column, one int per group row) so downstream set algebra reads
    // the right nominal structurally instead of trusting a caller to
    // re-pass the same value (round-12 review: a defaulted mismatch
    // would silently re-compress exact sketches into estimation mode).
    df.groupBy(col(groupCol))
      .agg(expr(s"theta_sketch_agg($valueCol, $lgk)").as("sketch"))
      .withColumn("n_distinct",
        expr("CAST(theta_sketch_estimate(sketch) AS BIGINT)"))
      .withColumn("__lgk", lit(lgk))

  /** Per-group set DIFFERENCE vs the rest, from the sketch table
    * alone: |A \ ∪(others)| — "how much NET-NEW content does source A
    * hold?", the complement of [[thetaOverlapMatrix]] that completes
    * the dedup-planning set algebra (union via rollup, intersection
    * via the matrix, difference here). Work is S×(S−1) kilobyte
    * unions + S a-not-b's — the raw corpus is never re-joined. Exact
    * below the sketches' nominal capacity (estimates on exact-mode
    * sketches replay set algebra exactly), so the declared query
    * carries a real oracle at the verify scales. A lone group has no
    * rest to subtract: its net-new count is its own distinct count.
    *
    * The union nominal must cover the UNION-of-rest cardinality, not
    * just the per-group ones — the rest-union is the largest sketch in
    * the algebra and is what first crosses into estimation mode
    * (measured at sf0.1: 20 exact 250-hash sketches union to
    * 4750 > 2^12, and the a-not-b estimates drifted ±6% off the exact
    * counts while every per-group n_distinct stayed exact). The lgk is
    * read from the table's own `__lgk` column ([[buildTheta]] stamps
    * it), so the built and union nominals cannot drift apart; a table
    * from an older build without the stamp gets the legacy default. */
  def thetaDifferenceVsRest(thetaTable: DataFrame,
                            groupCol: String): DataFrame = {
    val lgk =
      if (!thetaTable.columns.contains("__lgk")) 12
      else {
        val r = thetaTable.select(max(col("__lgk"))).head()
        if (r.isNullAt(0)) 12 else r.getInt(0) // null = empty table
      }
    val a = thetaTable.select(col(groupCol).as("__g"),
      col("sketch").as("sketch_a"), col("n_distinct").as("n_a"))
    val b = thetaTable.select(col(groupCol).as("__gb"),
      col("sketch").as("sketch_b"))
    val rest = a.select("__g").join(b, col("__g") =!= col("__gb"))
      .groupBy(col("__g"))
      .agg(expr(s"theta_union_agg(sketch_b, $lgk)").as("rest"))
    a.join(rest, Seq("__g"), "left")
      .select(col("__g").as(groupCol),
        col("n_a").as("n_distinct"),
        when(col("rest").isNull, col("n_a"))
          .otherwise(expr("CAST(theta_sketch_estimate(" +
            "theta_difference(sketch_a, rest)) AS BIGINT)"))
          .as("n_only"))
  }

  /** The pairwise overlap matrix from a theta sketch table: for every
    * unordered group pair, the (estimated; exact below capacity)
    * distinct-value overlap. Sketch-sized self-join — the raw corpus
    * is never pairwise-joined, which at 100 TB is the whole point:
    * S sources cost S² kilobyte intersections, not S² corpus scans. */
  def thetaOverlapMatrix(thetaTable: DataFrame,
                         groupCol: String): DataFrame = {
    val a = thetaTable.select(col(groupCol).as("group_a"),
      col("sketch").as("sketch_a"), col("n_distinct").as("n_a"))
    val b = thetaTable.select(col(groupCol).as("group_b"),
      col("sketch").as("sketch_b"), col("n_distinct").as("n_b"))
    a.join(b, col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        expr("CAST(theta_sketch_estimate(" +
          "theta_intersection(sketch_a, sketch_b)) AS BIGINT)")
          .as("n_overlap"))
  }
}
