package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One weighted item of a quantile summary: `w` original values
  * collapsed onto representative `v`. */
case class QItem(v: Long, w: Long)

/** Aggregation buffer: KLL-style level buffers — an item at level h
  * weighs 2^h — plus the exact count and the CERTIFIED worst-case rank
  * error the compactions so far may have introduced. */
case class QSketchBuf(n: Long, err: Long, levels: Seq[Seq[Long]])

/** Finished summary: weighted items sorted by value, exact `n`, and
  * the certified rank-error bound `err` (0 = the summary is exact). */
case class QSummary(n: Long, err: Long, items: Seq[QItem])

/** Mergeable quantile sketch — the rank sibling of the HLL sketch
  * table ([[graft.ops.SketchTable]]): bounded-size per-group summaries
  * that re-aggregate to any coarser grouping without touching raw data.
  *
  * The structure is the KLL compactor hierarchy (Karnin–Lang–Liberty,
  * FOCS'16) with DETERMINISTIC compaction: when a level holds 2k
  * items, sort and promote the odd-indexed half to the next level
  * (weight doubles). Randomized KLL gets a tighter ε for the same k;
  * the deterministic variant trades that for bit-reproducibility at a
  * bound this sketch CARRIES rather than assumes: one compaction at
  * level h displaces any rank by at most 2^h, so the summary's `err`
  * field — incremented by 2^h per compaction, summed across merges —
  * certifies |estimated_rank(v) − true_rank(v)| ≤ err for every query.
  * Below the compaction threshold (every buffer level under 2k) the
  * sketch stores the exact multiset, err = 0, and rank queries are
  * EXACT — which is why the declared rollup query carries a real
  * DuckDB oracle at the verify scales while the spec certifies the
  * bound in the forced-compaction regime.
  *
  * Merging concatenates level buffers and re-compacts: associative up
  * to the certified bound, so Spark's partial aggregation is safe in
  * any order.
  *
  * Relation to the built-ins: Spark 4.1 ships DataSketches KLL
  * (`kll_sketch_agg_bigint` / `kll_sketch_merge_*` /
  * `kll_sketch_get_quantile_*`) with RANDOMIZED compaction — a tighter
  * ε at the same k, the right default for approximate-only serving.
  * This variant exists for what those cannot give: bit-reproducible
  * output (an engine-hashable oracle), a bound CARRIED in the summary
  * rather than stated in a paper, and err = 0 as a machine-checkable
  * exactness certificate.
  */
class QuantileSketchAgg(k: Int)
  extends Aggregator[Long, QSketchBuf, QSummary] {
  require(k >= 8, s"k too small for a meaningful summary: $k")

  override def zero: QSketchBuf = QSketchBuf(0L, 0L, Seq(Vector.empty))

  override def reduce(b: QSketchBuf, v: Long): QSketchBuf = {
    val l0 = b.levels.head :+ v
    QuantileSketch.compacted(k,
      QSketchBuf(b.n + 1, b.err, l0 +: b.levels.tail))
  }

  override def merge(a: QSketchBuf, b: QSketchBuf): QSketchBuf = {
    val depth = math.max(a.levels.length, b.levels.length)
    val ls = (0 until depth).map { h =>
      a.levels.applyOrElse(h, (_: Int) => Seq.empty[Long]) ++
        b.levels.applyOrElse(h, (_: Int) => Seq.empty[Long])
    }
    QuantileSketch.compacted(k, QSketchBuf(a.n + b.n, a.err + b.err, ls))
  }

  override def finish(b: QSketchBuf): QSummary = {
    val items = b.levels.zipWithIndex.flatMap { case (vs, h) =>
      vs.map(v => QItem(v, 1L << h))
    }.sortBy(i => (i.v, i.w))
    QSummary(b.n, b.err, items)
  }

  override def bufferEncoder: Encoder[QSketchBuf] =
    ExpressionEncoder[QSketchBuf]()
  override def outputEncoder: Encoder[QSummary] =
    ExpressionEncoder[QSummary]()
}

object QuantileSketch {

  /** The DataFrame aggregate: `agg(k)(col)` → QSummary struct. */
  def agg(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new QuantileSketchAgg(k))

  /** Cascade compactions until every level is below 2k; each
    * compaction at level h adds 2^h to the certified error bound. */
  private[functions] def compacted(k: Int, b: QSketchBuf): QSketchBuf = {
    if (b.levels.forall(_.size < 2 * k)) return b
    val ls = scala.collection.mutable.ArrayBuffer(
      b.levels.map(_.toVector): _*)
    var err = b.err
    var h = 0
    while (h < ls.length) {
      if (ls(h).size >= 2 * k) {
        val sorted = ls(h).sorted
        // an odd-sized level (merge() concatenates arbitrary partial
        // sizes) leaves its smallest item BEHIND at this level —
        // dropping it would lose 2^h of total weight and void both
        // the weight-conservation invariant and the certified bound
        val leftover = if (sorted.size % 2 == 1) 1 else 0
        val even = sorted.drop(leftover)
        val keep = even.indices.collect {
          case i if i % 2 == 1 => even(i)
        }.toVector
        ls(h) = sorted.take(leftover)
        if (h + 1 >= ls.length) ls += Vector.empty
        ls(h + 1) = ls(h + 1) ++ keep
        err += (1L << h)
        // the promotion can overflow level h+1; re-check from there
      } else h += 1
    }
    QSketchBuf(b.n, err, ls.toSeq)
  }

  /** Driver-side rank walk for specs: the first value whose cumulative
    * weight reaches `target` in value order; −1 on an empty summary
    * (the same not-found sentinel as [[quantileCol]]). */
  def rankValue(items: Seq[QItem], target: Long): Long = {
    var cum = 0L
    val it = items.iterator
    while (it.hasNext) {
      val x = it.next()
      cum += x.w
      if (cum >= target) return x.v
    }
    if (items.isEmpty) -1L else items.last.v
  }

  /** Column-level rank walk over a SORTED `array<struct<v,w>>` items
    * column: the value at quantile `q` of `nCol` items — the same
    * "first value whose cumulative weight reaches ceil(q·n)" walk as
    * [[rankValue]], as a codegen'd higher-order aggregate (no UDF).
    * Requires non-negative values (−1 is the not-found sentinel). */
  def quantileCol(items: Column, nCol: Column, q: Double): Column = {
    val target = ceil(lit(q) * nCol).cast("long")
    aggregate(items,
      struct(lit(0L).as("cum"), lit(-1L).as("ans")),
      (acc, x) => {
        val cum = acc.getField("cum") + x.getField("w")
        struct(cum.as("cum"),
          when(acc.getField("ans") =!= -1L, acc.getField("ans"))
            .otherwise(when(cum >= target, x.getField("v"))
              .otherwise(lit(-1L))).as("ans"))
      },
      acc => acc.getField("ans"))
  }
}
