package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min buffer: `depth` rows of `width` counters plus the exact
  * item total. Mutable arrays — `reduce` touches ONE counter per row
  * in place (an immutable buffer would copy depth×width longs per
  * input row); Spark only serializes the buffer at partial-aggregate
  * boundaries. */
case class CmsBuf(var n: Long, rows: Array[Array[Long]])

/** Finished sketch (immutable view of the same counters). Merging two
  * sketches is element-wise addition — exact, associative, commutative
  * — so a sketch-table rollup's estimates EQUAL the estimates of a
  * sketch built directly over the union (CmsSpec pins this). */
case class CmsSketch(n: Long, rows: Seq[Seq[Long]])

/** Mergeable COUNT-MIN sketch (Cormode–Muthukrishnan '05) — the
  * point-frequency member of the sketch-table family
  * ([[graft.ops.SketchTable]] HLL = distinct counts, theta = set
  * algebra, [[QuantileSketch]] = ranks, [[HeavyHitters]] = top
  * frequencies): "how often does item X occur in this group?" answered
  * from depth×width longs per group, never a re-scan of the raw data.
  *
  * Each of the `depth` rows hashes the item with an independent seed
  * (splitmix64 finalizer over the pre-hashed 64-bit item) and
  * increments one of `width` counters; the estimate for an item is the
  * MINIMUM of its `depth` counters. Guarantees, both deterministic
  * given the data: est ≥ true (counters only ever add), and
  * est ≤ true + row collisions — in expectation n/width per row,
  * min-ed over `depth` independent rows. Where [[HeavyHitters]]
  * answers "what are the top terms" with an exact recount, the CMS
  * answers point queries for ARBITRARY items — including items never
  * seen at build time — from the sketch alone.
  *
  * Input is the item's 64-bit hash (produce it with `xxhash64` at the
  * scan so engine-side hashing stays codegen); the sketch is
  * hash-domain — a 100 TB sketch table never stores strings. */
class CountMinAgg(depth: Int, width: Int)
  extends Aggregator[Long, CmsBuf, CmsSketch] {
  require(depth >= 1 && width >= 2, s"degenerate CMS: $depth x $width")

  override def zero: CmsBuf =
    CmsBuf(0L, Array.fill(depth)(new Array[Long](width)))

  override def reduce(b: CmsBuf, h: Long): CmsBuf = {
    var i = 0
    while (i < depth) {
      b.rows(i)(CountMinSketch.index(h, i, width)) += 1L
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
    var i = 0
    while (i < depth) {
      val ra = a.rows(i); val rb = b.rows(i)
      var j = 0
      while (j < width) { ra(j) += rb(j); j += 1 }
      i += 1
    }
    a.n += b.n
    a
  }

  override def finish(b: CmsBuf): CmsSketch =
    CmsSketch(b.n, b.rows.toSeq.map(_.toVector))

  override def bufferEncoder: Encoder[CmsBuf] =
    ExpressionEncoder[CmsBuf]()
  override def outputEncoder: Encoder[CmsSketch] =
    ExpressionEncoder[CmsSketch]()
}

object CountMinSketch {

  /** The DataFrame aggregate: `agg(d, w)(hashCol)` → CmsSketch struct. */
  def agg(depth: Int, width: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new CountMinAgg(depth, width))

  /** splitmix64 finalizer — the row hash family: mixes the pre-hashed
    * item with a per-row increment. Plain JVM long arithmetic wraps
    * (this runs inside the Aggregator / on the driver, never in ANSI
    * column math, where the overflow would raise). */
  private[functions] def mix(x0: Long, row: Int): Long = {
    var x = x0 + (row + 1) * 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Counter index of item-hash `h` in `row`. */
  def index(h: Long, row: Int, width: Int): Int =
    java.lang.Math.floorMod(mix(h, row), width)

  /** Driver-side point estimate from a finished sketch. */
  def estimate(s: CmsSketch, h: Long): Long =
    s.rows.zipWithIndex.map { case (row, i) =>
      row(index(h, i, row.size))
    }.min

  /** Column-level point estimate for a DRIVER-KNOWN item hash: the
    * `depth` counter positions are literal indices (element_at is
    * 1-based), so the lookup is pure column math over the sketch
    * struct — no UDF, no re-hashing in (ANSI) column arithmetic. */
  def estimateCol(sketch: Column, h: Long, depth: Int,
                  width: Int): Column = {
    import org.apache.spark.sql.functions._
    val counters = (0 until depth).map { i =>
      element_at(element_at(sketch.getField("rows"), i + 1),
        index(h, i, width) + 1)
    }
    least(counters: _*)
  }
}
