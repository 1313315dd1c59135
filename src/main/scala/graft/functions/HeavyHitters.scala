package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters sketch (the mergeable formulation of
  * Agarwal et al., "Mergeable Summaries", PODS'12): a bounded map of at
  * most `capacity` counters per aggregation buffer.
  *
  * Guarantees: every term with true frequency > n/(capacity+1) is
  * present in the final sketch, and each kept counter underestimates by
  * at most n/(capacity+1). Merging two sketches preserves the bound
  * (subtract the (capacity+1)-th largest combined counter from all,
  * drop non-positives) — so partial aggregation is safe in any order.
  *
  * Amortized O(1) per element: a decrement event costs O(capacity) but
  * removes `capacity` total count, so across n inputs the decrement
  * work is O(n). */
class MisraGries(capacity: Int)
  extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], term: String)
      : Map[String, Long] =
    buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1)
      case None if buf.size < capacity => buf.updated(term, 1L)
      case None => buf.collect {
        case (t, c) if c > 1 => t -> (c - 1)
      }
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long])
      : Map[String, Long] = {
    val sum = b1 ++ b2.map { case (t, c) => t -> (b1.getOrElse(t, 0L) + c) }
    if (sum.size <= capacity) sum
    else {
      val cut = sum.values.toIndexedSeq
        .sorted(Ordering[Long].reverse)(capacity)
      sum.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  override def finish(reduction: Map[String, Long]): Map[String, Long] =
    reduction

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

/** EXACT top-k frequent terms with bounded memory — the 100 TB shape
  * for "most common tokens/n-grams in the corpus". A plain
  * `groupBy(term).count().orderBy` shuffles the ENTIRE vocabulary
  * (billions of distinct terms at corpus scale); here the vocabulary
  * never shuffles:
  *
  *  1. sketch pass — each partition folds its terms into a
  *     `capacity`-sized Misra–Gries map; only sketch-sized partials
  *     move, and the merged candidate set (≤ capacity ids) comes back
  *     to the driver, like any sketch aggregate;
  *  2. recount pass — ONLY the candidates are exact-counted (the
  *     filter is a scan-time `isin` over the candidate literals; the
  *     aggregate's key space is ≤ capacity, so its shuffle is
  *     sketch-sized too), then top-k.
  *
  * Exactness condition (MG guarantee): the true k-th frequency exceeds
  * n/(capacity+1) — then every true top-k term is in the candidate
  * set and the recount makes the result exact, oracle-checkable
  * against brute force. The condition is CHECKED, not assumed: on a
  * vocabulary too flat for the sketch to certify (k-th recounted
  * frequency at or below n/(capacity+1), or fewer than k candidates),
  * the query falls back to the full vocabulary aggregate — correct
  * over fast, the same trade as an AQE re-plan — instead of silently
  * returning a wrong "exact" top-k. Guard cost: one column-pruned
  * row count always; the ≤k-row recount materializes early only when
  * the sketch actually decremented (an under-capacity corpus — sketch
  * mass equals n — certifies without it). */
object HeavyHitters {

  def topTerms(terms: DataFrame, termCol: String, k: Int,
               capacity: Int = 4096): DataFrame = {
    val spark = terms.sparkSession
    import spark.implicits._
    val sketch = terms
      .select(col(termCol).cast("string").as("value")).as[String]
      .select(new MisraGries(capacity).toColumn).head()
    val candidates = sketch.keys.toSeq
    val recount = terms
      .filter(col(termCol).isInCollection(candidates))
      .groupBy(col(termCol).as("term"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term"))
      .limit(k)
    val n = terms.count()
    // no decrement ever happened ⇔ the sketch kept every occurrence —
    // the candidate set IS the vocabulary, exact with no further check
    val certified = sketch.values.sum == n || {
      val top = recount.collect() // ≤ k rows
      top.length == k && top.last.getLong(1) * (capacity + 1L) > n
    }
    if (certified) recount
    else terms // flat vocabulary: the sketch cannot certify its top-k
      .groupBy(col(termCol).as("term"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term"))
      .limit(k)
  }
}
