package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored row for top-k selection. */
case class Scored(id: Long, score: Long)

/** Typed top-K-by-score Aggregator (SURVEY.md §2.10 candidate: the
  * user-facing Aggregator surface; at scale it keeps k rows per
  * partition and merges k-sized buffers, same asymptotics as
  * TakeOrderedAndProject but composable inside groupBy aggregations —
  * e.g. top-k neighbors per query batch in one pass).
  *
  * Order: score descending, id ascending tiebreak — identical to
  * `ORDER BY score DESC, id LIMIT k`. */
class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: Seq[Scored] = Nil

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    (a +: buf).sorted(ord).take(k)

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(reduction: Seq[Scored]): Seq[Scored] =
    reduction.sorted(ord)

  override def bufferEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}

object TopKAgg {
  /** Column form usable inside any typed aggregation. */
  def topK(k: Int): org.apache.spark.sql.TypedColumn[Scored, Seq[Scored]] =
    new TopKAgg(k).toColumn
}
