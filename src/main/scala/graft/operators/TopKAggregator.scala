package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation surface (SURVEY.md §7.3: `Aggregator[IN,BUF,OUT]`
  * is the engine's UDAF story — the reference has no aggregation surface at
  * all beyond the running reduce). Keeps the k largest values per group;
  * the buffer is a bounded sorted list, so partial aggregation (map-side
  * combine) works and the shuffle carries at most k doubles per group. */
final class TopKAggregator(k: Int)
    extends Aggregator[Double, List[Double], Seq[Double]] {

  override def zero: List[Double] = Nil

  override def reduce(b: List[Double], a: Double): List[Double] =
    insert(b, a)

  override def merge(b1: List[Double], b2: List[Double]): List[Double] =
    b2.foldLeft(b1)(insert)

  private def insert(b: List[Double], a: Double): List[Double] = {
    val nb = (a :: b).sortBy(-_)
    if (nb.length > k) nb.take(k) else nb
  }

  override def finish(b: List[Double]): Seq[Double] = b.sortBy(-_)

  override def bufferEncoder: Encoder[List[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
