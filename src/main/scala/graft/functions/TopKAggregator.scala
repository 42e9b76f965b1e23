package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate (custom-UDAF surface, SURVEY §2.7): keeps the k
  * highest-scoring (id, score) pairs, ties broken by smaller id.
  *
  * Scale rationale: `row_number() OVER (PARTITION BY q ORDER BY score)`
  * shuffles EVERY scored candidate row to its query's reducer before
  * truncating to k. This Aggregator is algebraic — each map task reduces
  * its partition to ≤ k pairs, the shuffle moves only those partial
  * top-k buffers, and merge is a k-way truncating sort. At |corpus| ≫ k
  * the shuffle shrinks from O(|corpus|·|queries|) rows to
  * O(parts·k·|queries|).
  *
  * The buffer over-allocates to 4k before compacting so the per-row path
  * is an append, not a sort.
  */
class TopKAggregator(k: Int)
    extends Aggregator[TopKAggregator.In, Seq[(Long, Double)], Seq[(Long, Double)]] {
  import TopKAggregator.In

  private def compact(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
    s.sortBy { case (id, score) => (-score, id) }.take(k)

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(b: Seq[(Long, Double)], a: In): Seq[(Long, Double)] = {
    val nb = b :+ (a.id, a.score)
    if (nb.length >= 4 * k) compact(nb) else nb
  }

  override def merge(x: Seq[(Long, Double)], y: Seq[(Long, Double)]): Seq[(Long, Double)] =
    compact(x ++ y)

  override def finish(b: Seq[(Long, Double)]): Seq[(Long, Double)] = compact(b)

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}

object TopKAggregator {
  case class In(id: Long, score: Double)

  /** Column-API handle: `topK(5)(col("vec_id"), col("score"))` yields an
    * array<struct<id,score>> per group, best-first.
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k), Encoders.product[In])
}
