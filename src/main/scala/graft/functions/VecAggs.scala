package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Element-wise mean of a vector column as a mergeable bounded-state
  * aggregate: the buffer is one (sum-vector, count) pair per group, so a
  * grouped mean over 100 TB of embeddings shuffles ≤ groups × partitions
  * dim-length buffers — vs. the posexplode alternative whose shuffle
  * carries every (row, dimension) element as its own record (a dim×
  * blowup of the corpus).
  *
  * Double accumulation order follows Spark's partial/final merge tree, the
  * same contract as the built-in `avg` — deterministic per plan, not
  * bitwise-stable across repartitionings (callers needing bit-exact
  * cross-engine results use the exact-decimal-moments pattern instead).
  */
class VecMeanAgg extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    if (v == null) return b
    // An empty sum array is the "uninitialized" sentinel; a zero-length
    // INPUT vector would alias it (incrementing n while a later non-empty
    // vector silently re-seeds sum → mean divided by an inflated count).
    // Ragged inputs fail loudly below, so zero-length must too.
    require(v.nonEmpty, "zero-length vector in vec_mean")
    val (sum, n) = b
    if (sum.isEmpty) (v.toArray, n + 1)
    else {
      require(sum.length == v.length,
        s"ragged vectors in vec_mean: ${sum.length} vs ${v.length}")
      var i = 0
      while (i < sum.length) { sum(i) += v(i); i += 1 }
      (sum, n + 1)
    }
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._2 == 0L) y
    else if (y._2 == 0L) x
    else {
      require(x._1.length == y._1.length,
        s"ragged vectors in vec_mean merge: ${x._1.length} vs ${y._1.length}")
      val sum = x._1
      var i = 0
      while (i < sum.length) { sum(i) += y._1(i); i += 1 }
      (sum, x._2 + y._2)
    }
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] =
    if (b._2 == 0L) Seq.empty else b._1.map(_ / b._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object VecAggs {
  /** `vec_mean(arrayCol)` → array<double> element-wise mean per group. */
  def vecMean: UserDefinedFunction =
    udaf(new VecMeanAgg, ExpressionEncoder[Seq[Double]]())
}
