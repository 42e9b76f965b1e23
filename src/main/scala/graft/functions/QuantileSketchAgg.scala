package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch (MRL/GK family, public literature): a
  * weight-stratified sorted summary of at most `k` (value, weight) points.
  * Map tasks fold raw doubles into a bounded buffer, the shuffle moves
  * ≤ k points per partial instead of every row, and merges re-compress —
  * the aggregation shape that makes percentiles tractable at 100 TB when
  * the exact sort-based `percentile` is too expensive and
  * `approx_percentile`'s fixed algorithm doesn't fit (e.g. custom error
  * targets or mergeable offline artifacts).
  *
  * Error contract: one compression moves a point's rank by at most the
  * stratum width W/k; with the buffer flushing pending batches and one
  * final merge per shuffle fan-in, observed rank error stays within a few
  * W/k (property-tested against the exact quantile).
  */
object QuantileSketch {

  /** Compress sorted-by-anything (value, weight) pairs to ≤ k strata:
    * sort by value, split at cumulative-weight boundaries i·W/k, keep each
    * stratum's weight-midpoint value with the stratum's EXACT total weight
    * (total weight is preserved, so ranks stay calibrated).
    */
  def compress(vals: Array[Double], wts: Array[Long], k: Int): (Array[Double], Array[Long]) = {
    val n = vals.length
    if (n <= k) {
      val order = Array.range(0, n).sortBy(vals)
      return (order.map(vals), order.map(wts))
    }
    val order = Array.range(0, n).sortBy(vals)
    val w = wts.map(_.max(0L))
    val total = w.sum
    val outV = new Array[Double](k)
    val outW = new Array[Long](k)
    var out = 0
    var i = 0
    var cum = 0L
    while (out < k && i < n) {
      // stratum ends once cumulative weight reaches (out+1)/k of total
      val bound = math.ceil((out + 1).toDouble * total / k).toLong
      var stratumW = 0L
      val startI = i
      while (i < n && (cum < bound || i == startI)) {
        cum += w(order(i)); stratumW += w(order(i)); i += 1
      }
      // representative: value at the stratum's weight midpoint
      var mid = stratumW / 2
      var j = startI
      while (j < i - 1 && mid >= w(order(j))) { mid -= w(order(j)); j += 1 }
      outV(out) = vals(order(j))
      outW(out) = stratumW
      out += 1
    }
    (outV.take(out), outW.take(out))
  }

  /** Lower weighted order statistic at probability `p`. */
  def quantile(vals: Array[Double], wts: Array[Long], p: Double): Double = {
    if (vals.isEmpty) return Double.NaN
    val total = wts.sum
    val target = math.max(1L, math.ceil(p * total).toLong)
    var cum = 0L
    var i = 0
    while (i < vals.length) {
      cum += wts(i)
      if (cum >= target) return vals(i)
      i += 1
    }
    vals(vals.length - 1)
  }
}

/** Sketch buffer: compressed weighted points + a pending raw batch.
  * Mutable arrays under the Kryo encoder — the object lives on-heap within
  * a partition (ScalaAggregator is a TypedImperativeAggregate) and only
  * serializes for the shuffle.
  */
case class QSketchBuf(var vals: Array[Double], var wts: Array[Long],
                      var pending: Array[Double], var nPending: Int)

/** `udaf(new QuantileSketchAgg(k, probs))`-callable: doubles in, one
  * quantile per requested probability out.
  */
class QuantileSketchAgg(k: Int, probs: Seq[Double])
    extends Aggregator[Double, QSketchBuf, Seq[Double]] {

  private val batch = math.max(k * 4, 1024)

  // pending starts tiny and doubles up to `batch`: under a high-cardinality
  // groupBy most groups hold few rows, and a fixed full-size pending array
  // would cost ~8·batch bytes of heap per live group (and shuffle bytes,
  // since the Aggregator API offers no pre-serialize flush hook)
  override def zero: QSketchBuf =
    QSketchBuf(Array.empty, Array.empty, new Array[Double](64), 0)

  private def flush(b: QSketchBuf): QSketchBuf = {
    if (b.nPending > 0) {
      val pv = b.pending.take(b.nPending)
      val (v, w) = QuantileSketch.compress(
        b.vals ++ pv, b.wts ++ Array.fill(pv.length)(1L), k)
      b.vals = v; b.wts = w; b.nPending = 0
    }
    b
  }

  override def reduce(b: QSketchBuf, x: Double): QSketchBuf = {
    if (b.nPending == b.pending.length) {
      if (b.pending.length < batch)
        b.pending = java.util.Arrays.copyOf(b.pending, b.pending.length * 2)
      else flush(b)
    }
    b.pending(b.nPending) = x
    b.nPending += 1
    b
  }

  override def merge(a: QSketchBuf, b: QSketchBuf): QSketchBuf = {
    flush(a); flush(b)
    val (v, w) = QuantileSketch.compress(a.vals ++ b.vals, a.wts ++ b.wts, k)
    a.vals = v; a.wts = w
    a
  }

  override def finish(b: QSketchBuf): Seq[Double] = {
    flush(b)
    probs.map(p => QuantileSketch.quantile(b.vals, b.wts, p))
  }

  override def bufferEncoder: Encoder[QSketchBuf] = Encoders.kryo[QSketchBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
