package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters summary (public streaming-algorithms
  * literature: Misra & Gries 1982; mergeability per Agarwal et al.,
  * PODS'12): at most `capacity` counters, each increment either bumps a
  * tracked key, claims a free slot, or decrements EVERY counter (paying
  * one unit of every tracked key's estimate).
  *
  * Guarantee: for a stream of n items, any key with true count
  * > n / (capacity + 1) is STILL TRACKED at the end, with
  * estimate ∈ [true − n/(capacity+1), true]. Merging two summaries (sum
  * counts, then subtract the (capacity+1)-th largest value and drop ≤ 0)
  * preserves the bound over the combined stream — so partial aggregation
  * is safe in any tree shape, which is exactly what Spark's
  * partial/final UDAF plan does.
  *
  * Scale rationale: exact `groupBy(token).count()` over 100 TB shuffles
  * every distinct token. The MG pass shuffles ≤ `capacity` counters per
  * map task — constant state — and [[MisraGries.exactHeavyHitters]]
  * turns the candidate superset into an EXACT answer with one more
  * narrow pass (semi-join on the broadcast candidate set + count of
  * only those keys).
  */
class MisraGriesAgg(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], key: String): Map[String, Long] =
    b.get(key) match {
      case Some(c) => b.updated(key, c + 1)
      case None if b.size < capacity => b.updated(key, 1L)
      case None =>
        // decrement-all, drop zeros (amortized: each decrement pays for
        // capacity prior increments)
        b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= capacity) sum
    else {
      // subtract the (capacity+1)-th largest count from everything
      val vals = sum.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1)
      sum.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {

  /** `mg(capacity)(col)` → map<string,long> of tracked keys per group. */
  def mg(capacity: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGriesAgg(capacity), Encoders.STRING)

  /** One MG-summary pass: tracked-key map (≤ capacity entries) plus the
    * total item count n, computed together so n costs no extra scan.
    * NOTE this runs a Spark ACTION — callers of [[exactHeavyHitters]]
    * execute jobs at DataFrame-CONSTRUCTION time (the candidate set must
    * exist before the second pass can be planned).
    */
  private def summaryPass(keyed: DataFrame, capacity: Int): (Map[String, Long], Long) = {
    import keyed.sparkSession.implicits._
    val row = keyed
      .agg(mg(capacity)($"key").as("summary"), count(lit(1)).as("n"))
      .head()
    (row.getMap[String, Long](0).toMap, row.getLong(1))
  }

  /** EXACT heavy hitters (every key with count ≥ `minFreq`, with exact
    * counts) in two bounded passes:
    *
    *  1. MG summary with `capacity` counters — bounded state per task,
    *     shuffle moves ≤ capacity entries per partition. The tracked keys
    *     are a SUPERSET of every key with count > n/(capacity+1).
    *  2. Exact count of ONLY the candidate keys (broadcast semi filter →
    *     hash agg over a vocabulary of ≤ capacity) and a `>= minFreq`
    *     filter, discarding MG's estimate error entirely.
    *
    * The result is therefore exact and deterministic — independent of row
    * order, partitioning, and merge shape — PROVIDED the superset
    * guarantee covers the threshold; `require(n/(capacity+1) < minFreq)`
    * fails loudly when it wouldn't (choose a larger capacity, or use the
    * capacity-free overload which derives one), rather than silently
    * under-reporting.
    *
    * Pass 1 runs EAGERLY (construction-time Spark job); the returned
    * DataFrame re-evaluates the upstream pipeline once more when pass 2
    * executes. That recompute is deliberate at scale: the second pass is
    * a map-only INSET filter + hash agg over a ≤ capacity vocabulary
    * (plan-pinned in PlanSpec), which re-scans cheaper than caching a
    * 100 TB token stream to disk would cost. Callers with an expensive
    * derived input at SMALL scale can persist it before calling.
    */
  def exactHeavyHitters(df: DataFrame, keyCol: Column, minFreq: Long,
                        capacity: Int): DataFrame = {
    val keyed = keyedOf(df, keyCol)
    val (summary, n) = summaryPass(keyed, capacity)
    require(n / (capacity + 1L) < minFreq,
      s"capacity $capacity cannot guarantee recall at minFreq=$minFreq for n=$n " +
        s"(error bound ${n / (capacity + 1L)}); increase capacity")
    exactCountCandidates(keyed, summary.keys.toSeq, minFreq)
  }

  /** Scale-adaptive [[exactHeavyHitters]]: derives a capacity that
    * satisfies the recall guarantee from the observed n instead of taking
    * a fixed one, so the same call works at any scale factor.
    *
    * Pass 1 runs with `initialCapacity`, UNPERSISTED — n is only known
    * after pass 1, so caching never helps it, and at the 100 TB design
    * point materializing the tokenized corpus is exactly the cost the
    * two-pass design exists to avoid. Only if the observed n makes that
    * capacity's error bound reach `minFreq` (i.e. recall is no longer
    * guaranteed) is the summary recomputed once with
    * `capacity = n/minFreq + 1` — the smallest bound that restores the
    * guarantee. The escalated pass recomputes lineage rather than caching:
    * a persist placed here would be populated by the very action it is
    * meant to serve and read by nothing after it, pure overhead — and the
    * class-level stance is recompute-over-cache anyway. The exact second
    * pass also recomputes, as documented on the fixed-capacity overload.
    */
  def exactHeavyHitters(df: DataFrame, keyCol: Column, minFreq: Long): DataFrame = {
    require(minFreq > 0, s"minFreq must be positive, got $minFreq")
    val initialCapacity = 8192
    val keyed = keyedOf(df, keyCol)
    val (summary, n) = summaryPass(keyed, initialCapacity)
    val candidates =
      if (n / (initialCapacity + 1L) < minFreq) summary.keys.toSeq
      else {
        val derived = n / minFreq + 1L
        // 2^26 maps ≈ a GiB of counter state per task — past that the
        // premise "heavy hitters are few" no longer holds and an exact
        // groupBy is the honest plan; refuse loudly instead.
        require(derived <= (1L << 26),
          s"derived capacity $derived (n=$n, minFreq=$minFreq) exceeds bounded-state " +
            "budget; minFreq is too small a fraction of n for a summary-based plan")
        summaryPass(keyed, derived.toInt)._1.keys.toSeq
      }
    exactCountCandidates(keyed, candidates, minFreq)
  }

  private def keyedOf(df: DataFrame, keyCol: Column): DataFrame = {
    import df.sparkSession.implicits._
    df.select(keyCol.cast("string").as("key")).filter($"key".isNotNull)
  }

  private def exactCountCandidates(keyed: DataFrame, candidates: Seq[String],
                                   minFreq: Long): DataFrame = {
    import keyed.sparkSession.implicits._
    if (candidates.isEmpty) // empty input: isin() takes no zero-arg form
      return keyed.groupBy("key").agg(count(lit(1)).as("n")).filter(lit(false))
    keyed.filter($"key".isin(candidates: _*))
      .groupBy("key").agg(count(lit(1)).as("n"))
      .filter($"n" >= minFreq)
  }
}
