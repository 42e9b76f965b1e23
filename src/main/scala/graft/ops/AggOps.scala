package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a keyed aggregate table up to
  * date by merging per-batch partial states instead of re-scanning history
  * — the only viable shape once history is 100 TB and a batch is a few GB.
  *
  * Works for the algebraic aggregates (count/sum/min/max — combine is the
  * same op over states; avg derives as sum/count at read time). The
  * reference recomputes nothing (append-only `ON CONFLICT DO NOTHING`),
  * so this is north-star surface; `q_incr_agg` proves merge-of-partials
  * equals the from-scratch aggregate hash-exactly.
  */
object AggOps {

  /** One batch's partial state: `(keys, one column per spec)`.
    * Spec = (output column, op ∈ count|sum|min|max, input column).
    */
  def partialState(df: DataFrame, keys: Seq[String],
                   specs: Seq[(String, String, Column)]): DataFrame = {
    val aggs = specs.map { case (name, op, c) => opFor(op, c).as(name) }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of partial states into one — combine is count→sum,
    * sum→sum, min→min, max→max; keys absent from a batch simply don't
    * contribute. Associative and commutative, so states can merge in any
    * order, pairwise or all at once (here: one union + one keyed agg).
    */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String],
                  specs: Seq[(String, String, Column)]): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    val combined = specs.map { case (name, op, _) =>
      val combineOp = if (op == "count") "sum" else op
      opFor(combineOp, col(name)).as(name)
    }
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*).agg(combined.head, combined.tail: _*)
  }

  /** Skew-proof two-phase aggregation: partial-aggregate on
    * (keys, deterministic salt) so a hot key's rows spread over `buckets`
    * reducers, then combine the salted partials with the same algebraic
    * merge as [[mergeStates]]. Row-identical to the plain aggregate (specs
    * + oracle); the win is that no single reducer ever sees a whole hot
    * key. Spark's partial/final HashAggregate already handles MODERATE
    * skew (map-side combine); this is the remedy when one key's
    * post-combine partials still swamp a reducer.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
                      specs: Seq[(String, String, Column)],
                      buckets: Int = 32): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // deterministic salt (hash of all columns' bytes via xxhash64 of the
    // row struct) — stable across retries, no Random in a task
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(buckets)))
    val partial = partialState(salted, keys :+ "__salt", specs)
    mergeStates(Seq(partial), keys, specs)
  }

  /** Incremental DISTINCT counting — the aggregate [[partialState]] can't
    * cover (count-distinct is not algebraic: two batches' distinct counts
    * don't add). Per-batch state is a keyed HLL++ sketch (Spark's
    * datasketches `hll_sketch_agg`, a few KB per key); states merge by
    * register-max (`hll_union_agg`), which is EXACT over the sketch
    * lattice — merge-of-batch-sketches is bit-identical to the
    * from-scratch sketch of the union, any grouping, any order (spec-
    * pinned), so the estimate never drifts as batches accumulate. The
    * estimate itself carries standard HLL error (~2 % at default lgK);
    * that is the 100 TB trade: a 100-batch history re-scan becomes a
    * few-KB-per-key sketch merge.
    */
  def distinctState(df: DataFrame, keys: Seq[String], name: String,
                    input: Column): DataFrame =
    df.groupBy(keys.map(col): _*).agg(hll_sketch_agg(input).as(name))

  /** Merge any number of [[distinctState]] outputs (same keys/name). */
  def mergeDistinctStates(states: Seq[DataFrame], keys: Seq[String],
                          name: String): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*).agg(hll_union_agg(col(name)).as(name))
  }

  /** Read a sketch state as an approximate distinct count. */
  def distinctEstimate(state: Column): Column = hll_sketch_estimate(state)

  private def opFor(op: String, c: Column): Column = op match {
    case "count" => count(c)
    case "sum"   => sum(c)
    case "min"   => min(c)
    case "max"   => max(c)
    case other   => throw new IllegalArgumentException(
      s"non-algebraic op '$other' — only count/sum/min/max merge by state")
  }
}
