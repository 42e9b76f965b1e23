package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-shaped operators beyond Spark's built-ins. */
object JoinOps {

  /** Salted equi-join — the skew remedy when one join key carries a
    * disproportionate share of rows and AQE's skew-join split isn't
    * available (e.g. bucketed-table joins, or a deliberately pinned
    * partitioning). Each LEFT row gets a deterministic salt in
    * [0, buckets) derived from `salterCols` (use a high-cardinality
    * column, e.g. the row's unique id); the RIGHT side is replicated once
    * per bucket. The shuffle then keys on (key, salt) — a hot key's rows
    * spread over `buckets` reducers instead of one. Row-identical to the
    * plain inner equi-join (spec-verified): every left row meets exactly
    * the one right replica carrying its salt.
    *
    * Cost model: right side grows ×buckets — use when |hot key's rows| ≫
    * |right| · buckets, the usual fact⋈dim skew shape.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 buckets: Int, salterCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(buckets > 0)
    val l = left.withColumn("__salt", pmod(hash(salterCols: _*), lit(buckets)))
    val r = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit(_)): _*)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** As-of join: for each left row, the payload of the LATEST right row
    * with `right.tsCol <= left.tsCol` in the same key group (inclusive,
    * time-series "most recent fact" semantics — DuckDB/kdb ASOF JOIN).
    *
    * Spark-first plan (preference (a) of the extension ladder — composed
    * from built-ins, no custom physical operator): tag both sides, union
    * them (`unionByName` fills the missing columns with null), ONE shuffle
    * partitioned by key and sorted by (ts, side) so each right row
    * precedes left rows of the same timestamp, then a running
    * `last(payload, ignoreNulls)` carries the newest right payload forward
    * to every left row. Never materializes a pair join: cost is
    * O(|L|+|R|) rows through one hash partitioning — survives 100× where
    * a range-join + per-key window over candidate pairs would not.
    *
    * Right rows must be unique per (key, ts) for determinism — pre-dedup
    * with a tiebreak if needed. Left rows with no prior right row get a
    * null payload (drop them for inner-ASOF semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               payloadCols: Seq[String]): DataFrame = {
    val payloadT = struct(payloadCols.map(col): _*)
    // drop right rows whose timestamp casts to null: nulls sort FIRST in
    // the window, so their payload would otherwise be carried to left rows
    // until a real right row appears — matching events to a null-time fact
    val r = right.select(col(rightKey).as("__k"), col(rightTs).cast("timestamp").as("__t"),
      payloadT.as("__asof"), lit(0).as("__side"))
      .filter(col("__t").isNotNull)
    val l = left.withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTs).cast("timestamp"))
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__carried", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__asof", "__k", "__t", "__side")
      .withColumnRenamed("__carried", "asof")
  }

  /** Interval-overlap join WITHOUT an equi key, made shuffle-joinable by
    * temporal binning. A bare `aStart <= bEnd AND bStart <= aEnd` predicate
    * gives Catalyst nothing to hash on, so it plans a broadcast/cartesian
    * nested-loop — quadratic and undistributable. Instead each interval
    * explodes over the fixed-width bins it covers, the join runs as a HASH
    * join on the bin id, and the exact overlap predicate filters residually.
    * Each overlapping pair is emitted exactly once — only from the FIRST
    * bin the two intervals share (`bin == max(floor(aStart/w),
    * floor(bStart/w))`), which both sides are guaranteed to cover — so no
    * distinct/dedup shuffle is needed.
    *
    * Start/end columns must be NON-NEGATIVE integers (e.g. epoch micros) —
    * `div` truncates toward zero, which only equals the required floor on
    * non-negatives — closed intervals, `start <= end`. `binWidth` trades fan-out (long intervals
    * explode over end−start / width bins) against join selectivity (wide
    * bins put non-overlapping pairs in the same bucket for the residual
    * filter to kill); set it near the typical interval length. Column names
    * must be disjoint across the two inputs.
    */
  def intervalJoin(left: DataFrame, lStart: String, lEnd: String,
                   right: DataFrame, rStart: String, rEnd: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, start: String, end: String) =
      df.withColumn("__bin",
        explode(sequence(expr(s"$start div ${binWidth}L"), expr(s"$end div ${binWidth}L"))))
    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd)
    l.join(r,
        l("__bin") === r("__bin") &&
          col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
          l("__bin") === greatest(expr(s"$lStart div ${binWidth}L"),
            expr(s"$rStart div ${binWidth}L")))
      .drop("__bin")
  }
}
