package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series completion operators: per-key calendar spines and gap
  * filling — the "make the panel dense" step before training windowed
  * models or computing trailing features.
  *
  * Scale design: the spine is `keys × sequence(start, end)` built with
  * `explode(sequence(...))` — a narrow generate per key, NO cross join
  * through the optimizer that could degenerate to BNLJ. The fill is one
  * keyed shuffle + window; cost is O(|keys| · days + |facts|).
  */
object TimeOps {

  /** Dense per-key daily spine: one row per (key, day in [start, end]).
    * `keys` must be distinct one-column rows.
    */
  def dailySpine(keys: DataFrame, keyCol: String,
                 start: String, end: String): DataFrame =
    keys.select(col(keyCol),
      explode(sequence(
        lit(start).cast("date"), lit(end).cast("date"),
        expr("INTERVAL 1 DAY"))).as("day"))

  /** Gap-fill a sparse per-(key, day) measure onto the dense spine with a
    * RUNNING SUM (cumulative-to-date): days with no fact carry the last
    * cumulative value forward. Null before the first fact.
    *
    * `facts` must be pre-aggregated to one row per (key, day) — the
    * caller chooses the per-day combine (sum/last/max); running-sum
    * semantics make the fill order-insensitive and engine-deterministic.
    */
  def gapFillCumulative(spine: DataFrame, facts: DataFrame,
                        keyCol: String, dayCol: String,
                        valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(facts, Seq(keyCol, dayCol), "left")
      .withColumn("cum", sum(col(valueCol)).over(w))
      .drop(valueCol)
  }

  /** Trailing-window aggregate over a RANGE frame on day numbers: for each
    * (key, day) with at least one fact, the sum of `valueCol` over the
    * last `days` days (inclusive). Pre-aggregate facts per (key, day)
    * first for deterministic frames.
    */
  def trailingRangeSum(keyCol: String, dayCol: String,
                       valueCol: String, days: Int): Column = {
    val w = Window.partitionBy(keyCol)
      .orderBy(datediff(col(dayCol), lit("1970-01-01").cast("date")))
      .rangeBetween(-(days - 1).toLong, 0L)
    sum(col(valueCol)).over(w)
  }
}
