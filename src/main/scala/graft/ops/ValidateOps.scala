package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint validation — the engine form of the reference's
  * required-column / required-value guards (`scripts/extract.py:118-122`,
  * `scripts/import_csv.py:37-41` abort when key columns are missing;
  * `scripts/transform.py:101-103` silently drops rows with blank keys).
  * Instead of scattering those checks through the pipeline, declare them
  * once and evaluate ALL row-level predicates in a single scan+aggregate
  * pass (one job, no shuffle beyond the final 1-row combine); uniqueness
  * constraints need their own keyed aggregation each.
  *
  * Output: one row per constraint — (check, total, violations, passed) —
  * cheap enough to gate every load on.
  */
object ValidateOps {

  /** Evaluate row-predicate constraints in one aggregate pass. A row
    * violates a check when the predicate is FALSE OR NULL — null-hostile on
    * purpose: "l_quantity > 0" should flag a null quantity, not skip it.
    */
  def checkRows(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    val total = count(lit(1)).as("total")
    val sums = checks.map { case (name, pred) =>
      sum(when(pred, 0L).otherwise(1L)).as(s"__v_$name")
    }
    val agg = df.agg(total, sums: _*)
    val perCheck = checks.map { case (name, _) =>
      struct(lit(name).as("check"), col("total"),
        col(s"__v_$name").as("violations"))
    }
    agg.select(explode(array(perCheck: _*)).as("c"))
      .select(col("c.check"), col("c.total"), col("c.violations"),
        (col("c.violations") === 0L).as("passed"))
  }

  /** One-pass per-column table profile — (column, n_rows, n_nulls,
    * n_distinct) for each requested column, the summary a pipeline
    * operator consults before choosing a join strategy (is this key
    * broadcast-small? near-unique? null-riddled?). One scan, one
    * aggregate: null counts are plain sums; the distinct counts ride
    * Spark's multi-distinct Expand rewrite, so the scan is read once and
    * a single shuffle carries (n_cols + 1) tagged replicas of the
    * grouping null-keys. `approx = true` swaps exact distinct for the
    * HLL++ sketch (`approx_count_distinct`) — the same single pass with
    * NO Expand replication, the right trade at warehouse scale where a
    * ±2 % cardinality estimate steers the same decisions.
    */
  def profileStats(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val nd: String => Column =
      if (approx) c => approx_count_distinct(col(c)) else c => count_distinct(col(c))
    // coalesce: SUM over zero rows is NULL — an empty table must profile
    // as zeros, not nulls (count_distinct already returns 0 there)
    val aggs = cols.flatMap { c =>
      Seq(coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as(s"__n_$c"),
        nd(c).as(s"__d_$c"))
    }
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("col_name"), col("__rows").as("n_rows"),
        col(s"__n_$c").as("n_nulls"), col(s"__d_$c").as("n_distinct"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /** Uniqueness constraint over a key: violations = rows beyond the first
    * per duplicated key (so `violations` is "how many rows you'd drop to
    * make the key unique").
    */
  def checkUnique(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame = {
    val per = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    per.agg(coalesce(sum(col("n")), lit(0L)).as("total"),
        coalesce(sum(col("n") - 1), lit(0L)).as("violations"))
      .select(lit(name).as("check"), col("total"), col("violations"),
        (col("violations") === 0L).as("passed"))
  }
}
