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
