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
    // literal column reference: backtick-quote so a name containing '.'
    // profiles the COLUMN, not a nested-field lookup
    val lcol: String => Column = c => col("`" + c.replace("`", "``") + "`")
    val nd: String => Column =
      if (approx) c => approx_count_distinct(lcol(c)) else c => count_distinct(lcol(c))
    // coalesce: SUM over zero rows is NULL — an empty table must profile
    // as zeros, not nulls (count_distinct already returns 0 there)
    // Aliases are POSITIONAL (`__n_0`, not `__n_<name>`): a profiled
    // column name could otherwise break the col() re-resolution below.
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(coalesce(sum(lcol(c).isNull.cast("long")), lit(0L)).as(s"__n_$i"),
        nd(c).as(s"__d_$i"))
    }
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val perCol = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col("__rows").as("n_rows"),
        col(s"__n_$i").as("n_nulls"), col(s"__d_$i").as("n_distinct"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /** What the profiler's stats are FOR: pick the physical join strategy
    * per join key. Decision order:
    *  1. build side fits the broadcast budget → `Broadcast` (no shuffle
    *     of the probe side at all — skew is irrelevant when nothing
    *     shuffles);
    *  2. probe side's hottest key carries ≥ `skewFactor`× the average
    *     key's rows AND at least `minHotRows` → `Salted`
    *     ([[JoinOps.saltedJoin]]: spread the hot key over buckets);
    *  3. otherwise → `Plain` (let AQE handle residual imbalance).
    */
  sealed trait JoinStrategy
  case object Broadcast extends JoinStrategy
  case object Salted extends JoinStrategy
  case object Plain extends JoinStrategy

  /** Collected key statistics the advisor consumes: `rows`/`distinct`
    * from [[profileStats]] (one row of it), `topCount` from a heavy-
    * hitter pass ([[graft.functions.MisraGriesAgg]] or a plain top-1
    * count) — all O(1) driver-side scalars, the same feed a cost-based
    * optimizer would read from table stats.
    */
  final case class KeyStats(rows: Long, distinct: Long, topCount: Long)

  def adviseJoin(buildRows: Long, probe: KeyStats,
                 broadcastMaxRows: Long = 1L << 20,
                 skewFactor: Double = 8.0,
                 minHotRows: Long = 100000L): JoinStrategy =
    if (buildRows <= broadcastMaxRows) Broadcast
    else {
      val avg = probe.rows.toDouble / math.max(probe.distinct, 1L)
      if (probe.topCount >= skewFactor * avg && probe.topCount >= minHotRows) Salted
      else Plain
    }

  /** Execute an inner equi-join under an [[adviseJoin]] verdict — the
    * profile→plan loop closed in one call. `salterCols` seed the salt for
    * the `Salted` branch (a high-cardinality probe column).
    */
  def advisedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                  strategy: JoinStrategy, saltBuckets: Int = 16,
                  salterCols: Seq[Column] = Seq.empty): DataFrame =
    strategy match {
      case Broadcast => probe.join(broadcast(build), keys)
      case Salted =>
        // the salter must vary WITHIN a key (salting by the key itself
        // would hash a hot key into ONE bucket); default to the row id —
        // join results are salt-invariant, only the spread changes
        val salters = if (salterCols.nonEmpty) salterCols
          else Seq(monotonically_increasing_id())
        JoinOps.saltedJoin(probe, build, keys, saltBuckets, salters)
      case Plain => probe.join(build, keys)
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
