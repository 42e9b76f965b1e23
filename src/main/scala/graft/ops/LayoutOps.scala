package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-order (Morton) clustering so that files and
  * parquet row groups carry TIGHT min/max ranges on several columns at
  * once — the layout counterpart to predicate pushdown. A 100 TB table
  * laid out by z-value answers a two-column box predicate by reading the
  * few row groups whose stats overlap the box; a linearly-sorted table
  * only prunes on its leading sort column.
  */
object LayoutOps {

  /** 64-bit Morton z-value of two rank columns. Callers normalize each
    * dimension to a non-negative int rank first (see [[rank32]]); raw
    * values with wildly different ranges interleave poorly.
    */
  def zvalue(xRank: Column, yRank: Column): Column =
    graft.functions.VectorExpressions.zvalue2(xRank, yRank)

  /** N-dimensional Morton z-value (2 ≤ n ≤ 8): each rank contributes its
    * low ⌊64/n⌋ bits, interleaved round-robin. The 2-D case dispatches to
    * the native [[zvalue]] kernel; higher arities COMPOSE built-in bit
    * expressions (shift/and/or), so the whole thing stays inside
    * whole-stage codegen with no custom expression — ~64 constant-shift
    * terms the JIT folds flat. Callers must produce ranks with
    * `buckets ≤ 2^(64/n)` ([[rank32]]'s `buckets` parameter); wider ranks
    * silently lose their HIGH bits, which destroys locality.
    */
  def zvalueN(ranks: Seq[Column]): Column = {
    require(ranks.size >= 2 && ranks.size <= 8,
      s"zvalueN interleaves 2 to 8 dimensions, got ${ranks.size}")
    if (ranks.size == 2) zvalue(ranks(0), ranks(1))
    else {
      val n = ranks.size
      val b = 64 / n
      val terms = for { d <- 0 until n; i <- 0 until b } yield
        shiftleft(shiftright(ranks(d).cast("long"), i).bitwiseAND(lit(1L)),
          i * n + d)
      terms.reduce(_ bitwiseOR _)
    }
  }

  /** Equi-width int rank of a numeric column over a known [lo, hi] domain
    * — a one-pass, join-free normalizer good enough for layout (layout
    * needs locality, not exact quantiles).
    */
  def rank32(c: Column, lo: Double, hi: Double, buckets: Int = 1 << 20): Column =
    least(lit(buckets - 1), greatest(lit(0),
      floor((c - lit(lo)) / lit(math.max(hi - lo, Double.MinPositiveValue)) * buckets)
        .cast("int")))

  /** Rewrite `df` into `numFiles` files clustered by the z-value of two
    * dimensions: range-partition on z (so files hold contiguous z-ranges)
    * and sort within partitions (so row groups inside a file are tight
    * too). One shuffle; no driver-side data movement.
    */
  def zorderWrite(df: DataFrame, xRank: Column, yRank: Column,
                  numFiles: Int, path: String): Unit = {
    val withZ = df.withColumn("__z", zvalue(xRank, yRank))
    withZ
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
