package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * `df.sample`/`randomSplit` draw from a partition-seeded RNG: the result
  * changes whenever the partition layout does (repartition, AQE coalesce,
  * different cluster size) — poison for reproducible train/test splits.
  * These operators derive membership from a HASH OF THE ROW'S KEY instead:
  * stable across any physical layout, re-runnable, and joinable (the same
  * row always lands on the same side).
  */
object SampleOps {

  /** Stable bucket in [0, buckets) from the key — xxhash64(seed 42). */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(xxhash64(key), lit(buckets))

  /** Deterministic (train, holdout) split: ~trainPct% of rows by key hash.
    * Disjoint and complete by construction; a given key is always on the
    * same side regardless of partitioning, cluster size, or re-runs.
    */
  def hashSplit(df: DataFrame, key: Column, trainPct: Int,
                buckets: Int = 100): (DataFrame, DataFrame) = {
    val b = hashBucket(key, buckets)
    (df.filter(b < trainPct), df.filter(b >= trainPct))
  }

  /** Deterministic global shuffle for training-order randomization: every
    * row gets a pseudorandom sort key from a Lehmer/MINSTD step over its
    * integral id — two MINSTD steps `((id mod M)·48271 + seed)·48271
    * mod M`, M = 2³¹−1; one step stays below M for id < 44489 and would
    * leave small sequential ids in INPUT order — then a shard and
    * a within-shard position. All-integer (exact in any engine; the
    * multiply peaks at 2.1e9·48271 ≈ 1e14, far inside int64), seedable,
    * and independent of physical layout — unlike `orderBy(rand())`, which
    * is partition-seeded and non-reproducible.
    *
    * Scale shape: writing shards is `repartition(shards, col("shard"))` +
    * `sortWithinPartitions(key)` — one shuffle, no global sort. The
    * row_number window here additionally exposes the exact in-shard
    * position for the oracle; it partitions BY SHARD, so no single reducer
    * ever orders more than 1/shards of the data.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long,
                           shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val M = 2147483647L
    val key = pmod(
      pmod(pmod(col(idCol), lit(M)) * lit(48271L) + lit(seed % M), lit(M)) * lit(48271L),
      lit(M))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy(col("__key"), col(idCol))
    df.withColumn("__key", key)
      .withColumn("shard", pmod(col("__key"), lit(shards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("__key")
  }

  /** Curriculum-mixture sampling: per-stratum deterministic Bernoulli keep
    * with EXACT integer thresholds — row kept iff its Lehmer key
    * `((id mod M)·48271 + seed)·48271 mod M` (M = 2³¹−1) falls below
    * `floor(w·M)` for its stratum's weight `w`. All-integer comparison →
    * reproducible bit-for-bit in ANY engine (the thresholds are compile-time
    * longs), layout-independent, and a single narrow filter pass — the form
    * that upsamples/downsamples 100 TB corpora by source without a shuffle.
    * Strata absent from `weights` are dropped.
    */
  def weightedSample(df: DataFrame, idCol: String, stratum: Column,
                     weights: Map[String, Double], seed: Long = 0L): DataFrame = {
    val M = 2147483647L
    // TWO multiplicative steps: a single `id·48271 mod M` never exceeds M
    // for id < 44489, so sequential ids would map to a monotone ramp and a
    // threshold test would keep a PREFIX, not a sample. After the second
    // step the effective stride is 48271² mod M ≈ 1.8e8 — every increment
    // wraps the modulus and sequential ids equidistribute (Weyl).
    val k1 = pmod(pmod(col(idCol), lit(M)) * lit(48271L) + lit(seed % M), lit(M))
    val key = pmod(k1 * lit(48271L), lit(M))
    val thr = weights.foldLeft(lit(-1L)) { case (acc, (s0, w)) =>
      require(w >= 0.0 && w <= 1.0, s"weight for $s0 out of [0,1]: $w")
      when(stratum === s0, lit(math.floor(w * M).toLong)).otherwise(acc)
    }
    df.filter(key < thr)
  }

  /** Deterministic stratified sample: per-stratum keep-fraction, applied as
    * a per-row hash threshold — single narrow pass, no sampling job, exact
    * reproducibility. Strata absent from `fractions` are dropped.
    */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       fractions: Map[String, Double],
                       buckets: Int = 10000): DataFrame = {
    // round, don't truncate: 0.29 * 10000 is 2899.9999… in doubles, and
    // toInt would bias the keep-fraction persistently low by one bucket
    val thresholds = fractions.foldLeft(lit(-1)) { case (acc, (s, f)) =>
      when(stratum === s, lit(math.round(f * buckets).toInt)).otherwise(acc)
    }
    df.filter(hashBucket(key, buckets) < thresholds)
  }
}
