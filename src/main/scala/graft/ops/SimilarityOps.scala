package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §2.7 north-star).
  *
  * Two tiers: exact brute-force top-k (the correctness baseline) and an
  * LSH-bucketed approximate path (the 100 TB path — candidates shrink from
  * |corpus| to one bucket before scoring).
  */
object SimilarityOps {

  /** Dot product in double precision, strict left-to-right accumulation —
    * bit-reproducible and identical to the DuckDB oracle's fold.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact brute-force top-k cosine neighbours for each query vector.
    *
    * Plan: broadcast the (small) query set, score corpus×queries in one
    * narrow pass, then per-query top-k via window. At cluster scale the
    * window shuffle keys on query_id — uniform by construction. For very
    * large k·|queries|, swap the window for per-partition heaps; at our
    * sizes the window plan is already minimal (one broadcast, one shuffle).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")))
    val scored = corpus.select(col("vec_id"), col("embedding"))
      .join(q, col("query_id") =!= col("vec_id"))
      .withColumn("score", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "vec_id", "score", "rnk")
  }

  /** Random-hyperplane (sign) LSH bucket id for one hash table: `bits`
    * pseudo-random hyperplanes, each dimension's weight derived from
    * xxhash64(table, bit, dim) mapped into [-0.5, 0.5). Deterministic, no
    * stored model.
    */
  def rhpBucket(emb: Column, dim: Int, bits: Int, table: Int): Column = {
    def weight(bit: Int, d: Int): Column =
      (pmod(xxhash64(lit(table * 1000003 + bit * 7919 + d)), lit(100000L))
        .cast("double") / 100000.0) - 0.5
    val bitCols = (0 until bits).map { bit =>
      val proj = (0 until dim).map(dd =>
        element_at(emb, dd + 1).cast("double") * weight(bit, dd)).reduce(_ + _)
      when(proj >= 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k via multi-table RHP-LSH: a corpus vector is a
    * candidate if it shares a bucket with the query in ANY of `tables`
    * independent hash tables (the standard recall lever). Candidates are
    * deduped before scoring, so each pair's cosine is computed once.
    *
    * Scale shape: candidate generation is an equi-join on (table, bucket) —
    * shuffle keys on 2^bits·tables values; per-bucket candidate lists stay
    * ~|corpus|/2^bits. Recall vs. [[bruteForceTopK]] is property-tested.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              dim: Int, bits: Int = 8, tables: Int = 4): DataFrame = {
    def buckets(e: Column): Column =
      array((0 until tables).map(t => struct(lit(t).as("t"),
        rhpBucket(e, dim, bits, t).as("b"))): _*)
    val cb = corpus.select(col("vec_id"), col("embedding"),
      explode(buckets(col("embedding"))).as("bk"))
    val qb = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      explode(buckets(col("embedding"))).as("q_bk")))
    val candidates = cb.join(qb,
        col("bk") === col("q_bk") && col("query_id") =!= col("vec_id"))
      .select("query_id", "q_emb", "vec_id", "embedding")
      .dropDuplicates("query_id", "vec_id")
    val scored = candidates
      .withColumn("score", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "vec_id", "score", "rnk")
  }

  /** Embedding near-dup pairs above a cosine threshold, blocked by label
    * (or any coarse partition column) to bound the pair space.
    */
  def cosinePairsAbove(df: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    val a = df.select(col("vec_id"), col("embedding"), col(blockCol)).alias("a")
    val b = df.select(col("vec_id"), col("embedding"), col(blockCol)).alias("b")
    a.join(b, col(s"a.$blockCol") === col(s"b.$blockCol") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
