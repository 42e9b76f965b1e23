package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic copy-mutation of the near-dup corpora, shared by
  * [[graft.ScaleBench]] (10×/100× scaling evidence) and [[MakeSf]] (the
  * sf1 full-suite fixture): copies must land OUTSIDE every near-dup
  * threshold in the suite, so duplicate DENSITY stays that of the
  * organic corpus and growth measures corpus size, not manufactured
  * clusters.
  */
object ScaleData {

  /** `copies`× documents; each non-zero copy rewrites every 2nd token
    * with a copy-hashed variant — char-shingle Jaccard between a copy
    * and its source drops to ~0.3, below every near-dup threshold in
    * the suite.
    */
  def mutateDocs(docs: DataFrame, copies: Int): DataFrame = {
    val n = docs.sparkSession.range(copies.toLong).toDF("__c")
    docs.crossJoin(n)
      .withColumn("doc_id", col("doc_id") + col("__c") * lit(10000000L))
      .withColumn("text",
        when(col("__c") === 0, col("text")).otherwise(
          array_join(zip_with(
            split(col("text"), " "),
            sequence(lit(0), size(split(col("text"), " ")) - 1),
            (t, i) => when(i % 2 === 0,
              concat(lit("w"), pmod(hash(t, col("__c")), lit(99999))))
              .otherwise(t)), " ")))
      .drop("__c")
  }

  /** `copies`× embeddings; each non-zero copy SIGN-FLIPS ~half the lanes
    * under a per-copy pseudo-random pattern, so two distinct copies of
    * one vector disagree on ~half their flips and land near cosine 0 —
    * far below every similarity threshold in the suite. (A single-lane
    * perturbation leaves copies at cos ≈ 0.99 of their source, which
    * manufactures a quadratic near-dup cluster per source row.)
    */
  def mutateEmb(emb: DataFrame, copies: Int): DataFrame = {
    val n = emb.sparkSession.range(copies.toLong).toDF("__c")
    emb.crossJoin(n)
      .withColumn("vec_id", col("vec_id") + col("__c") * lit(10000000L))
      .withColumn("embedding",
        when(col("__c") === 0, col("embedding")).otherwise(
          transform(col("embedding"),
            (v, i) => when(pmod(hash(i, col("__c")), lit(2)) === 0, -v).otherwise(v))))
      .drop("__c")
  }
}
