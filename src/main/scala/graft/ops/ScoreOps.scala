package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistics document scoring (TF-IDF, BM25) — the relevance /
  * quality-weighting stage of a training-data pipeline (boosting rare
  * content, down-weighting boilerplate, query-driven subcorpus selection).
  *
  * The reference has no scoring surface at all; north-star scope. Engine
  * notes: everything is two hash aggregations (doc-term, then term) plus
  * one shuffle join on the term key and one broadcast of two corpus
  * scalars — no windows, no driver loops; stop-word key skew in the term
  * join is ordinary hash-join skew (AQE splits it).
  *
  * Cross-engine determinism: the double expressions are shaped so both
  * engines execute the identical op sequence — single mul/div/ln chains,
  * never `a*b ± c*d` in one expression (contraction-prone), and the only
  * summation over doubles is an explicit left-to-right column add, never a
  * SUM aggregate whose accumulation order is engine-defined. `ln` itself is
  * bit-identical across the JVM's Math.log, glibc, and DuckDB (verified on
  * this platform; StrictMath is the one that differs).
  */
object ScoreOps {

  /** Per-(doc, token) TF-IDF over whitespace tokens:
    * `tf · ln(N / df)` with df = number of docs containing the token.
    */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
  }

  /** Okapi BM25 score of every document against a fixed term set.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·|d|/avg|d|))
    * with idf(t) = ln((N − df + 0.5)/(df + 0.5)). Only documents containing
    * at least one query term are returned. The Σ over terms is materialized
    * as a fixed left-to-right add over per-term columns, keeping the
    * accumulation order engine-independent.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms == terms.distinct, "terms must be distinct")
    val toks = docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("token"))
    val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val corpus = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(lens.agg(
        (sum(col("len")).cast("double") / count(lit(1)).cast("double")).as("avg_len")))
    val tf = toks.filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "token")
      .join(lens, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("tf_part",
        (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * (col("len").cast("double") / col("avg_len")))))
      .withColumn("s", col("idf") * col("tf_part"))
    // Σ over terms in declared order: per-term column (exactly one row per
    // (doc, term) exists, so max() is just selection), then a fixed
    // left-to-right add
    val perTerm = terms.map(t =>
      coalesce(max(when(col("token") === t, col("s"))), lit(0.0)))
    scored.groupBy("doc_id")
      .agg(perTerm.reduceLeft(_ + _).as("score"))
  }
}
