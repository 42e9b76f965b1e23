package graft

import org.apache.spark.sql.functions._

import graft.ops.{PackOps, ScoreOps, TextOps}

class ScorePackSpec extends SparkSuite {
  import spark.implicits._

  // --------------------------------------------------------------- scrub
  test("scrub canonicalizes and is idempotent") {
    val df = Seq(
      ("He said: 'YES!!'  \t twice", "he said yes twice"),
      ("room 404, floor 12", "room 000 floor 00"),
      ("  already clean  ", "already clean"),
      ("", "")).toDF("raw", "want")
      .withColumn("got", TextOps.scrub($"raw"))
      .withColumn("got2", TextOps.scrub(TextOps.scrub($"raw")))
    assert(df.filter($"got" =!= $"want" || $"got2" =!= $"got").count() == 0)
  }

  // --------------------------------------------------------------- tf-idf
  private lazy val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "apple durian durian")).toDF("doc_id", "text")

  test("tfIdf: ubiquitous token scores zero, df counts docs not occurrences") {
    val out = ScoreOps.tfIdf(corpus, "doc_id", "text").collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("tfidf"))).toMap
    // 'apple' is in every doc: idf = ln(3/3) = 0, regardless of tf=2
    assert(out(("apple", 1L)) == ((2L, 3L, 0.0)))
    // 'durian': tf=2 in one of three docs -> 2*ln(3). Catalyst's log is
    // StrictMath.log, which differs from Math.log by 1 ulp here.
    val (tf, df, s) = out(("durian", 3L))
    assert(tf == 2L && df == 1L && s == 2.0 * StrictMath.log(3.0))
    assert(out.size == 6) // apple x3 docs + banana + cherry + durian
  }

  test("bm25: more matching terms means higher score; non-matching docs absent") {
    val docs = Seq(
      (1L, "spark fast query engine"),
      (2L, "spark engine"),
      (3L, "slow pandas loop")).toDF("doc_id", "text")
    val out = ScoreOps.bm25(docs, "doc_id", "text", Seq("spark", "query", "fast"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(out.keySet == Set(1L, 2L), "doc 3 has no query term")
    assert(out(1L) > out(2L), "doc 1 matches three terms, doc 2 one")
  }

  // --------------------------------------------------------------- packing
  test("packByTokenBudget: offsets within budget, exact chunk arithmetic, straddle counts") {
    val docs = Seq(
      // shard A: 400 + 400 + 300 tokens with budget 500:
      //   doc 10 starts chunk 0 off 0; doc 11 starts chunk 0 off 400 and
      //   straddles into chunk 1; doc 12 starts chunk 1 off 300
      (10L, "A", 400L), (11L, "A", 400L), (12L, "A", 300L),
      // shard B: empty doc then an 1100-token doc spanning 3 chunks
      (20L, "B", 0L), (21L, "B", 1100L))
      .toDF("doc_id", "shard", "n_tok")
    val out = PackOps.packByTokenBudget(docs, "shard", "doc_id", col("n_tok"), 500L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("chunk_id"), r.getAs[Long]("chunk_off"), r.getAs[Long]("n_chunks")))).toMap
    assert(out(10L) == ((0L, 0L, 1L)))
    assert(out(11L) == ((0L, 400L, 2L)))
    assert(out(12L) == ((1L, 300L, 2L)))
    assert(out(20L) == ((0L, 0L, 1L)))
    assert(out(21L) == ((0L, 0L, 3L)))
  }

  test("packByTokenBudget invariants on real documents") {
    val budget = 1000L
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"), col("text"))
    val packed = PackOps.packByTokenBudget(docs, "source", "doc_id",
      TextOps.tokenCount(col("text")), budget)
    assert(packed.filter(col("chunk_off") < 0 || col("chunk_off") >= budget).count() == 0)
    assert(packed.filter(col("chunk_id") < 0 || col("n_chunks") < 1).count() == 0)
    assert(packed.count() == docs.count(), "packing never drops or duplicates rows")
  }
}
