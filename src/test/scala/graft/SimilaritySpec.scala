package graft

import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("topCentroids degrades to index order on all-NaN scores, no throw") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val emb = new GenericArrayData(Array[Any](Float.NaN, Float.NaN))
    val centroids = Array(1.0, 0.0, 0.0, 1.0) // two unit centroids, dim 2
    val invNorms = Array(1.0, 1.0)
    val out = graft.functions.VecKernels.topCentroids(emb, centroids, invNorms, 2, 2)
    assert(out.toSeq == Seq(0, 1), "NaN scores must fall back to index order")
  }

  test("cosine of a vector with itself is 1.0") {
    val one = emb.limit(1).select(
      SimilarityOps.cosine($"embedding", $"embedding").as("c")).collect().head.getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
  }

  test("brute-force top-k is ordered and self-excluding") {
    val res = SimilarityOps.bruteForceTopK(emb.filter($"vec_id" < 3), emb, 5)
      .collect()
    assert(res.length == 15)
    val byQ = res.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (q, rows) =>
      val scores = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(!rows.exists(_.getAs[Long]("vec_id") == q))
    }
  }

  test("aggregated top-k (bounded UDAF) == window top-k exactly") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("score"))).toSet
    val win = SimilarityOps.bruteForceTopK(emb.filter($"vec_id" < 4), emb, 7)
    val agg = SimilarityOps.bruteForceTopKAgg(emb.filter($"vec_id" < 4), emb, 7)
    assert(canon(agg) == canon(win))
    // and the aggregation plan has NO window exchange of scored rows
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"agg path must not plan a window:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate") ||
      p.contains("HashAggregate"), "expected partial aggregation")
  }

  test("IVF with full probe (nprobe = C) is EXACTLY brute force") {
    val brute = SimilarityOps.bruteForceTopK(emb.filter($"vec_id" < 3), emb, 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("score"))).toSet
    val full = SimilarityOps.ivfTopK(emb.filter($"vec_id" < 3), emb, 5,
        c = 8, nprobe = 8, iters = 1)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("score"))).toSet
    assert(full == brute, "probing every list must degrade to exhaustive search")
  }

  test("IVF partial probe reaches ≥0.3 recall@10 vs brute force") {
    val brute = SimilarityOps.bruteForceTopK(emb.filter($"vec_id" < 5), emb, 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = SimilarityOps.ivfTopK(emb.filter($"vec_id" < 5), emb, 10,
        c = 16, nprobe = 4, iters = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    // random vectors are adversarial for clustering; 4/16 lists ≈ 1/4 of
    // the corpus scanned
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall")
  }

  test("cluster assignment is total and deterministic") {
    val cents = SimilarityOps.ivfCentroids(emb, 8, 1).cache()
    assert(cents.count() == 8)
    val a1 = SimilarityOps.assignClusters(emb, cents)
    assert(a1.count() == emb.count(), "every vector lands in exactly one cluster")
    val counts = a1.groupBy("cluster_id").count()
    assert(counts.count() <= 8)
  }

  test("vecMean aggregator == per-dimension explode/avg under any partitioning") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
      .select((col("vec_id") % 7).as("g"), col("embedding").cast("array<double>").as("v"))
    for (parts <- Seq(1, 5)) {
      val df = emb.repartition(parts)
      val fast = df.groupBy("g")
        .agg(graft.functions.VecAggs.vecMean(col("v")).as("m"))
        .select(col("g"), posexplode(col("m")).as(Seq("d", "mv")))
      val slow = df.select(col("g"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("g", "d").agg(avg("x").as("mv"))
      val bad = fast.as("a").join(slow.as("b"), Seq("g", "d"))
        .filter(abs(col("a.mv") - col("b.mv")) > 1e-9).count()
      assert(bad == 0L, s"parts=$parts: $bad (group, dim) means disagree")
    }
  }

  test("multi-table LSH top-k reaches ≥0.3 recall@10 vs brute force") {
    val brute = SimilarityOps.bruteForceTopK(emb.filter($"vec_id" < 5), emb, 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val lsh = SimilarityOps.lshTopK(emb.filter($"vec_id" < 5), emb, 10,
        dim = 64, bits = 4, tables = 8)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    // random vectors are the adversarial case for LSH (no cluster
    // structure); 8 tables × 4 bits probes ~1/3 of the corpus
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall")
    assert(lsh.nonEmpty)
  }
}
