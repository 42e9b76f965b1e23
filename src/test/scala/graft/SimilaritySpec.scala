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

  // ------------------------------- embedding near-dup pairs (scale tier)

  /** Independent exact reference: every (a < b) pair above the cosine
    * threshold, via a plain conditional cross join — no blocking at all.
    */
  private def brutePairs(threshold: Double): Set[(Long, Long)] = {
    val withNorm = emb.select($"vec_id", $"embedding",
      SimilarityOps.l2norm($"embedding").as("nrm"))
    withNorm.as("a").join(withNorm.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id",
        (SimilarityOps.dot($"a.embedding", $"b.embedding") /
          ($"a.nrm" * $"b.nrm")).as("cos"))
      .filter($"cos" >= threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF-blocked cosine pairs at full probe EQUAL unblocked brute force") {
    val brute = brutePairs(0.35)
    val full = pairSet(SimilarityOps.cosinePairsClustered(emb, None, 0.35,
      c = 8, nprobe = 8, iters = 1))
    assert(full == brute,
      s"full probe must admit every pair: missing=${(brute -- full).size} " +
        s"extra=${(full -- brute).size}")
    assert(brute.nonEmpty, "fixture must contain pairs above the threshold")
  }

  test("IVF-blocked cosine pairs: precision exact, recall ≥ 0.8 at nprobe 4") {
    val brute = brutePairs(0.35)
    val ivf = pairSet(SimilarityOps.cosinePairsClustered(emb, None, 0.35,
      c = 16, nprobe = 4, iters = 2))
    assert(ivf.subsetOf(brute),
      "every emitted pair is exact-cosine verified — false positives are impossible")
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall (measured 0.947 on the fixture)")
  }

  // ------------------------------- persistent IVF index

  test("persistent IVF index: build + append + probe, exactly-once, pruning-exact") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/idx"
    val VT = graft.ops.VersionedTable
    SimilarityOps.ivfIndexBuild(emb.filter($"vec_id" % 4 =!= 0), dir, c = 8, iters = 1)
    SimilarityOps.ivfIndexAppend(emb.filter($"vec_id" % 4 === 0), dir,
      txn = Some("spec-append" -> 1L))
    // the index now covers the WHOLE corpus: full probe == brute force
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("score"))).toSet
    val queries = emb.filter($"vec_id" < 3)
    assert(canon(SimilarityOps.ivfIndexTopK(queries, dir, 5, nprobe = 8)) ==
      canon(SimilarityOps.bruteForceTopK(queries, emb, 5)),
      "full probe of the persisted index must equal exhaustive search")
    // partial probe: the file-PRUNED read must equal the same scoring over
    // the UNpruned assignment table — pruning chooses files, never rows
    val matrix = SimilarityOps.collectCentroids(VT.read(spark, s"$dir/centroids"))
    val probes = queries.select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
      SimilarityOps.l2norm($"embedding").as("q_norm"),
      explode(graft.functions.VectorExpressions.topCentroids(
        $"embedding", matrix, 3)).as("cluster_id"))
    val unpruned = VT.read(spark, s"$dir/assign")
      .join(broadcast(probes), Seq("cluster_id"))
      .filter($"query_id" =!= $"vec_id")
      .withColumn("score", SimilarityOps.dot($"q_emb", $"embedding") /
        ($"q_norm" * $"c_norm"))
    val expect = graft.plans.TopKPlans.topKPerGroup(
      unpruned.select("query_id", "vec_id", "score"),
      Seq("query_id"), Seq("score" -> false, "vec_id" -> true), 5)
    assert(canon(SimilarityOps.ivfIndexTopK(queries, dir, 5, nprobe = 3)) ==
      canon(expect))
    // a REPLAYED append no-ops through the txn ledger: no version bump,
    // no doubled vectors
    val vBefore = VT.currentVersion(spark, s"$dir/assign").get
    val nBefore = VT.read(spark, s"$dir/assign").count()
    SimilarityOps.ivfIndexAppend(emb.filter($"vec_id" % 4 === 0), dir,
      txn = Some("spec-append" -> 1L))
    assert(VT.currentVersion(spark, s"$dir/assign").get == vBefore)
    assert(VT.read(spark, s"$dir/assign").count() == nBefore)
    // layout: the assignment table's files carry tight cluster_id
    // intervals (range-clustered write), which is what makes the probe
    // open only the probed clusters' files
    val m = VT.readManifest(spark, s"$dir/assign",
      VT.currentVersion(spark, s"$dir/assign").get)
    val spans = m.files.flatMap(f => f.stats.get("cluster_id"))
      .collect { case graft.ops.VersionedTable.ColStat(_, Some(mn), Some(mx), _) =>
        mx.toInt - mn.toInt }
    assert(spans.nonEmpty && spans.max <= 4,
      s"assignment files must cover few clusters each, spans=$spans")
  }

  test("cosinePairsAbove scale tier: blocked IVF ⊆ blocked brute, recall ≥ 0.8") {
    // force the clustered tier (bruteMaxRows = 0) and compare against the
    // exact label-blocked tier the oracle checks — the tier switch keeps
    // the block-column conjunct, so candidates only ever SHRINK
    val exact = pairSet(SimilarityOps.cosinePairsAbove(emb, "label", 0.35))
    val tiered = pairSet(SimilarityOps.cosinePairsAbove(emb, "label", 0.35,
      bruteMaxRows = 0))
    assert(tiered.subsetOf(exact), "scale tier must keep the block conjunct")
    val recall = exact.intersect(tiered).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall (measured 0.936 on the fixture)")
  }
}
