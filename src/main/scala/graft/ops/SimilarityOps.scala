package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Similarity search over embedding columns (SURVEY §2.7 north-star).
  *
  * Two tiers: exact brute-force top-k (the correctness baseline) and an
  * LSH-bucketed approximate path (the 100 TB path — candidates shrink from
  * |corpus| to one bucket before scoring).
  *
  * The scalar kernels (dot, norm, bucket ids) are native codegen'd Catalyst
  * expressions ([[graft.functions.VectorExpressions]]); every pair join
  * precomputes per-row L2 norms so the O(pairs) inner loop is a single dot
  * product — `sqrt(Σv²)` per ROW, not per PAIR, with bit-identical results
  * (the same two sqrt factors are multiplied either way).
  */
object SimilarityOps {

  /** Dot product in double precision, strict left-to-right accumulation —
    * bit-reproducible and identical to the DuckDB oracle's fold.
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotProduct(a, b)

  def l2norm(a: Column): Column = sqrt(VectorExpressions.normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Per-query top-k ranking over a scored (query_id, vec_id, score)
    * relation via the bounded [[graft.plans.TopKPerGroupExec]] custom
    * operator: map tasks keep a k-element heap per query and emit ≤ k rows
    * per (partition, query); the one hash exchange moves only those — vs.
    * the window plan, which shuffles EVERY scored candidate row to
    * |queries| reducer partitions and sorts them. At 100 TB the window
    * shape is a handful of reducers sorting the whole scored relation;
    * this shape is a constant per-task state and a k·partitions-row
    * shuffle. Plan pinned (no WindowExec/SortExec) in `PlanSpec`.
    */
  private def rankPerQuery(scored: DataFrame, k: Int): DataFrame =
    graft.plans.TopKPlans.topKPerGroup(
      scored.select("query_id", "vec_id", "score"),
      Seq("query_id"), Seq("score" -> false, "vec_id" -> true), k)

  /** Exact brute-force top-k cosine neighbours for each query vector.
    *
    * Plan: broadcast the (small) query set, score corpus×queries in one
    * narrow pass, then per-query top-k via [[rankPerQuery]]'s bounded-heap
    * custom operator — the scored relation never gets window-shuffled or
    * sorted wholesale.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), l2norm(col("embedding")).as("q_norm")))
    val scored = corpus
      .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("c_norm"))
      .join(q, col("query_id") =!= col("vec_id"))
      .withColumn("score",
        dot(col("q_emb"), col("embedding")) / (col("q_norm") * col("c_norm")))
    rankPerQuery(scored, k)
  }

  /** Approximate top-k via multi-table RHP-LSH: a corpus vector is a
    * candidate if it shares a bucket with the query in ANY of `tables`
    * independent random-hyperplane hash tables (the standard recall lever).
    * Bucket ids come from one native expression pass
    * ([[VectorExpressions.rhpBuckets]]); candidates are deduped before
    * scoring, so each pair's cosine is computed once.
    *
    * Scale shape: candidate generation is an equi-join on (table, bucket) —
    * shuffle keys on 2^bits·tables values; per-bucket candidate lists stay
    * ~|corpus|/2^bits. Recall vs. [[bruteForceTopK]] is property-tested.
    *
    * `dim` is retained for API stability; the native kernel reads the
    * dimension from each row's array.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              dim: Int, bits: Int = 8, tables: Int = 4): DataFrame = {
    val cb = corpus.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("c_norm"),
      posexplode(VectorExpressions.rhpBuckets(col("embedding"), bits, tables))
        .as(Seq("t", "bkt")))
    val qb = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), l2norm(col("embedding")).as("q_norm"),
      posexplode(VectorExpressions.rhpBuckets(col("embedding"), bits, tables))
        .as(Seq("q_t", "q_bkt"))))
    // Score BEFORE deduplicating (minhashLshPairs discipline): the dot
    // product is a cheap native kernel evaluated once per agreeing table,
    // so re-scoring a duplicate candidate costs less than pushing both
    // embedding arrays (2·dim floats + norms per row) through the
    // dropDuplicates shuffle — surviving rows are (long, long, double).
    val scored = cb.join(qb,
        col("t") === col("q_t") && col("bkt") === col("q_bkt") &&
          col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_norm") * col("c_norm")))
          .as("score"))
      .dropDuplicates("query_id", "vec_id")
    rankPerQuery(scored, k)
  }

  /** [[bruteForceTopK]] with the shuffle-lean aggregation plan: per-query
    * top-k via the bounded [[graft.functions.TopKAggregator]] instead of a
    * window — map tasks partial-aggregate to ≤ k pairs each, the shuffle
    * moves only those buffers (vs. every scored candidate row). Same
    * result set, spec-verified; preferred at |corpus| ≫ k.
    */
  def bruteForceTopKAgg(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), l2norm(col("embedding")).as("q_norm")))
    val scored = corpus
      .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("c_norm"))
      .join(q, col("query_id") =!= col("vec_id"))
      .withColumn("score",
        dot(col("q_emb"), col("embedding")) / (col("q_norm") * col("c_norm")))
    scored.groupBy("query_id")
      .agg(graft.functions.TopKAggregator.topK(k)(col("vec_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("query_id"), col("t._1").as("vec_id"),
        col("t._2").as("score"), (col("i") + 1).cast("int").as("rnk"))
  }

  // ------------------------------------------------------------- IVF
  /** Deterministic IVF centroids: seed with the first `c` corpus vectors
    * (by vec_id order), then refine with `iters` Lloyd's rounds as plain
    * DataFrame aggregations — assign each vector to its max-cosine
    * centroid (a narrow native argmax) and re-average per cluster with
    * the mergeable [[graft.functions.VecAggs.vecMean]] aggregator: ONE
    * hash shuffle per round moving ≤ c × partitions (sum-vector, count)
    * buffers. (The posexplode/avg alternative shuffles every
    * (row, dimension) element — a dim× blowup of the corpus per round.)
    * Returns (cluster_id, centroid) rows, collected — the centroid table
    * is C×dim, driver-small by design.
    */
  def ivfCentroids(corpus: DataFrame, c: Int, iters: Int): DataFrame = {
    var centroids = corpus.orderBy("vec_id").limit(c)
      .select(monotonically_increasing_id().as("cluster_id"),
        col("embedding").cast("array<double>").as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assignClusters(corpus, centroids)
      centroids = assigned.groupBy("cluster_id")
        .agg(graft.functions.VecAggs.vecMean(
          col("embedding").cast("array<double>")).as("centroid"))
    }
    centroids
  }

  /** Collect the (driver-small by construction) centroid table to a
    * row-major matrix, cluster_id order.
    */
  def collectCentroids(centroids: DataFrame): Array[Array[Double]] =
    centroids.orderBy("cluster_id").select("centroid").collect()
      .map(_.getSeq[Double](0).toArray)

  /** Assign every corpus vector to its nearest (max-cosine) centroid — a
    * NARROW per-row argmax with the centroid matrix riding along as a
    * codegen reference object ([[VectorExpressions.NearestCentroid]]).
    * No join, no window, no shuffle of the corpus.
    */
  def assignClusters(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.withColumn("cluster_id",
      VectorExpressions.nearestCentroid(col("embedding"),
        collectCentroids(centroids)).cast("long"))

  /** IVF top-k: probe the `nprobe` nearest clusters per query, exact-score
    * only their members. The scale path: the corpus is scanned/shuffled
    * by cluster_id (a pre-computable partitioning at 100 TB — write the
    * index bucketed by cluster), and each query touches nprobe/C of it.
    * With nprobe = C this is EXACTLY brute force (spec-verified).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              c: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    val matrix = collectCentroids(ivfCentroids(corpus, c, iters))
    val indexed = corpus.select(col("vec_id"), col("embedding"),
      VectorExpressions.nearestCentroid(col("embedding"), matrix).as("cluster_id"),
      l2norm(col("embedding")).as("c_norm"))
    // per-query probe list: nprobe max-cosine centroids, one narrow pass
    val probes = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"), l2norm(col("embedding")).as("q_norm"),
        explode(VectorExpressions.topCentroids(col("embedding"), matrix, nprobe))
          .as("cluster_id"))
    val scored = indexed.join(broadcast(probes), Seq("cluster_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("score",
        dot(col("q_emb"), col("embedding")) / (col("q_norm") * col("c_norm")))
    rankPerQuery(scored, k)
  }

  /** Corpus-size cap for [[cosinePairsAbove]]'s exact tier. A fixed
    * blocking column's cardinality does not grow with the corpus, so the
    * within-block pair space is O(n²/|blocks|) — quadratic in n. Up to
    * this many rows the quadratic is cheap and EXACT (the oracle tier);
    * past it the operator routes to [[cosinePairsClustered]], whose
    * cluster count scales with n.
    */
  val CosineBruteMaxRows: Long = 100000L

  /** Target rows per IVF cluster when [[cosinePairsAbove]] sizes the
    * clustered tier: c = n / this, so per-cluster pair work stays
    * constant as the corpus grows (candidate pairs ≈ n·bucket·nprobe² —
    * LINEAR in n at fixed bucket size; measured exponent ~1.0/decade in
    * BENCH_SCALE once c leaves its floor of 16). The flat coarse
    * quantizer costs O(c·dim) per assigned row, which holds to c ~ 10⁵
    * (≈ 25M-row shards at this target); past that, assign through an
    * ANN index over the CENTROIDS (they are just another embedding
    * table — [[lshTopK]] over c rows) to make assignment O(log c).
    */
  val CosineClusterTargetRows: Long = 256L

  /** Embedding near-dup pairs above a cosine threshold, blocked by
    * `blockCol` — ADAPTIVE, same cost-tier discipline as
    * [[DedupOps.jaccardPairsGlobal]]:
    *
    *  - at or below `bruteMaxRows` corpus rows: exact all-pairs within
    *    each block (the oracle tier — deterministic, SQL-differentiable);
    *  - above it: [[cosinePairsClustered]] with the cluster count sized
    *    to the corpus (c = n/[[CosineClusterTargetRows]]), keeping the
    *    block-column equality as an extra candidate conjunct. Candidates
    *    come from shared IVF cluster assignments, so the pair space grows
    *    LINEARLY in n instead of O(n²/|blocks|); the exact cosine verify
    *    keeps precision perfect, and recall (a pair straddling two
    *    never-co-probed clusters is missed) is the documented
    *    approximation — property-bounded in SimilaritySpec, exact at
    *    nprobe = c.
    *
    * The tier probe is one count() job at construction (SURVEY §2.8).
    */
  def cosinePairsAbove(df: DataFrame, blockCol: String, threshold: Double,
                       bruteMaxRows: Long = CosineBruteMaxRows): DataFrame = {
    val n = df.count()
    if (n <= bruteMaxRows) {
      val withNorm = df.select(col("vec_id"), col("embedding"), col(blockCol),
        l2norm(col("embedding")).as("nrm"))
      val a = withNorm.alias("a")
      val b = withNorm.alias("b")
      a.join(b, col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          (dot(col("a.embedding"), col("b.embedding")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
        .filter(col("cos") >= threshold)
    } else {
      val c = math.max(16L, n / CosineClusterTargetRows).toInt
      cosinePairsClustered(df, Some(blockCol), threshold, c = c)
    }
  }

  /** Embedding near-dup pairs via IVF-CLUSTER candidate blocking — the
    * 100 TB path. Every vector is assigned to its `nprobe` nearest
    * centroids (one narrow native pass, no shuffle of the corpus);
    * candidates are pairs sharing a probed cluster (an equi-join on
    * cluster_id — the shuffle key's cardinality GROWS with the corpus via
    * `c`, unlike a fixed label column); each candidate is verified with
    * the exact cosine kernel, so precision is exact. Multi-assignment
    * (`nprobe` > 1) is the recall lever: a pair within the threshold
    * angle almost always shares one of its top clusters, and at
    * nprobe = c the blocking admits every pair — spec-pinned equal to
    * brute force. Scored BEFORE the pair-dedup ([[lshTopK]] discipline):
    * surviving rows are (long, long, double), so the distinct shuffle
    * never moves embeddings.
    */
  def cosinePairsClustered(df: DataFrame, blockCol: Option[String],
                           threshold: Double, c: Int, nprobe: Int = 4,
                           iters: Int = 2): DataFrame = {
    val corpus = df.select(col("vec_id").as("vec_id"), col("embedding"))
    val matrix = collectCentroids(ivfCentroids(corpus, c, iters))
    val probed = df.select(
      Seq(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"),
        explode(VectorExpressions.topCentroids(col("embedding"), matrix,
          math.min(nprobe, c))).as("cl")) ++ blockCol.map(col): _*)
    val blockEq = blockCol.map(bc => col(s"a.$bc") === col(s"b.$bc"))
      .getOrElse(lit(true))
    probed.as("a").join(probed.as("b"),
        col("a.cl") === col("b.cl") && blockEq &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  // ------------------------------------------------------------- persistent IVF index
  /** PERSISTENT IVF index as two [[VersionedTable]]s under `indexDir` —
    * the [[DedupOps.incrementalDedupRound]] signature-table pattern
    * applied to ANN: centroids and assignments are computed ONCE at
    * build, stored versioned, and every later batch is assigned against
    * the FROZEN centroids and appended — no per-query Lloyd's, no
    * re-assignment of the corpus.
    *
    *  - `centroids`: (cluster_id, centroid) — k×dim, one file;
    *  - `assign`: (vec_id, embedding, c_norm, cluster_id),
    *    range-clustered on cluster_id with cluster_id as a stats column,
    *    so each file's manifest interval covers few clusters and a probe
    *    opens only the probed clusters' files ([[VersionedTable
    *    .readWhere]] IN-set pruning — the on-disk analog of an IVF
    *    inverted list).
    *
    * The versioned layer buys the index time travel (probe yesterday's
    * index), exactly-once appends (txn ledger), and compaction
    * ([[VersionedTable.commitCompact]] with `clusterBy = cluster_id`
    * re-tightens intervals after many small appends).
    */
  def ivfIndexBuild(corpus: DataFrame, indexDir: String,
                    c: Int, iters: Int = 2): Unit = {
    val spark = corpus.sparkSession
    val matrix = collectCentroids(ivfCentroids(corpus, c, iters))
    import spark.implicits._
    val centDf = matrix.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("cluster_id", "centroid")
    VersionedTable.create(centDf.coalesce(1), s"$indexDir/centroids",
      statsCols = Seq("cluster_id"))
    VersionedTable.create(assignFor(corpus, matrix), s"$indexDir/assign",
      statsCols = Seq("cluster_id"))
  }

  private def assignFor(batch: DataFrame,
                        matrix: Array[Array[Double]]): DataFrame =
    batch.select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("c_norm"),
        VectorExpressions.nearestCentroid(col("embedding"), matrix).as("cluster_id"))
      // EXPLICIT partition count (~4 clusters per file): an unpinned range
      // write lets AQE coalesce everything into one file spanning every
      // cluster, and the probe-time file pruning this layout exists for
      // degrades to a full read
      .repartitionByRange(math.max(1, matrix.length / 4),
        col("cluster_id"), col("vec_id"))

  private def indexCentroids(spark: org.apache.spark.sql.SparkSession,
                             indexDir: String): Array[Array[Double]] =
    collectCentroids(VersionedTable.read(spark, s"$indexDir/centroids"))

  /** Assign a new batch against the index's FROZEN centroids and append —
    * O(batch), the corpus never re-clusters. `txn` makes replayed batches
    * no-op (exactly-once, the ledger pattern). Returns the assignment
    * table's new version.
    */
  def ivfIndexAppend(batch: DataFrame, indexDir: String,
                     txn: Option[(String, Long)] = None): Long = {
    val spark = batch.sparkSession
    VersionedTable.commitAppend(
      assignFor(batch, indexCentroids(spark, indexDir)),
      s"$indexDir/assign", txn = txn)
  }

  /** Probe the persistent index: top-k cosine over the `nprobe` nearest
    * clusters per query. The probed cluster-id set (≤ nprobe × |queries|,
    * driver-small — queries are small by nature) prunes the assignment
    * table's FILES through the manifest before any row is read; scoring
    * and ranking are [[ivfTopK]]'s plan. With nprobe ≥ c this reads the
    * whole index and equals brute force (spec-pinned).
    */
  def ivfIndexTopK(queries: DataFrame, indexDir: String,
                   k: Int, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    val matrix = indexCentroids(spark, indexDir)
    val np = math.min(nprobe, matrix.length)
    val probes = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), l2norm(col("embedding")).as("q_norm"),
      explode(VectorExpressions.topCentroids(col("embedding"), matrix, np))
        .as("cluster_id"))
    val probedIds = probes.select("cluster_id").distinct()
      .collect().map(_.getInt(0)).sorted
    val indexed = VersionedTable.readWhere(spark, s"$indexDir/assign",
      col("cluster_id").isin(probedIds.map(i => i: Any): _*))
    val scored = indexed.join(broadcast(probes), Seq("cluster_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("score",
        dot(col("q_emb"), col("embedding")) / (col("q_norm") * col("c_norm")))
    rankPerQuery(scored, k)
  }

  // ------------------------------------------------------------- int8 quantization
  /** Symmetric per-vector int8 quantization: `scale = max|v| / 127`,
    * `q_i = floor(v_i/scale + 0.5)` ∈ [−127, 127] — 4× smaller embedding
    * storage (the difference between an 8 TB and a 2 TB ANN index at
    * corpus scale) at <1% cosine error. `floor(x + 0.5)` instead of a
    * round() builtin on purpose: floor is exact in IEEE arithmetic and
    * identical everywhere, while round() halfway semantics differ per engine.
    * All-zero vectors get scale 0 and an all-zero code (guarded division).
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val scale = array_max(transform(v, x => abs(x.cast("double")))) / lit(127.0)
    df.withColumn("scale", scale)
      .withColumn("qvec",
        when(col("scale") === 0.0,
          transform(v, _ => lit(0L)))
          .otherwise(transform(v, x =>
            greatest(lit(-127L), least(lit(127L),
              floor(x.cast("double") / col("scale") + lit(0.5)))))))
  }

  /** Inverse of [[quantizeInt8]] — one multiply per element. */
  def dequantizeInt8(qvec: Column, scale: Column): Column =
    transform(qvec, q => q.cast("double") * scale)
}
