package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling evidence for the dedup / similarity family: the blocking math
  * (banded LSH, prefix filters, simhash slices, IVF probes) promises
  * sub-quadratic growth — this harness MEASURES it. Since the driver
  * fixtures stop at sf0.1, it synthesizes 10× / 100× `documents` and
  * `embeddings` tables under `target/` by deterministic copy-mutation:
  * each copy rewrites every third token with a copy-tagged variant (and
  * perturbs one embedding lane), pushing copies OUTSIDE the near-dup
  * thresholds so the duplicate DENSITY stays that of the organic corpus
  * and growth reflects corpus size, not manufactured clusters.
  *
  * Output: one JSON line with, per query, wall seconds at 1× and 10×
  * (warm pass of two) and the implied scaling exponent
  * `log10(t10/t1)` (1.0 = linear, 2.0 = quadratic), plus LSH / simhash
  * candidate-PAIR counts at 1× / 10× / 100× with their decade exponents
  * — the direct measurement of what the blocking admits vs the ~n²/2
  * all-pairs baseline.
  */
object ScaleBench {

  private def buildScaled(spark: SparkSession, src: String, dst: String,
                          copies: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dst/_OK"))) return
    graft.tools.ScaleData.mutateDocs(
        spark.read.parquet(s"$src/documents.parquet"), copies)
      .repartition(math.max(4, copies))
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    graft.tools.ScaleData.mutateEmb(
        spark.read.parquet(s"$src/embeddings.parquet"), copies)
      .repartition(math.max(4, copies / 2))
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    // the family only reads documents/embeddings; the other tables pass
    // through at source scale for any incidental lookups
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events").foreach { t =>
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$src/$t.parquet"), fs,
        new org.apache.hadoop.fs.Path(s"$dst/$t.parquet"), false,
        spark.sparkContext.hadoopConfiguration)
    }
    fs.create(new org.apache.hadoop.fs.Path(s"$dst/_OK"), true).close()
  }

  /** LSH candidate pairs through the ENGINE's own banding
    * ([[graft.ops.DedupOps.minhashSignatures]] + [[graft.ops.DedupOps
    * .lshBandHashes]], the exact keys `minhashLshPairs` joins on): Σ over
    * (band, bucket) of C(n, 2) — what the banded join admits to
    * verification.
    */
  private def lshCandidates(spark: SparkSession, dir: String): Long = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    graft.ops.DedupOps.minhashSignatures(docs, "doc_id", "text", n = 3, k = 64)
      .select(posexplode(graft.ops.DedupOps.lshBandHashes(col("sig"),
        bands = 16, rowsPerBand = 4)).as(Seq("band", "bhash")))
      .groupBy("band", "bhash").count()
      .select((sum(col("count") * (col("count") - 1)) / 2).cast("long"))
      .head().getLong(0)
  }

  /** Simhash candidates under the single-slice scheme at the REGISTERED
    * query's d=8 (nine ~7-bit slices — `simhashPairs`' exact keys via
    * [[graft.ops.DedupOps.simhashSingleKeys]]). At FIXED slice width this
    * is asymptotically n²/2^(64/(d+1)); contrast with
    * [[simhashCombCandidates]], the scheme `simhashPairsAuto` routes to
    * above its corpus cap. (Through r11 this measured the d=3 scheme's
    * 16-bit slices — a different query than the registered d=8 one; the
    * two series are not comparable across rounds.)
    */
  private def simhashCandidates(spark: SparkSession, dir: String): Long = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val h = graft.ops.DedupOps.simhash(graft.ops.TextOps.tokens(col("text")))
    bucketPairs(
      docs.select(h.as("sh"))
        .select(posexplode(array(
          graft.ops.DedupOps.simhashSingleKeys(maxDistance = 8): _*))
          .as(Seq("q", "k"))),
      Seq("q", "k"))
  }

  /** Σ per-bucket C(n, 2) — the pair count a blocking key admits. */
  private def bucketPairs(df: DataFrame, keys: Seq[String]): Long =
    df.groupBy(keys.map(col): _*).count()
      .select((sum(col("count") * (col("count") - 1)) / 2).cast("long"))
      .head().getLong(0)

  /** Candidate pairs the FIXED-cardinality label blocking admits — the
    * r11 `weak`: |labels| does not grow with the corpus, so this measures
    * exponent ≈ 2 per decade. Kept as the baseline the clustered tier is
    * judged against.
    */
  private def labelCandidates(spark: SparkSession, dir: String): Long =
    bucketPairs(spark.read.parquet(s"$dir/embeddings.parquet"), Seq("label"))

  /** Candidate pairs IVF-cluster blocking admits at the cluster count
    * [[graft.ops.SimilarityOps.cosinePairsAbove]]'s scale tier would
    * pick for this corpus (c = n/[[graft.ops.SimilarityOps
    * .CosineClusterTargetRows]], nprobe = 4) — the EXACT
    * cluster-id keys its candidate join shuffles on. Per-bucket
    * populations stay ~constant as c grows with n, so the admitted pair
    * space grows linearly.
    */
  private def ivfCandidates(spark: SparkSession, dir: String): Long = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val c = math.max(16L, n / graft.ops.SimilarityOps.CosineClusterTargetRows).toInt
    val matrix = graft.ops.SimilarityOps.collectCentroids(
      graft.ops.SimilarityOps.ivfCentroids(
        emb.select(col("vec_id"), col("embedding")), c, iters = 2))
    bucketPairs(
      emb.select(explode(graft.functions.VectorExpressions.topCentroids(
        col("embedding"), matrix, math.min(4, c))).as("cl")),
      Seq("cl"))
  }

  /** Simhash candidates under the Manku combinatorial keys
    * [[graft.ops.DedupOps.simhashPairsAuto]] routes to above its corpus
    * cap (registered d=8 → B=11: C(11,3)=165 keys of ~17 bits/row vs the
    * single-slice scheme's 9 keys of ~7 bits) — the exact join keys,
    * via [[graft.ops.DedupOps.simhashCombKeys]].
    */
  private def simhashCombCandidates(spark: SparkSession, dir: String): Long = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val h = graft.ops.DedupOps.simhash(graft.ops.TextOps.tokens(col("text")))
    bucketPairs(
      docs.select(h.as("sh"))
        .select(posexplode(array(
          graft.ops.DedupOps.simhashCombKeys(maxDistance = 8, nBlocks = 11): _*))
          .as(Seq("q", "k"))),
      Seq("q", "k"))
  }

  /** MV-rewrite scaling probe ([[graft.plans.VtableViewRewrite]]): build a
    * fact table at `mult`× the base `orders`, maintain its grouped view,
    * apply a FIXED-size churn batch, and measure three walls —
    * (a) the grouped aggregate answered by the SCAN (rewrite registry
    * cleared), (b) the same query answered from the VIEW, (c) the
    * incremental refresh after the churn. The 100 TB claim being tested:
    * (a) grows with the table, (b) and (c) stay ~flat — the view answer
    * is O(groups) and the refresh O(changed files + touched groups).
    */
  private def mvProbe(spark: SparkSession, base: String, mult: Int,
                      work: String): (Double, Double, Double) = {
    import graft.ops.{VersionedTable => VT, ViewOps}
    graft.functions.GraftFunctions.register(spark) // installs the rewrite rule
    val src = s"$work/src"; val view = s"$work/view"
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(work), true)
    val orders0 = spark.read.parquet(s"$base/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * lit(100) + lit(0.5)).as("cents"))
    val scaled =
      if (mult == 1) orders0
      else orders0.crossJoin(spark.range(mult.toLong).toDF("__c"))
        .withColumn("o_orderkey",
          col("o_orderkey") + col("__c") * lit(1000000000L))
        .drop("__c")
    VT.create(scaled.repartition(math.min(64, math.max(4, mult))), src,
      statsCols = Seq("o_orderkey"))
    def refresh(): Long = ViewOps.refreshAggView(spark, src, view,
      Seq("o_orderkey"), Seq("o_orderpriority"), Seq("cents"),
      appId = "scale-mv")
    refresh() // bootstrap
    // fixed-size churn regardless of table size: the refresh cost being
    // measured is the INCREMENTAL one. First churn+refresh warms (plan
    // caches, codegen); the second is the reported wall.
    def churn(off: Long): Unit = VT.commitAppend(orders0.limit(1000)
      .withColumn("o_orderkey", col("o_orderkey") + lit(off)), src)
    churn(100000000000L); refresh()
    churn(200000000000L)
    val r0 = System.nanoTime(); refresh()
    val tRefresh = (System.nanoTime() - r0) / 1e9
    def agg(): DataFrame = VT.read(spark, src).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
    def timed(body: => Unit): Double = {
      body // warm
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); body
      (System.nanoTime() - t0) / 1e9
    }
    // force the scan answer: the registry is durable now (sidecars under
    // the source), so clearing the in-memory map no longer disables the
    // rewrite — the kill-switch conf does
    spark.conf.set("spark.graft.mv.rewrite", "false")
    val tScan = timed(agg().collect())
    spark.conf.set("spark.graft.mv.rewrite", "true")
    refresh() // no-op fold; re-registers the view for rewrite
    val tView = timed {
      val q = agg()
      val scans = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
            if lr.getTagValue(VT.pruneTag).isDefined =>
          lr.getTagValue(VT.pruneTag).get._1
      }.toSet
      require(scans == Set(view), s"mvProbe: expected the view answer, got $scans")
      q.collect()
    }
    (tScan, tView, tRefresh)
  }

  /** MEASURED recall of the budget-escalated LSH tiers on `dir`'s corpus
    * (the stated ≥ 1−(1−t^r)^b − tail bound is analytic; this measures
    * it). Ground truth is EXACT verification over a deterministic
    * 1-in-`invP` doc subsample — Jaccard is a pairwise property, so the
    * full-corpus truth restricted to sampled endpoints equals
    * exact-on-sample, and the subsample is small enough for the brute
    * tier. Found = the budgeted FULL-corpus run (the escalation must
    * engage: asserted via [[graft.ops.DedupOps.lastCapReport]])
    * restricted to sampled endpoints. Both sides verify exactly, so
    * found ⊆ truth and recall = |found|/|truth|.
    *
    * Returns (recall, found, truth, statedBound) for the global path at
    * `tGlobal` and the blocked path at `tBlocked`.
    */
  def recallProbe(spark: SparkSession, dir: String,
                  invPGlobal: Long, invPBlocked: Long,
                  tGlobal: Double = 0.8, tBlocked: Double = 0.6)
      : ((Double, Long, Long, Double), (Double, Long, Long, Double)) = {
    import graft.ops.DedupOps
    val docs = Tables.documents(spark, dir)
    def sampleAt(invP: Long): DataFrame = docs
      .filter(pmod(xxhash64(col("doc_id")), lit(invP)) === 0)
      .localCheckpoint()
    def restrict(pairs: DataFrame, sampled: DataFrame): Long = {
      val ids = broadcast(sampled.select(col("doc_id")))
      pairs
        .join(ids.select(col("doc_id").as("id_a")), Seq("id_a"), "left_semi")
        .join(ids.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
        .count()
    }
    // by-name + explicit sequencing: the budget probe (and lastCapReport)
    // fires at DataFrame CONSTRUCTION, so the truth plan must build and
    // assert its exactness before the budgeted plan builds
    def one(sampled: DataFrame, truth: => DataFrame, full: => DataFrame)
        : (Double, Long, Long, Double) = {
      // the brute tier returns before the budget match and so never
      // touches lastCapReport — clear any stale report from earlier
      // timed queries before asserting the truth run stayed exact
      DedupOps.lastCapReport = None
      val t = truth.count()
      require(t > 0, "recallProbe: empty ground truth — enlarge the sample")
      require(DedupOps.lastCapReport.isEmpty,
        "recallProbe: truth run must stay exact")
      val fullDf = full // construction runs the budget probe
      val bound = DedupOps.lastCapReport match {
        case Some(r) => r.recallBoundAtThreshold
        case None => sys.error(
          "recallProbe: the budgeted run did not escalate — probe at a " +
            "corpus size where the budget binds")
      }
      val f = restrict(fullDf, sampled)
      (f.toDouble / t, f, t, bound)
    }
    val sg = sampleAt(invPGlobal)
    val g = one(sg,
      // truth through the BITSET BRUTE tier (bruteMaxDocs raised over the
      // sample size): verification runs inside the broadcast nested-loop
      // join condition, so no candidate set ever materializes to shuffle
      // disk — the prefix path's distinct would spill O(Σ C(df,2)) rows
      // on this adversarially dense corpus
      DedupOps.jaccardPairsGlobal(sg, "doc_id", "text", 3, tGlobal,
        bruteMaxDocs = 1000000L),
      DedupOps.jaccardPairsGlobal(docs, "doc_id", "text", 3, tGlobal,
        candidatePairBudget = Some(Queries.JaccardCandidateBudget)))
    val sb = sampleAt(invPBlocked)
    val b = one(sb,
      DedupOps.jaccardPairsBlocked(sb, "doc_id", "text", "source",
        3, tBlocked),
      DedupOps.jaccardPairsBlocked(docs, "doc_id", "text", "source",
        3, tBlocked,
        candidatePairBudget = Some(Queries.JaccardCandidateBudget)))
    (g, b)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.fs.FastLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def sec(v: Double) = f"$v%.3f"
    val d10 = "target/scale/sf1"
    val d100 = "target/scale/sf10"
    buildScaled(spark, base, d10, 10)
    buildScaled(spark, base, d100, 100)
    // measured recall of the budget-escalated LSH tiers at 100x — the
    // decade where the candidate budget binds (global: 1-in-4 subsample for
    // a CI-tight truth-pair count; blocked: 1-in-25)
    def recallJson(): String = {
      val ((gr, gf, gt, gb), (br, bf, bt, bb)) = recallProbe(spark, d100, invPGlobal = 8L, invPBlocked = 25L)
      println(f"[scalebench] measured recall global: $gr%.4f ($gf/$gt, stated >= $gb%.4f) " +
        f"blocked: $br%.4f ($bf/$bt, stated >= $bb%.4f)")
      f""""recall_global":{"measured":$gr%.4f,"found":$gf,"truth":$gt,"stated_bound":$gb%.4f},""" +
        f""""recall_blocked":{"measured":$br%.4f,"found":$bf,"truth":$bt,"stated_bound":$bb%.4f}"""
    }
    // THIRD decade (5M docs / 2M embeddings): the 100 TB posture rests
    // on exponents measured to 500k docs; this mode extends the ladder
    // one more decade for the families whose scale path must flatten it
    // — the budget-escalated Jaccard pair (the escalation is precisely
    // what must hold the exponent near 1), banded MinHash-LSH, and the
    // IVF similarity family. Separate mode: ~1k-partition build + long
    // timed runs; emits target/scale_decade3.json with per-query
    // third-decade exponents and the budget-escalation trace
    // (lastCapReport) for the escalated queries.
    if (args.contains("--third-decade")) {
      val d1000 = "target/scale/sf100"
      buildScaled(spark, base, d1000, 1000)
      // finer chunking at this scale: one band-group's shuffle + verify
      // scratch for 5M docs is ~the host's whole free disk at the
      // default ~4-bands/chunk — 2 bands/chunk halves the peak; recorded
      // in the artifact (band_chunks) so the exponents are attributable
      val bandChunks = sys.env.getOrElse("SPARK_GRAFT_BAND_CHUNKS", "6")
      spark.conf.set(graft.ops.DedupOps.LshBandChunksConf, bandChunks)
      // candidate counts first and queries cheap→expensive: every line
      // streams to the log as it lands, so a wall-clock-bounded run
      // still yields the full candidate ladder and the cheap families
      // before the big Jaccard pair queries start
      val lsh3 = Seq(d100, d1000).map(lshCandidates(spark, _))
      val ivf3 = Seq(d100, d1000).map(ivfCandidates(spark, _))
      println(s"[scalebench] decade3 lsh_candidates=${lsh3.mkString(",")} " +
        s"ivf_candidates=${ivf3.mkString(",")}")
      val qs = Seq("q_dedup_minhash", "q_dedup_embedding_ivf",
        "q_similarity_ivf", "q_dedup_jaccard_global", "q_ngram_jaccard")
      def timed(name: String, dir: String): (Double, Option[String]) = {
        val fn = SparkEntry.queries(name)
        graft.ops.DedupOps.lastCapReport = None
        fn(spark, dir).count() // warm
        val cap = graft.ops.DedupOps.lastCapReport.map(r =>
          s"""{"candidates_before":${r.candidatesBefore},"budget":${r.budget},""" +
            s""""bands":${r.bands},"rows_per_band":${r.rowsPerBand},""" +
            f""""recall_bound":${r.recallBoundAtThreshold}%.4f}""")
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, cap)
      }
      // a single leg failing (the 5M-doc ngram leg once exhausted the
      // HOST's free disk mid-shuffle) must not lose the whole artifact:
      // record the leg as dnf and keep going. Each of the two timed runs
      // is caught independently so a 1000x failure still records the
      // measured t100x (+cap trace). Only NonFatal throws are recorded as
      // a clean dnf; a fatal JVM error (OutOfMemoryError etc.) marks the
      // whole artifact degraded — walls measured after it ran in a
      // possibly compromised JVM and must not read as valid.
      var fatalSeen: Option[String] = None
      def errHead(e: Throwable): String = {
        val raw = Option(e.getMessage).getOrElse("")
        val head = raw.linesIterator.toSeq.headOption.getOrElse("")
        val base = if (head.isEmpty) e.getClass.getSimpleName else head.take(160)
        // JSON-safe: strip control chars, escape backslash, swap quotes
        base.replace("\\", "/").replace("\"", "'").filter(c => c >= ' ')
      }
      def tryLeg(q: String, dir: String, label: String): Either[String, (Double, Option[String])] =
        try Right(timed(q, dir))
        catch {
          case e if scala.util.control.NonFatal(e) =>
            val msg = errHead(e)
            println(s"[scalebench] decade3 $q $label DNF: $msg")
            Left(msg)
          case e: Throwable =>
            val msg = errHead(e)
            fatalSeen = fatalSeen.orElse(Some(s"$q $label: $msg"))
            println(s"[scalebench] decade3 $q $label FATAL (artifact degraded): $msg")
            Left(msg)
        }
      val rows3 = qs.map { q =>
        tryLeg(q, d100, "t100x") match {
          case Left(msg) => (q, None, None, None, Some(msg))
          case Right((t100, _)) =>
            println(f"[scalebench] decade3 $q t100x=$t100%.1f s")
            tryLeg(q, d1000, "t1000x") match {
              case Right((t1000, cap)) =>
                val exp3 = math.log10(math.max(t1000, 1e-3) / math.max(t100, 1e-3))
                println(f"[scalebench] decade3 $q t1000x=$t1000%.1f s exp3=$exp3%.2f" +
                  cap.map(c => s" cap=$c").getOrElse(""))
                (q, Some((t100, t1000, exp3)), cap, None, None: Option[String])
              case Left(msg) =>
                // keep the measured 100x wall beside the dnf, plus whatever
                // escalation trace the failed 1000x attempt got far enough
                // to record (lastCapReport was reset at its start)
                val cap100 = graft.ops.DedupOps.lastCapReport.map(r =>
                  s"""{"candidates_before":${r.candidatesBefore},"budget":${r.budget},""" +
                    s""""bands":${r.bands},"rows_per_band":${r.rowsPerBand},""" +
                    f""""recall_bound":${r.recallBoundAtThreshold}%.4f}""")
                (q, None, cap100, Some(t100), Some(msg))
            }
        }
      }
      def dexp(v: Seq[Long]): String =
        sec(math.log10(math.max(v(1), 1).toDouble / math.max(v(0), 1)))
      val qj = rows3.map {
        case (q, Some((t100, t1000, e)), cap, _, _) =>
          s""""$q":{"t100x":${sec(t100)},"t1000x":${sec(t1000)},""" +
            s""""exp3":${sec(e)}${cap.map(c => s""","cap":$c""").getOrElse("")}}"""
        case (q, None, cap, t100, err) =>
          s""""$q":{${t100.map(t => s""""t100x":${sec(t)},""").getOrElse("")}""" +
            s""""dnf":"${err.getOrElse("")}"""" +
            s"""${cap.map(c => s""","cap":$c""").getOrElse("")}}"""
      }.mkString("{", ",", "}")
      val nd = Seq(d100, d1000).map(d =>
        spark.read.parquet(s"$d/documents.parquet").count())
      val out = s"""{"metric":"scale_decade3","docs":[${nd.mkString(",")}],""" +
        fatalSeen.map(f => s""""degraded":"${f.replace("\\", "/").replace("\"", "'").filter(_ >= ' ')}",""").getOrElse("") +
        s""""band_chunks":$bandChunks,""" +
        s""""lsh_candidates":[${lsh3.mkString(",")}],""" +
        s""""lsh_exponent3":${dexp(lsh3)},""" +
        s""""emb_ivf_candidates":[${ivf3.mkString(",")}],""" +
        s""""emb_ivf_exponent3":${dexp(ivf3)},""" +
        s""""queries":$qj}"""
      println(out)
      java.nio.file.Files.write(
        java.nio.file.Paths.get("target/scale_decade3.json"),
        out.getBytes("UTF-8"))
      spark.stop()
      return
    }
    if (args.contains("--recall-only")) {
      val out = s"""{"metric":"scale_recall",${recallJson()}}"""
      println(out)
      java.nio.file.Files.write(
        java.nio.file.Paths.get("target/scale_recall.json"),
        out.getBytes("UTF-8"))
      spark.stop()
      return
    }
    val family = Seq("q_dedup_exact", "q_dedup_hash", "q_dedup_minhash",
      "q_dedup_simhash", "q_dedup_near", "q_dedup_jaccard_global",
      "q_ngram_jaccard", "q_dedup_editdist", "q_dedup_cluster",
      "q_dedup_embedding", "q_dedup_embedding_ivf", "q_similarity_topk",
      "q_similarity_lsh", "q_similarity_ivf", "q_embed_quantize")
    // Second-decade wall timing (500k docs / 200k embeddings) for the
    // SCALE-SAFE subset — the decade where the cost tiers ENGAGE
    // (simhash routes to Manku keys above 100k docs, embedding near-dup
    // to IVF-cluster blocking above 100k rows, and — since r16 — the
    // global-Jaccard family's candidate budget escalates its generator
    // to MinHash-LSH once the prefix-bucket total crosses 3e9, and the
    // BLOCKED path's exact block-histogram budget does the same for
    // q_ngram_jaccard), so the registered queries are measured running
    // their scale path, not just having its candidate counts projected.
    val family100 = Set("q_dedup_exact", "q_dedup_hash", "q_dedup_minhash",
      "q_dedup_simhash", "q_dedup_embedding_ivf", "q_similarity_topk",
      "q_similarity_lsh", "q_similarity_ivf", "q_embed_quantize",
      "q_dedup_near", "q_dedup_jaccard_global", "q_ngram_jaccard")
    def time(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm: codegen + page cache
      // Bench.scala's inter-pass hygiene, for the same reason: a
      // checkpoint-bearing query re-materializes NEW blocks while the
      // warm pass's orphans still hold storage memory, and the timed run
      // lands multi-x slower (bit q_dedup_near at 10x: 165 s vs 31 s)
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val rows = family.map { q =>
      val t1 = time(q, base)
      val t10 = time(q, d10)
      val exp = math.log10(math.max(t10, 1e-3) / math.max(t1, 1e-3))
      val t100 = if (family100(q)) Some(time(q, d100)) else None
      val exp2 = t100.map(t => math.log10(math.max(t, 1e-3) / math.max(t10, 1e-3)))
      (q, t1, t10, exp, t100, exp2)
    }
    val nDocs = Seq(base, d10, d100).map(d =>
      spark.read.parquet(s"$d/documents.parquet").count())
    val lsh = Seq(base, d10, d100).map(d => lshCandidates(spark, d))
    val sim = Seq(base, d10, d100).map(d => simhashCandidates(spark, d))
    val simComb = Seq(base, d10, d100).map(d => simhashCombCandidates(spark, d))
    val lbl = Seq(base, d10, d100).map(d => labelCandidates(spark, d))
    val ivf = Seq(base, d10, d100).map(d => ivfCandidates(spark, d))
    def exps(v: Seq[Long]): Seq[Double] =
      v.sliding(2).map(p => math.log10(math.max(p(1), 1).toDouble / math.max(p(0), 1)))
        .toSeq
    val qJson = rows.map { case (q, t1, t10, e, t100, e2) =>
      val tail = (t100, e2) match {
        case (Some(t), Some(x)) => s""","t100x":${sec(t)},"exp2":${sec(x)}"""
        case _ => ""
      }
      s""""$q":{"t1x":${sec(t1)},"t10x":${sec(t10)},"exp":${sec(e)}$tail}"""
    }.mkString("{", ",", "}")
    // MV-rewrite scaling: scan wall should track table size; the view
    // answer and the fixed-churn refresh should not
    val mvSizes = Seq(1, 10, 100, 1000)
    val mv = mvSizes.map(m => mvProbe(spark, base, m, s"target/scale/mv$m"))
    val out =
      s"""{"metric":"scale","docs":[${nDocs.mkString(",")}],""" +
        s""""mv_mults":[${mvSizes.mkString(",")}],""" +
        s""""mv_scan_secs":[${mv.map(t => sec(t._1)).mkString(",")}],""" +
        s""""mv_view_secs":[${mv.map(t => sec(t._2)).mkString(",")}],""" +
        s""""mv_refresh_secs":[${mv.map(t => sec(t._3)).mkString(",")}],""" +
        s""""lsh_candidates":[${lsh.mkString(",")}],""" +
        s""""lsh_exponents":[${exps(lsh).map(sec).mkString(",")}],""" +
        s""""simhash_candidates":[${sim.mkString(",")}],""" +
        s""""simhash_exponents":[${exps(sim).map(sec).mkString(",")}],""" +
        s""""simhash_comb_candidates":[${simComb.mkString(",")}],""" +
        s""""simhash_comb_exponents":[${exps(simComb).map(sec).mkString(",")}],""" +
        s""""emb_label_candidates":[${lbl.mkString(",")}],""" +
        s""""emb_label_exponents":[${exps(lbl).map(sec).mkString(",")}],""" +
        s""""emb_ivf_candidates":[${ivf.mkString(",")}],""" +
        s""""emb_ivf_exponents":[${exps(ivf).map(sec).mkString(",")}],""" +
        s""""allpairs_1x":${nDocs.head * (nDocs.head - 1) / 2},""" +
        s""""allpairs_100x":${nDocs.last * (nDocs.last - 1) / 2},""" +
        recallJson() + "," +
        s""""queries":$qJson}"""
    println(out)
    java.nio.file.Files.write(java.nio.file.Paths.get("target/scale_bench.json"),
      out.getBytes("UTF-8"))
    spark.stop()
  }
}
