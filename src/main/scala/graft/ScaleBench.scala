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

  private def mutateCopies(docs: DataFrame, copies: Int): DataFrame = {
    val n = docs.sparkSession.range(copies.toLong).toDF("__c")
    docs.crossJoin(n)
      .withColumn("doc_id", col("doc_id") + col("__c") * lit(10000000L))
      .withColumn("text",
        when(col("__c") === 0, col("text")).otherwise(
          // replace every 2nd token with a copy-hashed token: char-shingle
          // Jaccard between a copy and its source drops to ~0.3 — below
          // every near-dup threshold in the suite — so duplicate DENSITY
          // stays organic and growth measures corpus size, not clusters
          array_join(zip_with(
            split(col("text"), " "),
            sequence(lit(0), size(split(col("text"), " ")) - 1),
            (t, i) => when(i % 2 === 0,
              concat(lit("w"), pmod(hash(t, col("__c")), lit(99999))))
              .otherwise(t)), " ")))
      .drop("__c")
  }

  private def mutateEmb(emb: DataFrame, copies: Int): DataFrame = {
    val n = emb.sparkSession.range(copies.toLong).toDF("__c")
    emb.crossJoin(n)
      .withColumn("vec_id", col("vec_id") + col("__c") * lit(10000000L))
      .withColumn("embedding",
        transform(col("embedding"),
          (v, i) => when(i === pmod(col("__c"), size(col("embedding"))),
            v + col("__c").cast("float") * lit(0.37f)).otherwise(v)))
      .drop("__c")
  }

  private def buildScaled(spark: SparkSession, src: String, dst: String,
                          copies: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dst/_OK"))) return
    mutateCopies(spark.read.parquet(s"$src/documents.parquet"), copies)
      .repartition(math.max(4, copies))
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    mutateEmb(spark.read.parquet(s"$src/embeddings.parquet"), copies)
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

  /** Simhash candidates under the default single-slice scheme (d=3 → four
    * 16-bit slices over the token simhash — `simhashPairs`' exact keys).
    * At FIXED slice width this is asymptotically n²/buckets; the Manku
    * combinatorial variant (`simhashPairsCombinatorial`, more blocks) is
    * the documented knob that re-sparsifies it at the billion-doc scale.
    */
  private def simhashCandidates(spark: SparkSession, dir: String): Long = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val h = graft.ops.DedupOps.simhash(graft.ops.TextOps.tokens(col("text")))
    docs.select(h.as("sh"))
      .select(explode(array((0 until 4).map(s =>
        concat(lit(s), lit(":"),
          shiftrightunsigned(col("sh"), s * 16).bitwiseAND(lit(0xFFFFL)))): _*)).as("b"))
      .groupBy("b").count()
      .select((sum(col("count") * (col("count") - 1)) / 2).cast("long"))
      .head().getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d10 = "target/scale/sf1"
    val d100 = "target/scale/sf10"
    buildScaled(spark, base, d10, 10)
    buildScaled(spark, base, d100, 100)
    val family = Seq("q_dedup_exact", "q_dedup_hash", "q_dedup_minhash",
      "q_dedup_simhash", "q_dedup_near", "q_dedup_jaccard_global",
      "q_ngram_jaccard", "q_dedup_editdist", "q_dedup_cluster",
      "q_dedup_embedding", "q_similarity_topk", "q_similarity_lsh",
      "q_similarity_ivf", "q_embed_quantize")
    def time(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm: codegen + page cache
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def sec(v: Double) = f"$v%.3f"
    val rows = family.map { q =>
      val t1 = time(q, base)
      val t10 = time(q, d10)
      val exp = math.log10(math.max(t10, 1e-3) / math.max(t1, 1e-3))
      (q, t1, t10, exp)
    }
    val nDocs = Seq(base, d10, d100).map(d =>
      spark.read.parquet(s"$d/documents.parquet").count())
    val lsh = Seq(base, d10, d100).map(d => lshCandidates(spark, d))
    val sim = Seq(base, d10, d100).map(d => simhashCandidates(spark, d))
    def exps(v: Seq[Long]): Seq[Double] =
      v.sliding(2).map(p => math.log10(p(1).toDouble / p(0))).toSeq
    val qJson = rows.map { case (q, t1, t10, e) =>
      s""""$q":{"t1x":${sec(t1)},"t10x":${sec(t10)},"exp":${sec(e)}}"""
    }.mkString("{", ",", "}")
    val out =
      s"""{"metric":"scale","docs":[${nDocs.mkString(",")}],""" +
        s""""lsh_candidates":[${lsh.mkString(",")}],""" +
        s""""lsh_exponents":[${exps(lsh).map(sec).mkString(",")}],""" +
        s""""simhash_candidates":[${sim.mkString(",")}],""" +
        s""""simhash_exponents":[${exps(sim).map(sec).mkString(",")}],""" +
        s""""allpairs_1x":${nDocs.head * (nDocs.head - 1) / 2},""" +
        s""""allpairs_100x":${nDocs.last * (nDocs.last - 1) / 2},""" +
        s""""queries":$qJson}"""
    println(out)
    java.nio.file.Files.write(java.nio.file.Paths.get("target/scale_bench.json"),
      out.getBytes("UTF-8"))
    spark.stop()
  }
}
