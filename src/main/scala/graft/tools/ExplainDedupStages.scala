package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: plan capture for the dedup family's INTERNAL stages.
  *
  * The registered Jaccard/LSH queries materialize their candidate and
  * verification stages eagerly (localCheckpoint is the chunk sequencing
  * point), so the registered query's final `.explain` shows only
  * `Scan ExistingRDD` leaves — the stage plans this tool dumps are the
  * ones that actually run. It builds the banded relation exactly as
  * `escalatedLshPairs.bandedOf` does (posexplode of per-band slice
  * hashes over minhash signatures) and explains
  * [[graft.ops.DedupOps.bandedCandidatePairs]] twice:
  *
  *   - `banded_candidates_naive`: hot-bucket salting off
  *     (`spark.graft.dedup.lsh.saltBucketRows=0`) — the single
  *     self-join shape every round through r17 ran;
  *   - `banded_candidates_salted`: salt probe forced hot (probe floor
  *     1 byte, bucket threshold 64 rows) — the triangle-cover shape
  *     (broadcast hot list, explode to (p,q) cells, join on
  *     keys+(p,q)).
  *
  * Usage: ExplainDedupStages [--out DIR]
  */
object ExplainDedupStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = args.sliding(2).collectFirst {
      case Array("--out", d) => d }.getOrElse("plans")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(dir)
    val (bands, r, k) = (16, 4, 64)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sigs = graft.ops.DedupOps
      .minhashSignatures(docs, "doc_id", "text", n = 3, k = k)
    // the exact banded shape escalatedLshPairs explodes — built by the
    // SAME production code path (DedupOps.bandedExplode), so the captured
    // stage plan cannot silently diverge from what actually runs
    val banded = graft.ops.DedupOps.bandedExplode(sigs, r, 0, bands)
    def dump(name: String, confs: Seq[(String, String)]): Unit = {
      confs.foreach { case (key, v) => spark.conf.set(key, v) }
      val df = graft.ops.DedupOps
        .bandedCandidatePairs(banded, Nil, estFloor = 0.5)
        .select(col("id_a"), col("id_b")).distinct()
      val header = s"# dedup internal stage: $name (bands=$bands, r=$r, " +
        s"data=$sfDir)\n" +
        confs.map { case (key, v) => s"# conf $key=$v" }
          .mkString("", "\n", "\n\n")
      java.nio.file.Files.write(dir.resolve(s"$name.txt"),
        (header + df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)).getBytes("UTF-8"))
      println(s"wrote ${dir.resolve(s"$name.txt")}")
    }
    dump("banded_candidates_naive", Seq(
      graft.ops.DedupOps.SaltBucketRowsConf -> "0"))
    dump("banded_candidates_salted", Seq(
      graft.ops.DedupOps.SaltBucketRowsConf -> "64",
      graft.ops.DedupOps.SaltProbeMinBytesConf -> "1"))
    spark.stop()
  }
}
