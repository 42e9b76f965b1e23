package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** Scratch: pair counts/recall for the embedding near-dup tiers. */
object EmbProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(s, d).cache()
    println(s"rows=${emb.count()}")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteGlobal = pairs(SimilarityOps.cosinePairsClustered(emb, None, 0.35, c = 1))
    println(s"brute global pairs=${bruteGlobal.size}")
    val labelBlocked = pairs(SimilarityOps.cosinePairsAbove(emb, "label", 0.35))
    println(s"label-blocked pairs=${labelBlocked.size}")
    for (np <- Seq(2, 4, 8)) {
      val ivf = pairs(SimilarityOps.cosinePairsClustered(emb, None, 0.35,
        c = 16, nprobe = np, iters = 2))
      val rec = if (bruteGlobal.isEmpty) 1.0
        else bruteGlobal.intersect(ivf).size.toDouble / bruteGlobal.size
      println(f"ivf c=16 nprobe=$np pairs=${ivf.size} recall=$rec%.3f subset=${ivf.subsetOf(bruteGlobal)}")
    }
    val tierIvf = pairs(SimilarityOps.cosinePairsAbove(emb, "label", 0.35,
      bruteMaxRows = 0))
    val recL = if (labelBlocked.isEmpty) 1.0
      else labelBlocked.intersect(tierIvf).size.toDouble / labelBlocked.size
    println(f"tiered(blocked) pairs=${tierIvf.size} recallVsLabel=$recL%.3f subset=${tierIvf.subsetOf(labelBlocked)}")
    s.stop()
  }
}
