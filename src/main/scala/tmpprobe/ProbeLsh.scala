package tmpprobe

import org.apache.spark.sql.functions._

object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("probelsh")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id").as("id"),
        graft.ops.DedupOps.sortedShingles(col("text"), 3).as("sh"))
    val sigs = docs.select(col("id"),
      graft.ops.DedupOps.minhashSignature(col("sh"), 60).as("sig"))
    val banded = sigs.select(col("id"),
      posexplode(graft.ops.DedupOps.lshBandHashes(col("sig"), 12, 5))
        .as(Seq("band", "bhash")))
    var t0 = System.nanoTime()
    // bucket-size histogram: candidate volume = sum C(sz,2) per bucket
    val hist = banded.groupBy("band", "bhash").count()
      .groupBy("count").agg(count(lit(1)).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cands = hist.map { case (c, m) => m * c * (c-1) / 2 }.sum
    val top = hist.sortBy(-_._1).take(5).toSeq
    println(f"[lsh] $d buckets-hist-top=$top candPairs=$cands sec=${(System.nanoTime()-t0)/1e9}%.1f")
    spark.stop()
  }
}
