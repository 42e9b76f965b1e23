package tmpprobe

import org.apache.spark.sql.functions._

object ProbeBucket {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("probebucket")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id").as("id"), col("text"),
        graft.ops.DedupOps.sortedShingles(col("text"), 3).as("sh"))
    val sigs = docs.select(col("id"), col("text"), size(col("sh")).as("nsh"),
      graft.ops.DedupOps.minhashSignature(col("sh"), 64).as("sig"))
    val banded = sigs.select(col("id"), col("text"), col("nsh"),
      posexplode(graft.ops.DedupOps.lshBandHashes(col("sig"), 16, 4))
        .as(Seq("band", "bhash")))
    val big = banded.groupBy("band", "bhash").count()
      .orderBy(desc("count")).limit(1).collect()(0)
    println(s"[bkt] biggest bucket band=${big.get(0)} hash=${big.get(1)} n=${big.get(2)}")
    val members = banded.filter(col("band") === big.get(0) && col("bhash") === big.get(1))
      .select("id", "nsh", "text").orderBy("id").limit(8).collect()
    members.foreach(r => println(s"[bkt] id=${r.get(0)} nsh=${r.get(1)} text='${r.getString(2).take(60)}'"))
    spark.stop()
  }
}
