package tmpprobe
import org.apache.spark.sql.functions._
object P2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.fs.FastLocalFileSystem].getName)
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      (0 until 4).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"$name%-34s rep$i ${(System.nanoTime()-t0)/1e9}%7.3f s (n=$n)")
      }
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    t("raw count")(docs.count())
    t("repart(32,id) count")(docs.repartition(32, col("doc_id")).count())
    t("shingle count (no spread)")(docs.select(graft.ops.DedupOps.sortedShingles(col("text"),3).as("sh")).select(sum(size(col("sh")))).head().getLong(0))
    t("spread+shingle count")(docs.repartition(32, col("doc_id")).select(graft.ops.DedupOps.sortedShingles(col("text"),3).as("sh")).select(sum(size(col("sh")))).head().getLong(0))
    spark.stop()
  }
}
