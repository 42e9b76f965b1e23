package tmpprobe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object J {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("j")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r
    }
    val docs = graft.Tables.documents(spark, d).select(col("doc_id").as("id"),
      graft.ops.DedupOps.sortedShingles(col("text"), 3).as("sh"))
    // warm
    docs.count()
    t("docs.count")(docs.count())
    val toks = t("toks.distinct"){ val x = docs.select(explode(col("sh")).as("tok")).distinct(); x.count(); x }
    t("full_query"){ graft.ops.DedupOps.jaccardPairsGlobal(
      graft.Tables.documents(spark, d), "doc_id", "text", 3, 0.6).count() }
    t("full_query2"){ graft.ops.DedupOps.jaccardPairsGlobal(
      graft.Tables.documents(spark, d), "doc_id", "text", 3, 0.6).count() }
    spark.stop()
  }
}
