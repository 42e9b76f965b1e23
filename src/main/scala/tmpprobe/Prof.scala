package tmpprobe
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    graft.SparkEntry.queries("q_count")(spark, d).collect()
    for (n <- args.toSeq; _ <- 1 to 2) {
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, d).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROF $n%-24s $sec%8.3f s  rows=$cnt")
    }
    spark.stop()
  }
}
