package tmpprobe
import org.apache.spark.sql.SparkSession
object IvmTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("AQE","true")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    graft.Tables.orders(spark, d).count()
    def spin(): Double = {
      val t0 = System.nanoTime(); var x = 0x9E3779B97F4A7C15L; var i = 0
      while (i < 400000000) { x = x * 6364136223846793005L + 1442695040888963407L; x ^= x >>> 33; i += 1 }
      if (x == 42) println("")
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 7).foreach { i =>
      val c0 = spin()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_ivm")(spark, d).count()
      println(f"[ivmtime] run$i ${(System.nanoTime()-t0)/1e9}%.2f s cal=$c0%.2f")
    }
    spark.stop()
  }
}
