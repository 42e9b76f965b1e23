package tmpprobe

object ProbeFloor {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .appName("floor").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[floor] $name ${(System.nanoTime()-t0)/1e9}%.3f")
    }
    Seq(("a",1L)).toDF("k","v").write.mode("overwrite").parquet("/tmp/floor/p")
    for (_ <- 1 to 3) {
      t("range_count") { spark.range(4).count(); () }
      t("local_collect") { Seq(("a",1L)).toDF("k","v").collect(); () }
      t("parquet_collect") { spark.read.parquet("/tmp/floor/p").collect(); () }
      t("parquet_collect_schema") {
        spark.read.schema("k string, v bigint").parquet("/tmp/floor/p").collect(); () }
      t("local_write") { Seq(("a",1L)).toDF("k","v").write.mode("overwrite").parquet("/tmp/floor/w"); () }
    }
    spark.stop()
  }
}
