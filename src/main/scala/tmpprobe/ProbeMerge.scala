package tmpprobe

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

object ProbeMerge {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("probemerge").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[T](name: String, on: Boolean)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      if (on) println(f"[pm] $name ${(System.nanoTime()-t0)/1e9}%.3f")
      r
    }
    for (round <- 1 to 3) {
      val on = round == 3
      // tiny write cost baseline: 3-row local df -> parquet
      val local3 = Seq(("F", 1L, 2L), ("O", 2L, 3L), ("P", 3L, 4L))
        .toDF("k", "n", "sum")
      t("write_local3", on) {
        local3.write.mode("overwrite").parquet(s"/tmp/pmprobe/w$round")
      }
      // read 1 small parquet + join + write
      t("read_join_write", on) {
        val base = spark.read.parquet(s"/tmp/pmprobe/w$round")
        base.join(local3.withColumnRenamed("n", "n2").withColumnRenamed("sum", "s2"), Seq("k"), "full_outer")
          .write.mode("overwrite").parquet(s"/tmp/pmprobe/x$round")
      }
      t("collect_small", on) {
        spark.read.parquet(s"/tmp/pmprobe/w$round").collect()
      }
    }
    spark.stop()
  }
}
