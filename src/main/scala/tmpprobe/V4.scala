package tmpprobe
import org.apache.spark.sql.SparkSession
object V4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]").appName("v4")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    val out = "target/verify_new"
    val names = args.toSeq
    for (n <- names) {
      try graft.SparkEntry.queries(n)(spark, d).write.mode("overwrite").parquet(s"$out/$n")
      catch { case e: Throwable => println(s"[verify] $n failed: ${e.getMessage.take(300)}") }
    }
    val sqls = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    val json = sqls.map { case (k, v) =>
      "\"" + k + "\": " + "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/oracle_sql.json"), json.getBytes)
    spark.stop()
  }
}
