package tmpprobe

// Scratch main (deleted before round end): dump ONLY the named queries +
// their oracle entries so tools/check.py can gate them in seconds.
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args.take(3)
    val qs = names.split(",").toSeq
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    qs.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        df.write.mode("overwrite").parquet(s"$outDir/$n")
        println(s"[probe] $n ok")
      } catch { case e: Throwable =>
        println(s"[probe] $n failed: ${e.getMessage}"); e.printStackTrace() }
    }
    val oracle = graft.SparkEntry.oracleSql.filter(kv => qs.contains(kv._1))
    val json = oracle.map { case (k, v) =>
      "\"" + k + "\": " + "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
