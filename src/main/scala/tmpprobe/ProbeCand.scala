package tmpprobe

object ProbeCand {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").appName("probecand")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", false)
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = args(0).split(",")
    args.drop(1).foreach { d =>
      qs.foreach { q =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, d).count()
        val dt = (System.nanoTime()-t0)/1e9
        println(f"[cand] $d $q rows=$n report=${graft.ops.DedupOps.lastCapReport} sec=$dt%.1f")
      }
    }
    spark.stop()
  }
}
