package tmpprobe

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

object ProbeIvm {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .appName("probeivm").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE","true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    // warm up tables/JVM once, then run twice, timing phases on run 2
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.get("PROBE_JOBS").contains("1")) {
          val st = e.stageInfos.map(si => si.name.take(70)).mkString(" | ")
          println(s"[job] stages=${e.stageInfos.size} $st")
        }
      }
    })
    def phase[T](name: String, on: Boolean)(f: => T): T = {
      if (on && sys.env.get("PROBE_JOBS").contains("1")) println(s"[begin] $name")
      val t0 = System.nanoTime(); val j0 = jobs.get()
      val r = f
      if (on) println(f"[ivm] $name ${(System.nanoTime()-t0)/1e9}%.3f jobs=${jobs.get()-j0}")
      r
    }
    for (round <- 1 to 3) {
      val on = round == 3
      val VT = graft.ops.VersionedTable
      val src = s"/tmp/ivmprobe/src$round"
      val view = s"/tmp/ivmprobe/view$round"
      val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path("/tmp/ivmprobe"), true)
      def cents(c: Column): Column = floor(c * lit(100) + lit(0.5))
      def ord = graft.Tables(s, d, "orders")
      val snap = ord.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"), cents(col("o_totalprice")).as("cents"))
        .repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey")
      phase("create_src", on) { VT.create(snap, src, statsCols = Seq("o_orderkey")) }
      def refresh(n: String): Unit = phase(n, on) {
        graft.ops.ViewOps.refreshAggView(s, src, view,
          srcKeys = Seq("o_orderkey"), groupCols = Seq("o_orderstatus"),
          measures = Seq("cents"), appId = "q_ivm")
      }
      refresh("bootstrap")
      val p1 = ord.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (cents(col("o_totalprice")) + lit(1000L)).as("cents"),
          (col("o_orderstatus") === "F").as("del"))
      phase("merge1", on) { VT.commitMergeUnique(p1, src, Seq("o_orderkey"), col("del")) }
      refresh("refresh1")
      val p2 = ord.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (cents(col("o_totalprice")) * lit(2L)).as("cents"),
          (col("o_orderstatus") === "O").as("del"))
      phase("merge2", on) { VT.commitMergeUnique(p2, src, Seq("o_orderkey"), col("del")) }
      refresh("refresh2")
      refresh("replay")
      phase("final_read", on) {
        graft.ops.ViewOps.present(VT.read(s, view), Seq("cents"))
          .select(col("o_orderstatus"), col("n"), col("sum_cents").cast("double").as("sum_cents"))
          .orderBy("o_orderstatus").collect()
      }
    }
    spark.stop()
  }
}
