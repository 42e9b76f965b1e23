package tmpprobe

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

object ProbeIvm2 {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .appName("probeivm2").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.get("PROBE_JOBS").contains("1"))
          println(s"[jobstage] ${e.stageInfos.map(_.name.take(70)).mkString(" | ")}")
      }
    })
    def t[T](name: String, on: Boolean)(f: => T): T = {
      val t0 = System.nanoTime(); val j0 = jobs.get(); val r = f
      if (on) println(f"[ivm2] $name ${(System.nanoTime()-t0)/1e9}%.3f jobs=${jobs.get()-j0}")
      r
    }
    for (round <- 1 to 3) {
      val on = round == 3
      val VT = graft.ops.VersionedTable
      val src = s"/tmp/ivmprobe2/src$round"
      new org.apache.hadoop.fs.Path(src).getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path("/tmp/ivmprobe2"), true)
      def cents(c: Column): Column = floor(c * lit(100) + lit(0.5))
      def ord = graft.Tables(s, d, "orders")
      val snap = ord.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"), cents(col("o_totalprice")).as("cents"))
        .repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey")
      VT.create(snap, src, statsCols = Seq("o_orderkey"))
      val p1 = ord.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (cents(col("o_totalprice")) + lit(1000L)).as("cents"),
          (col("o_orderstatus") === "F").as("del"))
      VT.commitMergeUnique(p1, src, Seq("o_orderkey"), col("del"))
      // refresh internals, v1->v2 window
      val signed = t("signedRowsBetween", on) { VT.signedRowsBetween(s, src, 1L, 2L).get }
      val delta = t("aggSigned+collect", on) {
        graft.ops.ViewOps.aggSigned(signed, Seq("o_orderstatus"), Seq("cents")).collect()
      }
      if (on) println(s"[ivm2] delta rows=${delta.length}")
      // simulate the view merge: a tiny local changelog into a 3-row table
      val view = s"/tmp/ivmprobe2/view$round"
      val state = graft.ops.ViewOps.fullState(VT.read(s, src, Some(1L)),
        Seq("o_orderstatus"), Seq("cents"))
      t("view_create", on) { VT.create(state, view, statsCols = Seq("o_orderstatus")) }
      val local = s.createDataFrame(java.util.Arrays.asList(delta: _*), delta.head.schema)
        .withColumn("__dead", lit(false))
      t("view_merge_local", on) {
        VT.commitMergeUnique(local, view, Seq("o_orderstatus"), deleteCond = col("__dead"))
      }
    }
    spark.stop()
  }
}
