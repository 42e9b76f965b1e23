package tmpprobe
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
object IvmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    val d = "/root/testdata/sf0.1"
    def phase[T](name: String)(f: => T): T = {
      Thread.sleep(200) // let listener drain
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      Thread.sleep(200)
      println(f"[ivmprobe] $name%-22s ${(System.nanoTime()-t0)/1e9}%6.2f s  jobs=${jobs.get()-j0}")
      r
    }
    // warm
    graft.SparkEntry.queries("q_ivm")(spark, d).count()
    println("[ivmprobe] --- steady run ---")
    val VT = graft.ops.VersionedTable
    import org.apache.spark.sql.functions._
    val src = s"/tmp/ivmprobe/src"; val view = s"/tmp/ivmprobe/view"
    val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path("/tmp/ivmprobe"), true)
    def cents(c: org.apache.spark.sql.Column) = floor(c * lit(100) + lit(0.5))
    val ord = graft.Tables.orders(spark, d)
    val snap = ord.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"), cents(col("o_totalprice")).as("cents"))
      .repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey")
    phase("create src")(VT.create(snap, src, statsCols = Seq("o_orderkey")))
    def refresh() = graft.ops.ViewOps.refreshAggView(spark, src, view,
      srcKeys = Seq("o_orderkey"), groupCols = Seq("o_orderstatus"),
      measures = Seq("cents"), appId = "probe")
    phase("bootstrap refresh")(refresh())
    val p1 = ord.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (cents(col("o_totalprice")) + lit(1000L)).as("cents"),
        (col("o_orderstatus") === "F").as("del"))
    phase("src merge 1")(VT.commitMergeUnique(p1, src, Seq("o_orderkey"), col("del")))
    phase("refresh fold 1")(refresh())
    val p2 = ord.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (cents(col("o_totalprice")) * lit(2L)).as("cents"),
        (col("o_orderstatus") === "O").as("del"))
    phase("src merge 2")(VT.commitMergeUnique(p2, src, Seq("o_orderkey"), col("del")))
    phase("refresh fold 2")(refresh())
    phase("replay noop")(refresh())
    phase("final read")(graft.ops.ViewOps.present(VT.read(spark, view), Seq("cents")).count())
    spark.stop()
  }
}
