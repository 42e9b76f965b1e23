package tmpprobe
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
object IvmJobs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit = {
        val root = qe.analyzed.getClass.getSimpleName
        println(f"[act] ${Thread.currentThread.getName.take(4)} $fn%-18s ${ns/1e9}%6.3f s  $root")
      }
      override def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    val d = "/root/testdata/sf0.1"
    graft.SparkEntry.queries("q_ivm")(spark, d).count() // warm
    Thread.sleep(300)
    println("=== steady ===")
    val VT = graft.ops.VersionedTable
    import org.apache.spark.sql.functions._
    val src = s"/tmp/ivmjobs/src"; val view = s"/tmp/ivmjobs/view"
    val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path("/tmp/ivmjobs"), true)
    def cents(c: org.apache.spark.sql.Column) = floor(c * lit(100) + lit(0.5))
    val ord = graft.Tables.orders(spark, d)
    val snap = ord.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"), cents(col("o_totalprice")).as("cents"))
      .repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey")
    def ph(name: String)(f: => Any): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); f
      Thread.sleep(300)
      println(f"[phase] $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    ph("create")(VT.create(snap, src, statsCols = Seq("o_orderkey")))
    def refresh() = graft.ops.ViewOps.refreshAggView(spark, src, view,
      srcKeys = Seq("o_orderkey"), groupCols = Seq("o_orderstatus"),
      measures = Seq("cents"), appId = "probe")
    ph("bootstrap")(refresh())
    val p1 = ord.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (cents(col("o_totalprice")) + lit(1000L)).as("cents"),
        (col("o_orderstatus") === "F").as("del"))
    ph("merge1")(VT.commitMergeUnique(p1, src, Seq("o_orderkey"), col("del")))
    ph("fold1")(refresh())
    spark.stop()
  }
}
