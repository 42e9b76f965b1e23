package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DV-vs-CoW scale probe (r15 verdict task 1): same table, same narrow
  * DELETE/UPDATE — positional (DV) vs copy-on-write — timed, with bytes
  * written per commit from the manifest byte stamps. Run at sf1/sf10.
  */
object DvScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val VT = graft.ops.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("dvscale").toString
    val ord = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .repartitionByRange(32, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    val total = ord.count()
    def mk(name: String, dvs: Boolean): String = {
      val dir = s"$root/$name"
      VT.create(ord, dir, statsCols = Seq("o_orderkey"),
        props = if (dvs) Map(VT.DvsEnabledProp -> "true") else Map.empty)
      dir
    }
    def bytesOf(dir: String, v: Long): Long = {
      val m = VT.readMeta(spark, dir, v)
      val prevDvs = VT.readMeta(spark, dir, v - 1).dvs.toSet
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dataAdds = VT.addedEntries(spark, dir, v).map(_.bytes).sum
      val dvBytes = m.dvs.filterNot(prevDvs).map(p => fs.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$dir/$p")).getLen).sum
      dataAdds + dvBytes
    }
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // narrow mutation: ~0.1% of rows in one tight band; quantile-picked
    // bounds so the band lands on REAL keys (the scaled key space has
    // per-copy gaps an arithmetic midpoint can fall into)
    val qs = ord.stat.approxQuantile("o_orderkey",
      Array(0.500, 0.501, 0.502, 0.503), 0.0001)
    val lo = qs(0).toLong; val hi = qs(1).toLong
    val cond = col("o_orderkey") >= lo && col("o_orderkey") <= hi
    val matched = ord.filter(cond).count()

    val dvDir = mk("dv", dvs = true)
    val cowDir = mk("cow", dvs = false)
    println(s"[dvscale] lo=$lo hi=$hi matched=$matched total=$total")
    val (vDvDel, tDvDel) = time(VT.commitDeleteDv(spark, dvDir, cond))
    println(s"[dvscale] dv delete -> v$vDvDel")
    val (_, tCowDel) = time(VT.commitDelete(spark, cowDir, cond))
    val dvDelBytes = bytesOf(dvDir, 2L)
    val cowDelBytes = bytesOf(cowDir, 2L)

    val sets = Seq("cents" -> (col("cents") + lit(7L)))
    val cond2 = col("o_orderkey") >= qs(2).toLong &&
      col("o_orderkey") <= qs(3).toLong
    val (_, tDvUpd) = time(VT.commitUpdateDv(spark, dvDir, cond2, sets))
    val (_, tCowUpd) = time(VT.commitUpdate(spark, cowDir, cond2, sets))
    val dvUpdBytes = bytesOf(dvDir, 3L)
    val cowUpdBytes = bytesOf(cowDir, 3L)

    println(s"""{"probe":"dv_vs_cow","sf":"$sfDir","rows":$total,"matched":$matched,""" +
      s""""delete":{"dv_sec":${f"$tDvDel%.2f"},"cow_sec":${f"$tCowDel%.2f"},"dv_bytes":$dvDelBytes,"cow_bytes":$cowDelBytes},""" +
      s""""update":{"dv_sec":${f"$tDvUpd%.2f"},"cow_sec":${f"$tCowUpd%.2f"},"dv_bytes":$dvUpdBytes,"cow_bytes":$cowUpdBytes}}""")
    val fsr = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsr.delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
