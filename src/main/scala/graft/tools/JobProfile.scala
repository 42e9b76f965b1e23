package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Dev harness: per-Spark-job attribution for a registered query — one
  * line per job with wall ms, task count, and the call site that launched
  * it (`JobProfile q_dv_compose [q_...]`). The first thing to look at
  * when a fixture-heavy query's wall is many small jobs: WHICH operations
  * launch them and what each one costs. Runs each query once warm (rep 0
  * discarded) and profiles the second run.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.fs.FastLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class J(id: Int, t0: Long, site: String, tasks: Int)
    val open = scala.collection.concurrent.TrieMap.empty[Int, J]
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(J, Long)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
        // stage name carries the action call site ("parquet at Foo.scala:12");
        // for AQE-materialized stages it is an executor-pool frame, so fall
        // back to the first graft frame in the stage details (full call site)
        val graftFrame = e.stageInfos.iterator
          .flatMap(_.details.linesIterator)
          .find(l => l.contains("graft.") && !l.contains("JobProfile"))
          .map(_.trim.stripPrefix("at "))
        val site = desc
          .orElse(e.stageInfos.lastOption.map(_.name).filterNot(_.contains("withThreadLocal")))
          .orElse(graftFrame)
          .getOrElse(e.stageInfos.lastOption.map(_.name).getOrElse("?"))
        val tasks = e.stageInfos.map(_.numTasks).sum
        open(e.jobId) = J(e.jobId, System.nanoTime(), site.take(110), tasks)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        open.remove(e.jobId).foreach(j => done.add((j, System.nanoTime())))
    }
    args.foreach { q =>
      val fn = graft.SparkEntry.queries.getOrElse(q, sys.error(s"unknown query $q"))
      fn(spark, sfDir).count() // warm
      spark.sparkContext.addSparkListener(listener)
      done.clear(); open.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async: give it a moment to drain
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      println(f"== $q wall=$wall%.3f s jobs=${done.size}%d")
      import scala.jdk.CollectionConverters._
      val rows = done.asScala.toSeq.sortBy(_._1.id)
      var acc = 0L
      rows.foreach { case (j, t1) =>
        val ms = (t1 - j.t0) / 1e6
        acc += (t1 - j.t0)
        println(f"  job=${j.id}%4d ${ms}%8.1f ms tasks=${j.tasks}%4d  ${j.site}")
      }
      println(f"  sum_job_wall=${acc / 1e9}%.3f s (gaps = driver-side work)")
    }
    spark.stop()
  }
}
