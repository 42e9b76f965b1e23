package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Per-query wall-clock budget: a single query drifting past this is an
    // in-round red flag (the suite's slowest steady-state query runs ~7 s
    // at sf0.1). Reported as "over_budget" in the JSON line + a loud
    // stderr banner rather than a nonzero exit — the driver reads rc!=0 as
    // "bench broken", which would bury the signal instead of surfacing it.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_BUDGET_SEC", "30").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: touch every table (file listing, parquet footers, reader JIT)
    // and run the flagship once so timings measure execution rather than
    // first-query session initialization.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    def runAll(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => if (!failed.contains(name)) failed += name }
        name -> (System.nanoTime() - t0) / 1e9
      }
    // Two passes, BOTH reported. `value` (the driver-gated headline) is the
    // FIRST pass — a cold sweep including Janino codegen compilation and C2
    // JIT, the conservative number. `steady_sec` is the second pass —
    // what a long-lived cluster session runs after warmup. Keeping the
    // headline cold preserves metric semantics across rounds.
    val cold = runAll()
    val steady = runAll()
    val coldTotal = cold.values.sum
    val steadyTotal = steady.values.sum
    def sec(v: Double): String = f"$v%.3f"
    val overBudget = (cold.keySet ++ steady.keySet).toSeq.sorted
      .filter(q => math.min(cold.getOrElse(q, 0.0), steady.getOrElse(q, 0.0)) > budgetSec)
    if (overBudget.nonEmpty)
      System.err.println(s"BENCH BUDGET EXCEEDED (> $budgetSec s/query): " +
        overBudget.map(q => s"$q=${sec(steady(q))}s").mkString(", "))
    val qs = cold.map { case (k, v) => s"\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    // a throwing query must be VISIBLE, not a silently-small timing
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val overJson = overBudget.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${sec(coldTotal)},"unit":"sec","steady_sec":${sec(steadyTotal)},"queries":$qs,"failed":$failedJson,"over_budget":$overJson,"sf":"$sfDir"}""")
    // The driver's log-tail window is ~2000 chars; the detailed line above
    // does not fit. Print a compact summary LAST (slowest queries only) so a
    // fully-parseable JSON line is always inside the tail window.
    val slow = cold.toSeq.sortBy(-_._2).take(15)
      .map { case (k, v) => s"\"" + k + "\":" + sec(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${sec(coldTotal)},"unit":"sec","steady_sec":${sec(steadyTotal)},"n_queries":${cold.size},"queries":$slow,"failed":$failedJson,"over_budget":$overJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
