package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{SortExec, SparkPlan}

import graft.plans.{TopKPerGroupExec, TopKPlans}

/** Custom physical operator: per-group top-k via
  * [[graft.plans.TopKPerGroup]] — value-equal to the window-rank plan,
  * with the bounded partial/final shape pinned.
  */
class TopKPlanSpec extends SparkSuite {
  import spark.implicits._

  private def ord = Tables(spark, sf, "orders")

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.select("o_orderkey", "o_orderpriority", "o_totalprice")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  private def viaCustom(k: Int) =
    TopKPlans.topKPerGroup(
      ord.select("o_orderkey", "o_orderpriority", "o_totalprice"),
      Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k)

  test("topKPerGroup equals the window row_number plan") {
    for (k <- Seq(1, 3, 10)) {
      val got = viaCustom(k).orderBy("o_orderpriority", "rnk")
        .collect().map(_.toSeq).toSeq
      val want = viaWindow(k).orderBy("o_orderpriority", "rnk")
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"mismatch at k=$k")
    }
  }

  test("topKPerGroup groups null keys together, like window partitionBy") {
    val df = Seq(
      (Some("a"), 1), (None, 5), (Some("a"), 3), (None, 2), (None, 9)
    ).toDF("g", "v")
    val got = TopKPlans.topKPerGroup(df, Seq("g"), Seq("v" -> true), 2)
      .orderBy(col("g").asc_nulls_first, col("rnk"))
      .collect().map(r => (r.get(0), r.getInt(1), r.getInt(2))).toSeq
    val w = Window.partitionBy("g").orderBy(col("v").asc)
    val want = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 2)
      .orderBy(col("g").asc_nulls_first, col("rnk"))
      .collect().map(r => (r.get(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got == want)
  }

  test("topKPerGroup handles groups smaller than k and null order values") {
    val df = Seq(
      ("a", Some(3)), ("a", None), ("b", Some(1)),
      ("a", Some(7)), ("b", Some(2)), ("c", Some(5))
    ).toDF("g", "v")
    val got = TopKPlans.topKPerGroup(df, Seq("g"), Seq("v" -> true), 2)
      .orderBy("g", "rnk").collect().map(r => (r.getString(0), r.get(1), r.getInt(2)))
    val w = Window.partitionBy("g").orderBy(col("v").asc)
    val want = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 2)
      .orderBy("g", "rnk").collect().map(r => (r.getString(0), r.get(1), r.getInt(2)))
    assert(got.toSeq == want.toSeq)
  }

  private def withoutAqe[T](f: => T): T = {
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }

  test("plan shape: one exchange, partial+final custom nodes, no SortExec") { withoutAqe {
    val plan = viaCustom(5).queryExecution.executedPlan
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    val customs = plan.collect { case t: TopKPerGroupExec => t }
    val sorts = plan.collect { case s: SortExec => s }
    assert(exchanges.size == 1, s"expected exactly one shuffle:\n$plan")
    assert(customs.map(_.partial).sorted == Seq(false, true),
      s"expected partial+final TopKPerGroupExec pair:\n$plan")
    assert(sorts.isEmpty, s"bounded heaps must not plan a SortExec:\n$plan")
  } }

  test("topKPerGroup rejects an empty group-column list") {
    intercept[IllegalArgumentException] {
      TopKPlans.topKPerGroup(ord, Seq.empty, Seq("o_totalprice" -> false), 3)
    }
  }

  private def withMaxGroups[T](n: Int)(f: => T): T = {
    spark.conf.set("spark.graft.topk.maxGroupsInMemory", n.toString)
    try f finally spark.conf.unset("spark.graft.topk.maxGroupsInMemory")
  }

  test("high-cardinality groups: partial flush + final sort fallback stay exact") {
    // 500k distinct groups, 2 rows each, with the in-memory cap forced down
    // to 512 groups — both the partial flush path and the final node's
    // spillable-sort fallback are exercised (each task sees far more groups
    // than the cap) and must still produce the exact window answer.
    withMaxGroups(512) {
      val df = spark.range(1000000L)
        .select((col("id") % 500000L).as("g"), col("id").as("v"))
        .repartition(4)
      val got = TopKPlans.topKPerGroup(df, Seq("g"), Seq("v" -> false), 1)
      assert(got.count() == 500000L)
      // spot-check values without materializing 500k rows for compare
      val sample = got.filter(col("g") < 100).orderBy("g")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val want = (0L until 100L).map(g => (g, g + 500000L, 1)).toArray
      assert(sample.sameElements(want))
    }
  }

  test("capped run equals uncapped run on the orders workload (k > 1, ties of size < k)") {
    val uncapped = viaCustom(3).orderBy("o_orderpriority", "rnk")
      .collect().map(_.toSeq).toSeq
    val capped = withMaxGroups(1) {
      viaCustom(3).orderBy("o_orderpriority", "rnk").collect().map(_.toSeq).toSeq
    }
    assert(capped == uncapped)
  }

  test("partial side bounds rows crossing the shuffle to k per group per partition") { withoutAqe {
    val df = ord.select("o_orderkey", "o_orderpriority", "o_totalprice")
      .repartition(4)
    val k = 3
    val out = TopKPlans.topKPerGroup(df, Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k)
    val plan = out.queryExecution.executedPlan
    val partialExec = plan.collectFirst {
      case t: TopKPerGroupExec if t.partial => t
    }.get
    val nGroups = df.select("o_orderpriority").distinct().count()
    val partialRows = partialExec.execute().count()
    assert(partialRows <= nGroups * k * 4,
      s"partial emitted $partialRows rows — not bounded by groups*k*partitions")
    assert(out.count() == nGroups * k)
  } }
}
