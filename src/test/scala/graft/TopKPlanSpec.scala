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

  test("directional sort columns keep their direction (desc = latest-wins)") {
    val df = Seq(
      ("k1", 1, "old"), ("k1", 9, "new"), ("k1", 5, "mid"),
      ("k2", 3, "only"), ("k3", 2, "a"), ("k3", 7, "b")
    ).toDF("k", "ts", "payload")
    val got = TopKPlans.topKPerGroupSort(df, Seq("k"),
        Seq(col("ts").desc, col("payload")), 1)
      .orderBy("k").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq(("k1", 9, "new"), ("k2", 3, "only"), ("k3", 7, "b")))
  }

  test("partial eviction keeps hot groups resident: emitted rows stay near groups*k") { withoutAqe {
    // Adversarial shape from the r6 verdict: cardinality just above the cap,
    // cold singleton groups interleaved with hot groups. A drain-everything
    // flush re-emits every HOT group's rows on each overflow (emitted ~
    // #overflows × #hot); LRU half-eviction keeps hot groups resident, so
    // each cold singleton crosses once and hot groups emit only at the
    // final end-of-input drain.
    withMaxGroups(8) {
      val nHot = 4
      val nCold = 2000
      val k = 3
      // single partition, deterministic interleave: hot groups touched
      // between every cold singleton so LRU keeps them at the warm end
      val df = spark.range(nCold.toLong)
        .select(col("id"), explode(array(
          (lit("cold") :: col("id").cast("string") :: Nil).reduce(concat(_, _)) +:
            (0 until nHot).map(h => lit(s"hot$h")): _*)).as("g"))
        .select(col("g"), col("id").as("v"))
        .repartition(1)
      val out = TopKPlans.topKPerGroup(df, Seq("g"), Seq("v" -> false), k)
      val partialExec = out.queryExecution.executedPlan.collectFirst {
        case t: TopKPerGroupExec if t.partial => t
      }.get
      val partialRows = partialExec.execute().count()
      // cold singletons cross once each; hot groups contribute ≤ k per
      // eviction-or-final-drain. Allow 2× slack over the ideal
      // nCold + nHot×k — the old full-drain behavior emitted every hot
      // group's heap on each of the ~nCold/(cap/2) overflows (~4× ideal
      // at these sizes), which this bound rejects.
      val ideal = nCold + nHot * k
      assert(partialRows <= 2L * ideal,
        s"partial emitted $partialRows rows (ideal ~$ideal) — flush amplification unbounded")
      // and the answer itself is exact
      val w = Window.partitionBy("g").orderBy(col("v").desc)
      val want = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
        .orderBy("g", "rnk").collect().map(_.toSeq).toSeq
      assert(out.orderBy("g", "rnk").collect().map(_.toSeq).toSeq == want)
    }
  } }

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
