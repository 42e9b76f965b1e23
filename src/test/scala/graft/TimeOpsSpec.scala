package graft

import org.apache.spark.sql.functions._

import graft.ops.TimeOps

class TimeOpsSpec extends SparkSuite {
  import spark.implicits._

  test("dailySpine is dense and complete: |keys| x |days| rows, no gaps") {
    val keys = Seq(1L, 2L, 3L).toDF("k")
    val spine = TimeOps.dailySpine(keys, "k", "2020-01-01", "2020-02-15")
    assert(spine.count() == 3L * 46)
    val perKey = spine.groupBy("k").agg(
      countDistinct("day").as("nd"), min("day").as("lo"), max("day").as("hi"))
      .collect()
    perKey.foreach { r =>
      assert(r.getLong(1) == 46)
      assert(r.getDate(2).toString == "2020-01-01")
      assert(r.getDate(3).toString == "2020-02-15")
    }
  }

  test("gapFillCumulative carries the running sum across empty days") {
    val facts = Seq((1L, "2020-01-02", 10.0), (1L, "2020-01-04", 5.0))
      .toDF("k", "day", "v").withColumn("day", $"day".cast("date"))
    val spine = TimeOps.dailySpine(facts.select("k").distinct(), "k",
      "2020-01-01", "2020-01-05")
    val out = TimeOps.gapFillCumulative(spine, facts, "k", "day", "v")
      .orderBy("day").select("cum").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(None, Some(10.0), Some(10.0), Some(15.0), Some(15.0)),
      "null before first fact, then last cumulative value carried forward")
  }

  test("trailingRangeSum == brute-force window over day values") {
    val facts = Seq(
      (1L, "2020-01-01", 1.0), (1L, "2020-01-15", 2.0), (1L, "2020-02-10", 4.0),
      (1L, "2020-02-12", 8.0), (2L, "2020-01-01", 16.0)).toDF("k", "day", "v")
      .withColumn("day", $"day".cast("date"))
    val got = facts.select($"k", $"day",
        TimeOps.trailingRangeSum("k", "day", "v", 30).as("t30"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.getDouble(2)).toMap
    // brute force: sum of v within [day-29, day] per key
    val rows = Seq(
      (1L, "2020-01-01", 1.0), (1L, "2020-01-15", 2.0), (1L, "2020-02-10", 4.0),
      (1L, "2020-02-12", 8.0), (2L, "2020-01-01", 16.0))
    rows.foreach { case (k, d0, _) =>
      val d = java.time.LocalDate.parse(d0)
      val expect = rows.filter { case (k2, d2, _) =>
        val dd = java.time.temporal.ChronoUnit.DAYS.between(java.time.LocalDate.parse(d2), d)
        k2 == k && dd >= 0 && dd <= 29
      }.map(_._3).sum
      assert(got((k, d0)) == expect, s"($k, $d0)")
    }
  }
}
