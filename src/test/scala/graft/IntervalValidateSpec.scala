package graft

import org.apache.spark.sql.functions._

import graft.ops.{JoinOps, ValidateOps}

class IntervalValidateSpec extends SparkSuite {
  import spark.implicits._

  test("intervalJoin equals the brute-force theta join on random intervals") {
    val rnd = new scala.util.Random(11)
    def mk(pre: String, n: Int) = (0 until n).map { i =>
      val s = rnd.nextInt(10000).toLong
      // mix of short, long (spans many 100-wide bins), and zero-length
      val len = rnd.nextInt(3) match {
        case 0 => 0L
        case 1 => rnd.nextInt(50).toLong
        case _ => rnd.nextInt(900).toLong
      }
      (i.toLong, s, s + len)
    }.toDF(s"${pre}_id", s"${pre}_start", s"${pre}_end")
    val a = mk("a", 120)
    val b = mk("b", 150)
    val binned = JoinOps.intervalJoin(a, "a_start", "a_end", b, "b_start", "b_end", 100L)
      .select("a_id", "b_id")
    val brute = a.crossJoin(b)
      .filter($"a_start" <= $"b_end" && $"b_start" <= $"a_end")
      .select("a_id", "b_id")
    assert(binned.count() == brute.count(), "pair count (catches double-emits)")
    assert(binned.exceptAll(brute).isEmpty && brute.exceptAll(binned).isEmpty)
  }

  test("intervalJoin: touching endpoints match (closed intervals) across a bin edge") {
    val a = Seq((1L, 0L, 99L)).toDF("a_id", "a_start", "a_end")
    val b = Seq((2L, 99L, 210L), (3L, 100L, 110L), (4L, 101L, 101L))
      .toDF("b_id", "b_start", "b_end")
    val got = JoinOps.intervalJoin(a, "a_start", "a_end", b, "b_start", "b_end", 100L)
      .select($"b_id").as[Long].collect().toSet
    assert(got == Set(2L), "only the interval touching at 99 overlaps")
  }

  test("checkRows counts FALSE and NULL as violations, one row per check") {
    val df = Seq[(java.lang.Long, String)](
      (5L, "A"), (null, "A"), (-1L, "Z"), (3L, null))
      .toDF("qty", "flag")
    val out = ValidateOps.checkRows(df, Seq(
        "qty_pos" -> ($"qty" > 0),
        "flag_domain" -> $"flag".isin("A", "B")))
      .collect().map(r => r.getAs[String]("check") ->
        ((r.getAs[Long]("total"), r.getAs[Long]("violations"), r.getAs[Boolean]("passed")))).toMap
    assert(out("qty_pos") == ((4L, 2L, false)), "null qty and -1 both violate")
    assert(out("flag_domain") == ((4L, 2L, false)), "Z and null both violate")
  }

  test("checkUnique counts rows beyond the first per duplicate key") {
    val df = Seq((1, "x"), (1, "y"), (1, "z"), (2, "x"), (3, "x"))
      .toDF("k", "v")
    val r = ValidateOps.checkUnique(df, "k_unique", Seq("k")).head()
    assert(r.getAs[Long]("total") == 5L && r.getAs[Long]("violations") == 2L
      && !r.getAs[Boolean]("passed"))
    val ok = ValidateOps.checkUnique(df, "kv_unique", Seq("k", "v")).head()
    assert(ok.getAs[Long]("violations") == 0L && ok.getAs[Boolean]("passed"))
  }

  test("profileStats: per-column nulls and exact distincts in one pass") {
    import spark.implicits._
    val df = Seq(
      (1, Option("a"), Option(1.0)), (2, Option("a"), None),
      (3, None, Option(2.0)), (4, Option("b"), Option(1.0)))
      .toDF("k", "s", "v")
    val out = ValidateOps.profileStats(df, Seq("k", "s", "v"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      "k" -> ((4L, 0L, 4L)),
      "s" -> ((4L, 1L, 2L)),
      "v" -> ((4L, 1L, 2L))), s"got $out")
  }

  test("profileStats: a column name with a dot profiles the column, not a field") {
    import spark.implicits._
    val df = Seq((1, Option("a")), (2, Option.empty[String])).toDF("k", "a.b")
    val out = ValidateOps.profileStats(df, Seq("a.b"))
      .as[(String, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("a.b", 2L, 1L, 1L)), s"got ${out.toSeq}")
  }

  test("adviseJoin: profile scalars pick broadcast / salted / plain") {
    import ValidateOps.{adviseJoin, Broadcast, KeyStats, Plain, Salted}
    // small build side: broadcast regardless of probe skew
    assert(adviseJoin(1000L, KeyStats(10000000L, 5L, 9000000L)) == Broadcast)
    // big build + hot key (top share ≫ avg): salt
    assert(adviseJoin(10000000L,
      KeyStats(rows = 100000000L, distinct = 1000000L, topCount = 40000000L)) == Salted)
    // big build, uniform keys: plain
    assert(adviseJoin(10000000L,
      KeyStats(rows = 100000000L, distinct = 1000000L, topCount = 150L)) == Plain)
    // hot RATIO but tiny absolute rows: not worth the replication — plain
    assert(adviseJoin(10000000L,
      KeyStats(rows = 1000L, distinct = 10L, topCount = 900L)) == Plain)
  }

  test("advisedJoin: verdicts pin the physical plan; results are strategy-invariant") {
    import spark.implicits._
    import ValidateOps.{advisedJoin, Broadcast, Plain, Salted}
    val probe = (1 to 2000).map(i => (i % 7, i)).toDF("k", "payload")
    val build = (0 until 7).map(i => (i, s"dim-$i")).toDF("k", "name")
    val expected = probe.join(build, Seq("k")).as[(Int, Int, String)].collect().toSet

    val bPlan = advisedJoin(probe, build, Seq("k"), Broadcast)
    assert(bPlan.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "Broadcast verdict must plan a broadcast hash join")
    assert(bPlan.as[(Int, Int, String)].collect().toSet == expected)

    val sPlan = advisedJoin(probe, build, Seq("k"), Salted, saltBuckets = 8)
    assert(sPlan.queryExecution.analyzed.toString.contains("__salt"),
      "Salted verdict must join on the salt column")
    assert(sPlan.as[(Int, Int, String)].collect().toSet == expected,
      "salting must be row-invisible")

    val pPlan = advisedJoin(probe, build, Seq("k"), Plain)
    assert(pPlan.as[(Int, Int, String)].collect().toSet == expected)
  }

  test("profileStats approx path tracks exact cardinalities within HLL error") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i.toLong, (i % 997).toString)).toDF("k", "s")
    val exact = ValidateOps.profileStats(df, Seq("k", "s"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    val approx = ValidateOps.profileStats(df, Seq("k", "s"), approx = true)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    exact.foreach { case (c, n) =>
      val a = approx(c).toDouble
      assert(math.abs(a - n) / n < 0.1, s"$c: approx $a vs exact $n")
    }
  }
}
