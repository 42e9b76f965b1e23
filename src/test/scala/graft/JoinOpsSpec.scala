package graft

import org.apache.spark.sql.functions._

import graft.ops.JoinOps

class JoinOpsSpec extends SparkSuite {
  import spark.implicits._

  test("saltedJoin == plain inner join, and spreads a hot key over buckets") {
    // adversarial skew: 90% of fact rows share one key
    val fact = (0 until 5000).map { i =>
      (if (i % 10 == 0) i.toLong % 37 else 7L, i.toLong)
    }.toDF("k", "row_id")
    val dim = (0L until 40L).map(k => (k, s"dim-$k")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k"))
    val salted = JoinOps.saltedJoin(fact, dim, Seq("k"), 8, Seq($"row_id"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // the hot key's rows really do land in multiple sub-keys
    val spread = fact.filter($"k" === 7L)
      .withColumn("__salt", pmod(hash($"row_id"), lit(8)))
      .select("__salt").distinct().count()
    assert(spread == 8, s"hot key should use all 8 salt buckets, got $spread")
  }

  test("asofJoin: left rows before any right row carry a null payload") {
    val left = Seq((1L, "2021-01-01 00:00:00"), (1L, "2021-06-01 00:00:00"))
      .toDF("k", "ts").withColumn("ts", $"ts".cast("timestamp"))
    val right = Seq((1L, "2021-03-01 00:00:00", "v1"))
      .toDF("k", "rts", "payload").withColumn("rts", $"rts".cast("timestamp"))
    val out = JoinOps.asofJoin(left, right, "k", "k", "ts", "rts", Seq("payload"))
      .orderBy("ts").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("asof")), "pre-first-right row → null")
    assert(out(1).getStruct(out(1).fieldIndex("asof")).getString(0) == "v1")
  }

  test("asofJoin: right rows with a null timestamp never match") {
    val left = Seq((1L, "2021-01-01 00:00:00"), (1L, "2021-06-01 00:00:00"))
      .toDF("k", "ts").withColumn("ts", $"ts".cast("timestamp"))
    // a null timestamp sorts first in the window, so without the filter
    // its payload would be carried to the first left row
    val right = Seq((1L, null.asInstanceOf[String], "ghost"),
        (1L, "2021-03-01 00:00:00", "v1"))
      .toDF("k", "rts", "payload")
    val out = JoinOps.asofJoin(left, right, "k", "k", "ts", "rts", Seq("payload"))
      .orderBy("ts").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("asof")),
      "null-ts right row must not be carried to earlier left rows")
    assert(out(1).getStruct(out(1).fieldIndex("asof")).getString(0) == "v1")
  }

  test("asofJoin: equal timestamps are inclusive (right visible at its own ts)") {
    val left = Seq((1L, "2021-03-01 00:00:00")).toDF("k", "ts")
      .withColumn("ts", $"ts".cast("timestamp"))
    val right = Seq((1L, "2021-03-01 00:00:00", "same-instant"))
      .toDF("k", "rts", "payload").withColumn("rts", $"rts".cast("timestamp"))
    val out = JoinOps.asofJoin(left, right, "k", "k", "ts", "rts", Seq("payload")).collect()
    assert(out.head.getStruct(out.head.fieldIndex("asof")).getString(0) == "same-instant")
  }
}
