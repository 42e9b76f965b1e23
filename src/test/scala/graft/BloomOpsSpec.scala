package graft

import org.apache.spark.sql.functions._

import graft.ops.BloomOps

class BloomOpsSpec extends SparkSuite {
  import spark.implicits._

  // NOT cached: caching these shared-table plans would make PlanSpec's
  // pushdown assertions read from InMemoryRelation instead of parquet
  private lazy val li = Tables.lineitem(spark, sf)
  private lazy val ord = Tables.orders(spark, sf)

  test("bloomJoin == plain inner join exactly (false positives die in the join)") {
    val dim = ord.filter($"o_totalprice" > 400000)
      .select($"o_orderkey".as("k"), $"o_totalprice")
    val plain = li.join(dim, $"l_orderkey" === $"k")
    val bloomed = BloomOps.bloomJoin(li, dim, "l_orderkey", "k", 10000L)
    assert(bloomed.count() == plain.count())
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("bloomReduce probes string keys as strings (no silent empty result)") {
    val dim = ord.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderpriority".as("k")).distinct()
    val reduced = BloomOps.bloomReduce(ord, dim, "o_orderpriority", "k", 10L)
    val expected = ord.filter($"o_orderpriority" === "1-URGENT").count()
    assert(expected > 0 && reduced.count() >= expected,
      "string-keyed bloom must keep every true match")
    assertThrows[IllegalArgumentException] {
      BloomOps.bloomReduce(ord, dim, "o_totalprice", "k", 10L) // double key
    }
  }

  test("bloomReduce: semi-join superset, bounded blowup, real pruning") {
    val dim = ord.filter($"o_totalprice" > 400000)
      .select($"o_orderkey".as("k"))
    val reduced = BloomOps.bloomReduce(li, dim, "l_orderkey", "k", 10000L, fpp = 0.01)
    val semi = li.join(dim, $"l_orderkey" === $"k", "left_semi")
    val (nAll, nSemi, nReduced) = (li.count(), semi.count(), reduced.count())
    assert(semi.exceptAll(reduced).isEmpty, "must keep every true match")
    assert(nReduced < nAll / 2, s"bloom should prune most rows: $nReduced of $nAll")
    assert(nReduced <= nSemi + (nAll * 0.05).toLong,
      s"false positives way past fpp: semi=$nSemi reduced=$nReduced")
  }
}
