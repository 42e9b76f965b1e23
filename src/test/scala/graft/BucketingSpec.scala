package graft

import org.apache.spark.sql.functions._

/** Bucketing = the pre-paid shuffle. At 100 TB the fact⋈fact join's
  * exchange dominates; writing both sides bucketed+sorted on the join key
  * lets every future join read co-located buckets and skip the exchange
  * entirely. This spec proves the engine actually achieves that: the
  * bucketed join's physical plan contains ZERO Exchange operators.
  */
class BucketingSpec extends SparkSuite {

  test("bucketed tables join with no exchange (co-located, pre-shuffled)") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force the SMJ path
    try {
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS ord_bucketed")
      Tables.lineitem(s, sf).select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables.orders(s, sf).select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")

      val joined = s.table("li_bucketed")
        .join(s.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$p")

      // and it is the same answer as the plain-parquet join
      val plain = Tables.lineitem(s, sf)
        .join(Tables.orders(s, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
