package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Fixture-vintage guard for [[Tables.events]]: the driver has shipped
  * `events.ts` as parquet TIMESTAMP(NANOS) (which Spark reads as a raw
  * long under `nanosAsLong`) and as TIMESTAMP(MICROS) (reads natively as
  * a timestamp). Round 8's driver run lost all nine events-backed queries
  * because the loader assumed the nanos vintage unconditionally; this
  * spec pins the type-dispatch so neither vintage can regress again.
  */
class TablesSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("tables-spec").toString

  test("events loader passes a native TIMESTAMP ts column through") {
    val dir = tmp()
    // instant-based construction: Timestamp.valueOf would parse in the
    // HOST's default timezone while the assertion renders under the UTC
    // session zone — this test must pass on any host TZ
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-01T12:34:56.789Z"))
    Seq((1L, ts, 7L, "click", 1.5, """{"k":3}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(got.select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSS")).as[String].head()
      == "2024-03-01 12:34:56.789")
  }

  test("events loader converts a raw-nanos long ts column to timestamp") {
    val dir = tmp()
    // 2024-03-01T12:34:56.789Z in nanoseconds since the epoch — the shape
    // `nanosAsLong` produces for a TIMESTAMP(NANOS) fixture.
    val nanos = 1709296496789000000L
    Seq((1L, nanos, 7L, "click", 1.5, """{"k":3}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(got.select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSS")).as[String].head()
      == "2024-03-01 12:34:56.789")
  }

  test("the shipped events fixture loads with a usable timestamp column") {
    val got = Tables.events(spark, sf)
    assert(got.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(got.filter($"ts".isNotNull).limit(1).count() == 1L)
  }

  /** Early-warning contract on the driver-regenerated fixtures: when a
    * future regeneration renames or drops a column, this fails with the
    * table and column named — instead of the round losing every query
    * that touches it (round 8 lost nine to a silent `events.ts` retype).
    */
  test("every shipped fixture table carries the columns the queries read") {
    val expected = Map(
      "region" -> Seq("r_regionkey", "r_name"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    val problems = expected.toSeq.sortBy(_._1).flatMap { case (t, cols) =>
      val have = Tables(spark, sf, t).columns.toSet
      cols.filterNot(have).map(c => s"$t.$c (table has: ${have.toSeq.sorted.mkString(", ")})")
    } ++ {
      val ev = Tables.events(spark, sf).columns.toSet
      Seq("event_id", "ts", "user_id", "event_type", "value", "props")
        .filterNot(ev).map(c => s"events.$c")
    }
    assert(problems.isEmpty,
      s"fixture schema drift — missing columns:\n  ${problems.mkString("\n  ")}")
  }
}
