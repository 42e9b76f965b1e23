package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThan, LessThanOrEqual}

import graft.sources.{PagedManifest, PagedScanBuilder}

/** The `graft-paged` DSv2 connector (SURVEY §2.1 S1): paged-JSONL scan
  * with manifest-stats page pruning, limit budgeting, and column pruning.
  */
class PagedSourceSpec extends SparkSuite {

  private lazy val dir = {
    val d = s"/root/repo/target/fixtures/paged_spec_${new java.io.File(sf).getName}"
    if (!new java.io.File(d, "_manifest.json").exists()) {
      PagedManifest.writeFixture(
        Tables.orders(spark, sf)
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"),
        d, "o_orderkey", pageSize = 200)
    }
    d
  }

  test("full scan round-trips every row and value") {
    val paged = spark.read.format("graft-paged").load(dir)
    val orig = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    assert(paged.count() == orig.count())
    assert(paged.exceptAll(orig).isEmpty && orig.exceptAll(paged).isEmpty)
  }

  test("watermark predicate prunes pages at planning time") {
    val manifest = PagedManifest.read(dir)
    val total = manifest.pages.length
    assert(total >= 5, s"fixture should have several pages, got $total")
    val hwm = manifest.pages.map(_.maxKey).max / 2
    val builder = new PagedScanBuilder(dir, manifest.schema)
    builder.pushFilters(Array(GreaterThan("o_orderkey", hwm)))
    val planned = builder.build().toBatch.planInputPartitions().length
    assert(planned < total, s"expected pruning below $total pages, planned $planned")
    // and results are still exact (residual filter re-applied by Spark)
    val got = spark.read.format("graft-paged").load(dir)
      .filter(col("o_orderkey") > hwm).count()
    val want = Tables.orders(spark, sf).filter(col("o_orderkey") > hwm).count()
    assert(got == want)
  }

  test("upper-bound predicate prunes from the other end") {
    val manifest = PagedManifest.read(dir)
    val cutoff = manifest.pages.head.maxKey
    val builder = new PagedScanBuilder(dir, manifest.schema)
    builder.pushFilters(Array(LessThanOrEqual("o_orderkey", cutoff)))
    val planned = builder.build().toBatch.planInputPartitions().length
    assert(planned < manifest.pages.length)
  }

  test("limit pushdown admits only the covering page prefix") {
    val manifest = PagedManifest.read(dir)
    val builder = new PagedScanBuilder(dir, manifest.schema)
    builder.pushLimit(10)
    val planned = builder.build().toBatch.planInputPartitions().length
    assert(planned == 1, s"10-row limit should plan exactly 1 page, got $planned")
    val got = spark.read.format("graft-paged").load(dir).limit(10).count()
    assert(got == 10)
  }

  test("column pruning reaches the reader schema") {
    val df = spark.read.format("graft-paged").load(dir).select("o_orderkey")
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("BatchScan")).getOrElse("")
    assert(df.schema.fieldNames.sameElements(Array("o_orderkey")))
    assert(df.agg(sum("o_orderkey")).head().getLong(0) ==
      Tables.orders(spark, sf).agg(sum("o_orderkey")).head().getLong(0))
  }
}
