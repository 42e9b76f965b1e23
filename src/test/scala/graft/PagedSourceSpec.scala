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

  /** Loopback HTTP server over the fixture dir — the live analog of the
    * reference's Socrata endpoint (`scripts/extract.py:56-72`), in-JDK
    * `com.sun.net.httpserver`, no external network. `failFirst` 503s the
    * first N GETs per page; `truncateFirst` sends the full Content-Length
    * but half the bytes (premature EOF mid-stream) for the first N GETs.
    */
  private def withHttpServer[T](failFirst: Int = 0, truncateFirst: Int = 0)(f: String => T): T = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    server.createContext("/", { exchange: com.sun.net.httpserver.HttpExchange =>
      val name = exchange.getRequestURI.getPath.stripPrefix("/")
      val n = hits.merge(name, 1, (a, b) => a + b)
      val file = new java.io.File(dir, name)
      val isPage = name != "_manifest.json"
      if (!file.exists()) {
        exchange.sendResponseHeaders(404, -1); exchange.close()
      } else if (failFirst > 0 && n <= failFirst && isPage) {
        exchange.sendResponseHeaders(503, -1); exchange.close()
      } else {
        val bytes = java.nio.file.Files.readAllBytes(file.toPath)
        exchange.sendResponseHeaders(200, bytes.length)
        if (truncateFirst > 0 && n <= truncateFirst && isPage)
          exchange.getResponseBody.write(bytes, 0, bytes.length / 2)
        else exchange.getResponseBody.write(bytes)
        exchange.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("pages fetch over loopback HTTP with planning-time pruning and exact results") {
    withHttpServer() { base =>
      val manifest = PagedManifest.read(base)
      assert(manifest.pages.nonEmpty)
      val hwm = manifest.pages.map(_.maxKey).max / 2
      val builder = new PagedScanBuilder(base, manifest.schema)
      builder.pushFilters(Array(GreaterThan("o_orderkey", hwm)))
      assert(builder.build().toBatch.planInputPartitions().length < manifest.pages.length,
        "manifest-stats pruning must work identically over HTTP")
      val got = spark.read.format("graft-paged").load(base)
        .filter(col("o_orderkey") > hwm)
      val want = Tables.orders(spark, sf).filter(col("o_orderkey") > hwm)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      assert(got.count() == want.count())
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  test("transient HTTP 503s are retried per page over the wire") {
    withHttpServer(failFirst = 2) { base =>
      val got = spark.read.format("graft-paged")
        .option("fetchBackoffMs", "1").load(base)
      val want = Tables.orders(spark, sf)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      assert(got.count() == want.count())
      assert(got.exceptAll(want).isEmpty)
    }
  }

  test("mid-stream truncation resumes the page without replaying delivered rows") {
    // the server advertises the full Content-Length but sends half the
    // bytes: the client hits a premature EOF part-way through the page,
    // re-opens it, and must skip exactly the lines already delivered —
    // no missing rows, no duplicates
    withHttpServer(truncateFirst = 1) { base =>
      val got = spark.read.format("graft-paged")
        .option("fetchBackoffMs", "1").load(base)
      val want = Tables.orders(spark, sf)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      assert(got.count() == want.count())
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  test("a read timeout is retried, not treated as task cancellation") {
    // SocketTimeoutException subclasses InterruptedIOException; the retry
    // catch must still consume budget for it. The server stalls past the
    // client's 150 ms read timeout on each page's FIRST request only.
    val stalled = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange: com.sun.net.httpserver.HttpExchange =>
      val name = exchange.getRequestURI.getPath.stripPrefix("/")
      val file = new java.io.File(dir, name)
      if (!file.isFile) { exchange.sendResponseHeaders(404, -1); exchange.close() }
      else {
        if (name != "_manifest.json" && stalled.add(name)) Thread.sleep(600)
        val bytes = java.nio.file.Files.readAllBytes(file.toPath)
        exchange.sendResponseHeaders(200, bytes.length)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val got = spark.read.format("graft-paged")
        .option("fetchReadTimeoutMs", "150").option("fetchBackoffMs", "1")
        .load(base)
      assert(got.count() == Tables.orders(spark, sf).count(),
        "every page must recover from its stalled first fetch via retry")
      assert(stalled.size > 0, "precondition: the stall handler must have fired")
    } finally server.stop(0)
  }

  test("q_scan_http: the registered query fetches over live loopback HTTP, exact rows") {
    val got = SparkEntry.queries("q_scan_http")(spark, sf)
    val cutoff = Tables.orders(spark, sf)
      .agg(max(col("o_orderkey"))).head().getLong(0) / 4
    val want = Tables.orders(spark, sf).filter(col("o_orderkey") <= cutoff)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("transient page-fetch failures succeed on retry (reference I4)") {
    // every page fails twice before serving — within the 3-attempt budget,
    // so the scan must return the complete, exact result
    val attempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    graft.sources.PagedFetch.faultInjector = { file =>
      val n = attempts.merge(file, 1, (a, b) => a + b)
      if (n <= 2) throw new java.io.IOException(s"injected transient fault #$n on $file")
    }
    try {
      val got = spark.read.format("graft-paged")
        .option("fetchBackoffMs", "1").load(dir).count()
      assert(got == Tables.orders(spark, sf).count())
      assert(attempts.values().stream().allMatch(_ >= 3),
        "every page should have needed its two retries")
    } finally graft.sources.PagedFetch.faultInjector = _ => ()
  }

  test("permanent page-fetch failure surfaces after the retry budget") {
    val attempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    graft.sources.PagedFetch.faultInjector = { file =>
      attempts.merge(file, 1, (a, b) => a + b)
      throw new java.io.IOException(s"injected permanent fault on $file")
    }
    try {
      val e = intercept[Exception] {
        spark.read.format("graft-paged")
          .option("fetchRetries", "2").option("fetchBackoffMs", "1")
          .load(dir).count()
      }
      def rootCauses(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: rootCauses(t.getCause)
      assert(rootCauses(e).exists(m => m != null && m.contains("injected permanent fault")),
        s"the injected fault must surface as the failure cause, got: $e")
      assert(attempts.values().stream().anyMatch(_ >= 2),
        "the 2-attempt budget should have been spent before failing")
    } finally graft.sources.PagedFetch.faultInjector = _ => ()
  }
}
