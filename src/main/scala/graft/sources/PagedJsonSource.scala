package graft.sources

import java.io.{BufferedReader, File, FileReader, PrintWriter}
import java.util

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector modeling the reference's paginated-API extract
  * (`scripts/extract.py:56-72`: Socrata SoQL GET with `$limit`/`$offset`
  * pages and a `$where=arrest_date > '<hwm>'` watermark predicate pushed to
  * the server — SURVEY §2.1 S1).
  *
  * The "API" here is a base location — a local directory OR an
  * `http(s)://` base URL (fetched with the in-JDK `HttpURLConnection`, no
  * new dependencies) — of JSONL page files plus a `_manifest.json`
  * carrying the schema and per-page (rows, minKey, maxKey) stats over a
  * designated watermark key column — standing in for the server's ability
  * to answer a filtered, paged query. The connector is the part that must
  * be Spark-correct at 100 TB:
  *
  *  - `SupportsPushDownFilters`: comparison predicates on the key column
  *    prune whole pages at PLANNING time via manifest stats (the moral
  *    equivalent of the server evaluating `$where`). Pruning is
  *    conservative — every filter is also kept as a residual for exact
  *    row-level evaluation by Spark, so correctness never depends on stats.
  *  - `SupportsPushDownLimit`: pages are admitted only until their
  *    cumulative row count covers the limit (the `$limit` analog);
  *    partial pushdown, Spark still applies the exact limit.
  *  - `SupportsPushDownRequiredColumns`: readers parse only requested
  *    fields (column pruning into the "wire format").
  *  - One `InputPartition` per page → pages fetch/parse in parallel across
  *    executors, unlike the reference's serial page loop.
  *  - Bounded per-page retry with exponential backoff (`fetchRetries` /
  *    `fetchBackoffMs` reader options) — the reference's tenacity policy
  *    (`scripts/extract.py:56` `@retry`, SURVEY I4) applied at the unit
  *    that actually fails, the page fetch. A transient fault costs one
  *    page re-read, not the Spark task (and certainly not the stage); a
  *    fault that outlives the budget rethrows and surfaces through
  *    Spark's own task-retry ladder.
  */
class PagedJsonTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-paged"

  private def isOffsetMode(mode: String): Boolean = "offset".equalsIgnoreCase(mode)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (isOffsetMode(options.getOrDefault("mode", "manifest")))
      // manifest-less by definition — the reference hard-codes its column
      // list (scripts/extract.py:33-41); the user supplies .schema(...)
      throw new IllegalArgumentException(
        "graft-paged mode=offset has no manifest to infer from; supply .schema(...) explicitly")
    else PagedManifest.read(options.get("path"), PagedTable.retryOf(options)).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    if (isOffsetMode(properties.getOrDefault("mode", "manifest")))
      new SoqlTable(properties.get("path"), schema)
    else new PagedTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

object PagedTable {
  /** One parse of the fetch-policy reader options, shared by schema
    * inference (manifest GET) and the scan builder (page GETs).
    */
  def retryOf(options: CaseInsensitiveStringMap): RetryPolicy =
    RetryPolicy(options.getInt("fetchRetries", 3),
      options.getLong("fetchBackoffMs", 50L),
      options.getInt("fetchConnectTimeoutMs", 10000),
      options.getInt("fetchReadTimeoutMs", 60000))
}

class PagedTable(path: String, schema: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft-paged:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(path, schema, PagedTable.retryOf(options),
      options.getInt("maxPagesPerTrigger", 0))
}

class PagedScanBuilder(path: String, fullSchema: StructType,
                       retry: RetryPolicy = RetryPolicy(3, 50L),
                       maxPagesPerTrigger: Int = 0)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownRequiredColumns {

  private val manifest = PagedManifest.read(path, retry)
  private var lowerBound: Option[Long] = None  // key > / >= bound
  private var upperBound: Option[Long] = None  // key < / <= bound
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var required: StructType = fullSchema

  /** Accept comparison predicates on the manifest key column for page-level
    * pruning; EVERYTHING stays residual (returned back) so Spark re-checks
    * rows exactly — stats pruning must never be load-bearing.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val key = manifest.keyCol
    def longOf(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case _ => None
    }
    val accepted = ArrayBuffer[Filter]()
    filters.foreach {
      case f @ GreaterThan(c, v) if c == key && longOf(v).isDefined =>
        lowerBound = Some(lowerBound.fold(longOf(v).get)(math.max(_, longOf(v).get)))
        accepted += f
      case f @ GreaterThanOrEqual(c, v) if c == key && longOf(v).isDefined =>
        lowerBound = Some(lowerBound.fold(longOf(v).get - 1)(math.max(_, longOf(v).get - 1)))
        accepted += f
      case f @ LessThan(c, v) if c == key && longOf(v).isDefined =>
        upperBound = Some(upperBound.fold(longOf(v).get)(math.min(_, longOf(v).get)))
        accepted += f
      case f @ LessThanOrEqual(c, v) if c == key && longOf(v).isDefined =>
        upperBound = Some(upperBound.fold(longOf(v).get + 1)(math.min(_, longOf(v).get + 1)))
        accepted += f
      case f @ EqualTo(c, v) if c == key && longOf(v).isDefined =>
        lowerBound = Some(lowerBound.fold(longOf(v).get - 1)(math.max(_, longOf(v).get - 1)))
        upperBound = Some(upperBound.fold(longOf(v).get + 1)(math.min(_, longOf(v).get + 1)))
        accepted += f
      case _ => ()
    }
    pushed = accepted.toArray
    filters  // all residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** `$limit` analog: admit pages only until the limit is covered. Partial
    * pushdown (returns false) — Spark applies the exact limit on top.
    */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); false }

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  override def build(): Scan =
    new PagedScan(path, manifest, required, lowerBound, upperBound, limit, retry,
      maxPagesPerTrigger)
}

class PagedScan(path: String, manifest: PagedManifest, required: StructType,
                lower: Option[Long], upper: Option[Long], limit: Option[Int],
                retry: RetryPolicy = RetryPolicy(3, 50L),
                maxPagesPerTrigger: Int = 0)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // ---- runtime page pruning (the DPP analog for a paged source) -------
  // At execution time Spark can hand this scan the build side of a join
  // as In/EqualTo filters on the key column; pages whose [minKey, maxKey]
  // stats cover none of the probed values drop BEFORE any fetch. Stats
  // pruning stays conservative/non-load-bearing exactly like the
  // planning-time bounds: Spark still evaluates the join itself.
  // sorted for O(log keys) per-page overlap checks: runtime In-lists can
  // carry very large build sides, and admittedPages re-evaluates on every
  // planInputPartitions/description call
  @volatile private var runtimeKeys: Option[Array[Long]] = None

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(manifest.keyCol))

  override def filter(filters: Array[Filter]): Unit = {
    val keys = filters.collect {
      case org.apache.spark.sql.sources.In(c, vs) if c == manifest.keyCol =>
        vs.toSeq.collect { case l: Long => l; case i: Int => i.toLong }.toSet
      case EqualTo(c, v: Long) if c == manifest.keyCol => Set(v)
      case EqualTo(c, v: Int) if c == manifest.keyCol => Set(v.toLong)
    }
    if (keys.nonEmpty)
      runtimeKeys = Some(keys.reduce(_ intersect _).toArray.sorted)
  }

  /** Does any probed key fall inside [lo, hi]? Binary search for the
    * smallest key >= lo, then one bound check.
    */
  private def anyKeyInRange(sorted: Array[Long], lo: Long, hi: Long): Boolean = {
    val i = java.util.Arrays.binarySearch(sorted, lo)
    if (i >= 0) true
    else {
      val ins = -i - 1
      ins < sorted.length && sorted(ins) <= hi
    }
  }

  override def description(): String = {
    val kept = planInputPartitions().length
    s"graft-paged path=$path pages=${manifest.pages.length} planned=$kept " +
      s"keyBounds=(${lower.getOrElse("-inf")}, ${upper.getOrElse("+inf")}) " +
      s"limit=${limit.getOrElse(-1)}"
  }

  /** Page-level pruning on manifest stats (conservative), then the limit
    * budget in page order — the reference's sequential-page semantics,
    * minus the pages the predicate rules out.
    */
  private[sources] def admittedPages: Seq[PageStat] = {
    val afterPrune = manifest.pages.filter { p =>
      lower.forall(p.maxKey > _) && upper.forall(p.minKey < _) &&
        runtimeKeys.forall(anyKeyInRange(_, p.minKey, p.maxKey))
    }
    limit match {
      case None => afterPrune
      case Some(l) =>
        var budget = l.toLong
        afterPrune.takeWhile { p =>
          val take = budget > 0
          budget -= p.rows
          take
        }
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    admittedPages.map(p =>
      PagedInputPartition(s"$path/${p.file}", manifest.schema, required, retry)
        : InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    PagedScan.readerFactory

  /** S1 × I2 as idiomatic Structured Streaming: `readStream` on the paged
    * source with the page INDEX as the streaming offset, so the engine's
    * checkpoint owns exactly the "pages done" cursor the reference's
    * resumable loop tracks by hand (`scripts/extract.py:56-72` +
    * watermark file). `maxPagesPerTrigger` bounds each micro-batch;
    * `Trigger.AvailableNow` drains the current page list then stops.
    */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new PagedMicroBatchStream(path, admittedPages, manifest.schema, required,
      retry, maxPagesPerTrigger)
}

object PagedScan {
  private[sources] val readerFactory: PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PagedPartitionReader(partition.asInstanceOf[PagedInputPartition])
    }
}

/** Streaming offset = (count of pages consumed, digest of exactly those
  * pages' manifest stats). The digest pins WHICH pages the index counts:
  * appending new pages to the manifest keeps every old prefix valid
  * (normal incremental ingest), but a manifest that renumbered, removed,
  * or resized already-consumed pages fails the resume LOUDLY instead of
  * silently skipping data — the positional-index hazard a bare integer
  * offset would have.
  */
case class PagedStreamOffset(consumed: Int, prefixSig: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"consumed":$consumed,"prefixSig":"$prefixSig"}"""
}

object PagedStreamOffset {
  def sigOf(pages: Seq[PageStat]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    pages.foreach(p => md.update(
      s"${p.file}|${p.rows}|${p.minKey}|${p.maxKey}\n".getBytes("UTF-8")))
    md.digest().take(12).map(b => f"$b%02x").mkString
  }
  def at(pages: Seq[PageStat], consumed: Int): PagedStreamOffset =
    PagedStreamOffset(consumed, sigOf(pages.take(consumed)))
  def parse(json: String): PagedStreamOffset = {
    val node = new ObjectMapper().readTree(json)
    PagedStreamOffset(node.get("consumed").asInt(), node.get("prefixSig").asText())
  }
}

class PagedMicroBatchStream(path: String, pages: Seq[PageStat],
                            fullSchema: StructType, required: StructType,
                            retry: RetryPolicy, maxPagesPerTrigger: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => StreamOffset, ReadLimit}

  // AvailableNow: pin the drain target at query start; pages is already
  // fixed per stream start (manifest re-read when the query [re]starts)
  @volatile private var availableNowCap: Int = pages.length

  private def checkPrefix(o: PagedStreamOffset): Int = {
    require(o.consumed <= pages.length &&
      PagedStreamOffset.sigOf(pages.take(o.consumed)) == o.prefixSig,
      s"paged-stream checkpoint does not match the manifest: offset counts " +
        s"${o.consumed} consumed pages but the manifest's first ${o.consumed} " +
        s"pages differ (renumbered/removed/resized while the query was down). " +
        s"Appending pages is safe; rewriting history requires a fresh checkpoint.")
    o.consumed
  }

  override def initialOffset(): StreamOffset = PagedStreamOffset.at(pages, 0)
  override def deserializeOffset(json: String): StreamOffset = PagedStreamOffset.parse(json)
  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()

  override def prepareForTriggerAvailableNow(): Unit = availableNowCap = pages.length

  override def getDefaultReadLimit: ReadLimit =
    if (maxPagesPerTrigger > 0) ReadLimit.maxRows(maxPagesPerTrigger.toLong)
    else ReadLimit.allAvailable()

  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with admission control")

  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val from = checkPrefix(start.asInstanceOf[PagedStreamOffset])
    val cap = math.min(pages.length, availableNowCap)
    // Honor the limit the ENGINE passes (Trigger.Once sends allAvailable()
    // to override the source default — process-everything contract), and
    // min against the remainder so from+maxRows can't overflow.
    val step = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        math.min(r.maxRows(), (cap - from).toLong).toInt
      case _ => cap - from
    }
    PagedStreamOffset.at(pages, from + step)
  }

  override def reportLatestOffset(): StreamOffset = PagedStreamOffset.at(pages, pages.length)

  override def planInputPartitions(start: StreamOffset, end: StreamOffset): Array[InputPartition] = {
    val from = checkPrefix(start.asInstanceOf[PagedStreamOffset])
    val to = checkPrefix(end.asInstanceOf[PagedStreamOffset])
    pages.slice(from, to).map(p =>
      PagedInputPartition(s"$path/${p.file}", fullSchema, required, retry)
        : InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = PagedScan.readerFactory
}

/** Per-page retry budget: up to `maxAttempts` fetches, exponential backoff
  * starting at `backoffMs` (50 → 100 → 200…, the extract.py tenacity shape).
  * HTTP connect/read timeouts ride along so a stalled server surfaces as a
  * retryable `SocketTimeoutException` on a caller-controlled clock.
  */
case class RetryPolicy(maxAttempts: Int, backoffMs: Long,
                       connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000) {
  require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
}

/** The page-fetch boundary, retryable as a unit. `faultInjector` lets specs
  * inject transient/permanent fetch failures exactly where a flaky GET
  * would fail — a no-op in production.
  *
  * A page resource is either a local file path or an `http(s)://` URL
  * (fetched with the in-JDK `HttpURLConnection` — the live analog of
  * `scripts/extract.py:56-72`'s `requests.get` page loop).
  */
object PagedFetch {
  @volatile var faultInjector: String => Unit = _ => ()

  def isUrl(resource: String): Boolean =
    resource.startsWith("http://") || resource.startsWith("https://")

  /** Stream a page's lines, retrying per `policy`. Lines are NOT buffered
    * (constant per-task memory regardless of page size); on a transient
    * failure the page is re-opened and already-DELIVERED lines skipped, so
    * the rows Spark has consumed are never replayed and the page remains
    * the retry unit. Task cancellation (`InterruptedIOException` /
    * `InterruptedException`, which `NonFatal` treats as fatal) is never
    * retried — it propagates immediately rather than burning the backoff
    * budget — EXCEPT `SocketTimeoutException`, which subclasses
    * `InterruptedIOException` but is the most common transient HTTP fault
    * and so stays retryable. Once the budget is spent the failure rethrows
    * and surfaces through Spark's own task-retry ladder. Callers that may
    * abandon the page mid-stream (limit pushdown, task kill) must call
    * [[PagedLineIterator.close]] to release the file handle / connection.
    */
  def fetchLines(resource: String, policy: RetryPolicy): PagedLineIterator =
    new PagedLineIterator(resource, policy)

  /** Fetch a whole small resource (the manifest) with the SAME timeout /
    * retry / truncation-guard / gzip discipline as page fetches — a stalled
    * manifest GET must not hang planning indefinitely, and a transient 503
    * must not fail the scan outright (it used to: the manifest went through
    * a bare `URL.openStream` with no timeout and no retry).
    */
  def fetchBytes(resource: String, policy: RetryPolicy): Array[Byte] = {
    var attempt = 1
    while (true) {
      try {
        faultInjector(resource)
        if (isUrl(resource)) {
          val conn = new java.net.URL(resource).openConnection()
            .asInstanceOf[java.net.HttpURLConnection]
          conn.setConnectTimeout(policy.connectTimeoutMs)
          conn.setReadTimeout(policy.readTimeoutMs)
          conn.setRequestProperty("Accept-Encoding", "gzip")
          val raw = conn.getInputStream
          try {
            val bytes = raw.readAllBytes()
            val expected = conn.getContentLengthLong
            if (expected >= 0 && bytes.length < expected)
              throw new java.io.IOException(
                s"truncated response: ${bytes.length} of $expected bytes from $resource")
            return if ("gzip".equalsIgnoreCase(conn.getContentEncoding))
              new java.util.zip.GZIPInputStream(
                new java.io.ByteArrayInputStream(bytes)).readAllBytes()
            else bytes
          } finally raw.close()
        } else return java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(resource))
      } catch {
        case _: java.net.SocketTimeoutException if attempt < policy.maxAttempts =>
          Thread.sleep(policy.backoffMs << (attempt - 1)); attempt += 1
        case e: java.io.InterruptedIOException => throw e
        case scala.util.control.NonFatal(_) if attempt < policy.maxAttempts =>
          Thread.sleep(policy.backoffMs << (attempt - 1)); attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  final class PagedLineIterator(resource: String, policy: RetryPolicy)
      extends Iterator[String] with AutoCloseable {
      private var attempt = 1
      private var delivered = 0L
      private var reader: BufferedReader = _
      private var pending: String = _
      private var done = false

      private def openReader(): BufferedReader = {
        faultInjector(resource)
        val r =
          if (isUrl(resource)) {
            val conn = new java.net.URL(resource).openConnection()
              .asInstanceOf[java.net.HttpURLConnection]
            conn.setConnectTimeout(policy.connectTimeoutMs)
            conn.setReadTimeout(policy.readTimeoutMs)
            // Compressed transfer: page payloads are the dominant wire cost
            // at scale and every real public API (incl. Socrata) gzips.
            conn.setRequestProperty("Accept-Encoding", "gzip")
            // 4xx/5xx surface as IOException from getInputStream → retried
            val raw = conn.getInputStream
            val expected = conn.getContentLengthLong
            // The JDK client can surface a prematurely-closed connection as a
            // silent short read — a truncated final line would then parse as
            // data. Enforce Content-Length ourselves: EOF before `expected`
            // bytes throws (→ retried) BEFORE any partial line is delivered.
            // Content-Length counts WIRE bytes (compressed when the server
            // gzips), so the guard wraps the RAW stream, below any
            // decompression; the DECODED bytes are separately guarded by
            // gzip's own trailer integrity (CRC-32 + ISIZE), which
            // GZIPInputStream verifies at end-of-stream.
            val checked =
              if (expected < 0) raw
              else new java.io.FilterInputStream(raw) {
                private var seen = 0L
                private def check(): Unit =
                  if (seen < expected) throw new java.io.IOException(
                    s"truncated response: $seen of $expected bytes from $resource")
                override def read(): Int = {
                  val b = super.read()
                  if (b >= 0) seen += 1 else check()
                  b
                }
                override def read(buf: Array[Byte], off: Int, len: Int): Int = {
                  val n = in.read(buf, off, len)
                  if (n > 0) seen += n else if (n < 0) check()
                  n
                }
              }
            val decoded =
              if ("gzip".equalsIgnoreCase(conn.getContentEncoding))
                new java.util.zip.GZIPInputStream(checked)
              else checked
            new BufferedReader(new java.io.InputStreamReader(decoded, "UTF-8"))
          } else new BufferedReader(new FileReader(resource))
        // Re-skip lines already handed to Spark. Two hazards live here:
        // (1) if the skip itself fails (second truncation / timeout), `r`
        //     was never assigned to `reader`, so the retry path's
        //     closeQuietly() wouldn't release it — close it HERE before
        //     rethrowing into the retry ladder;
        // (2) a clean EOF before all delivered lines are re-skipped means
        //     the resource SHRANK between attempts (consistent
        //     Content-Length, different content) — silently accepting it
        //     would truncate the page, so it throws and consumes retry
        //     budget like any other fetch fault.
        try {
          var skip = delivered
          while (skip > 0) {
            if (r.readLine() == null) throw new java.io.IOException(
              s"resource shrank across retries: EOF after ${delivered - skip} " +
                s"of $delivered already-delivered lines in $resource")
            skip -= 1
          }
        } catch {
          case t: Throwable =>
            try r.close() catch { case _: java.io.IOException => () }
            throw t
        }
        r
      }

      private def closeQuietly(): Unit = {
        if (reader != null) {
          try reader.close() catch { case _: java.io.IOException => () }
          reader = null
        }
      }

      private def advance(): Unit =
        while (!done && pending == null) {
          try {
            if (reader == null) reader = openReader()
            val line = reader.readLine()
            if (line == null) { done = true; closeQuietly() }
            else pending = line
          } catch {
            // read timeout is transient, NOT cancellation, despite being an
            // InterruptedIOException subclass — it must consume retry budget
            case _: java.net.SocketTimeoutException if attempt < policy.maxAttempts =>
              closeQuietly()
              Thread.sleep(policy.backoffMs << (attempt - 1))
              attempt += 1
            case e: java.io.InterruptedIOException => closeQuietly(); throw e
            case scala.util.control.NonFatal(_) if attempt < policy.maxAttempts =>
              closeQuietly()
              Thread.sleep(policy.backoffMs << (attempt - 1))
              attempt += 1
          }
        }

      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): String = {
        advance()
        if (pending == null) throw new NoSuchElementException(resource)
        val line = pending
        pending = null
        delivered += 1
        line
      }
      /** Release the underlying handle when the page is abandoned before
        * EOF (limit pushdown, task kill) — EOF and errors close eagerly.
        */
      override def close(): Unit = { done = true; closeQuietly() }
  }
}

/** Session-lifetime loopback HTTP servers over paged fixture dirs — lets a
  * registered query exercise the REAL wire path (DSv2 scan → HTTP GET →
  * page parse) end-to-end, oracled like any other query. One server per
  * dir, lazily started on an ephemeral port; all servers stop when the
  * SparkSession's application ends (the `HTTP-Dispatcher` thread is
  * non-daemon, so leaving one running would block JVM exit in a
  * `runMain`-style driver).
  */
object LoopbackPages {
  /** Path of the SoQL rows endpoint each served dir exposes (offset mode). */
  val SoqlPath = "__soql"

  private val servers =
    new java.util.concurrent.ConcurrentHashMap[String, (com.sun.net.httpserver.HttpServer, String)]()
  // keyed by applicationId, NOT a boolean: a later SparkSession in the same
  // JVM (test harnesses restart sessions) needs its OWN listener or its
  // servers would outlive it and their non-daemon threads block JVM exit
  private val hookedApps = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // fixture-server state: materialized rows for the SoQL endpoint and a
  // bounded request log so specs can prove what crossed the wire
  private val soqlCache =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[JsonNode]]()
  // shaped-result cache (filter + aggregate + sort, everything except the
  // slice): an offset-paged scan issues one GET per page with the SAME
  // $where/$group/$order, and re-evaluating over the whole corpus per
  // request made the fixture server, not the connector, the benchmark
  // bottleneck. Fixture dirs are immutable for the session (same contract
  // as soqlCache). Key: (dir, canonical shape of the query params).
  private val soqlShapeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Vector[JsonNode]]()
  private val requestLogs = new java.util.concurrent.ConcurrentHashMap[String,
    (java.util.concurrent.ConcurrentLinkedQueue[(String, Long)],
      java.util.concurrent.atomic.AtomicInteger)]()

  /** Requests served for `dir` as (decoded `path?query`, rows served; -1
    * for static file GETs) — evidence for "the server saw the predicate".
    */
  def requestLog(dir: String): Seq[(String, Long)] = {
    val entry = requestLogs.get(dir)
    if (entry == null) Nil
    else { val b = Vector.newBuilder[(String, Long)]; entry._1.forEach(b += _); b.result() }
  }
  def clearRequestLog(dir: String): Unit = {
    val entry = requestLogs.get(dir)
    if (entry != null) { entry._1.clear(); entry._2.set(0) }
  }

  /** Test hook: drop cached fixture state for `dir` so a spec can model a
    * LIVE source — rows appended (or removed) between streaming runs. The
    * immutable-dir caching contract holds for every production bench/query
    * fixture; only specs that rewrite a dir on disk call this.
    */
  def invalidate(dir: String): Unit = {
    soqlCache.remove(dir)
    val it = soqlShapeCache.keySet().iterator()
    while (it.hasNext) if (it.next()._1 == dir) it.remove()
  }

  private def logRequest(dir: String, entry: String, rows: Long): Unit = {
    val (q, n) = requestLogs.computeIfAbsent(dir,
      _ => (new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)](),
        new java.util.concurrent.atomic.AtomicInteger()))
    q.add(entry -> rows)
    // bounded via the side counter: ConcurrentLinkedQueue.size() is O(n),
    // which would put a full-queue walk inside every request once the cap
    // is reached (the counter drifts a little under races; the bound holds)
    if (n.incrementAndGet() > 10000 && q.poll() != null) n.decrementAndGet()
  }

  /** All rows of the paged fixture in page order — the fixture server's
    * "database" behind the SoQL endpoint (server-side implementation
    * detail, same role as Socrata's backing store).
    */
  private def soqlRows(dir: String): Vector[JsonNode] =
    soqlCache.computeIfAbsent(dir, { d =>
      val mapper = new ObjectMapper()
      PagedManifest.read(d).pages.iterator.flatMap { p =>
        val it = java.nio.file.Files.readAllLines(
          new File(d, p.file).toPath, java.nio.charset.StandardCharsets.UTF_8).iterator()
        new Iterator[JsonNode] {
          def hasNext = it.hasNext
          def next() = mapper.readTree(it.next())
        }
      }.toVector
    })

  private def respond(exchange: com.sun.net.httpserver.HttpExchange,
                      plain: Array[Byte]): Unit = {
    // Honor Accept-Encoding: gzip — the connector always asks for it, so
    // the registered q_scan_http* queries exercise compressed transfer
    // (Content-Length = wire bytes, the client's truncation guard counts
    // exactly these).
    val accept = Option(exchange.getRequestHeaders.getFirst("Accept-Encoding"))
      .getOrElse("")
    val bytes =
      if (accept.toLowerCase.contains("gzip")) {
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(plain); gz.close()
        exchange.getResponseHeaders.set("Content-Encoding", "gzip")
        bos.toByteArray
      } else plain
    exchange.sendResponseHeaders(200, bytes.length)
    exchange.getResponseBody.write(bytes)
    exchange.close()
  }

  /** Evaluate one SoQL GET (`$select`/`$where`/`$group`/`$order`/`$limit`/
    * `$offset`) against the fixture rows — the loopback stand-in for the
    * reference's server (`scripts/extract.py:56-72` talks to exactly this
    * contract). Pipeline: filter → aggregate (when `$select` carries
    * aggregate functions; the planning count probe is the degenerate
    * global-group case) → sort → slice → project. Returns (JSONL body,
    * rows served).
    */
  private def soqlAnswer(dir: String, rawQuery: String): (String, Long) = {
    val mapper = new ObjectMapper()
    val params: Map[String, String] = rawQuery.split("&").toIndexedSeq
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
    val whereOpt = params.get("$where")
    val orderOpt = params.get("$order")
    val groupOpt = params.get("$group")
    val selOpt = params.get("$select")
    val items = selOpt.map(SoqlWire.parseSelect)
    // SoQL semantics: a bare `$group` with no aggregate in `$select` is a
    // grouped-DISTINCT query (one row per group). Spark pushes exactly
    // that shape when the aggregate columns are pruned above a complete
    // pushdown — e.g. count() over a grouped result reduces to
    // Aggregation(group, aggs=[]) — so keying aggregation off "has an
    // aggregate function" alone returned the RAW rows and tripped the
    // client's truncation guard once the corpus outgrew the cap.
    val isAgg = items.exists(_.exists(_.isInstanceOf[SoqlWire.AggItem])) ||
      (items.isDefined && groupOpt.exists(_.trim.nonEmpty))
    val shaped =
      if (whereOpt.isEmpty && orderOpt.isEmpty && !isAgg) soqlRows(dir)
      else {
        val shapeKey = Seq(whereOpt, groupOpt, orderOpt, if (isAgg) selOpt else None)
          .map(_.getOrElse("")).mkString("\u0001") // unambiguous separator: distinct shapes must not collide
        soqlShapeCache.computeIfAbsent((dir, shapeKey), _ => {
          val filtered = whereOpt.fold(soqlRows(dir))(w => soqlRows(dir).filter(SoqlWire.eval(w, _)))
          val agged =
            if (!isAgg) filtered
            else SoqlWire.evalAggregate(filtered,
              groupOpt.toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty)),
              items.get, mapper)
          orderOpt.fold(agged)(o =>
            agged.sorted(scala.math.Ordering.comparatorToOrdering(SoqlWire.orderComparator(o))))
        })
      }
    val off = math.max(0L, params.get("$offset").map(_.toLong).getOrElse(0L))
    val lim = math.min(params.get("$limit").map(_.toLong).getOrElse(Long.MaxValue),
      shaped.size.toLong)
    val slice =
      if (off >= shaped.size) Vector.empty
      else shaped.slice(off.toInt, math.min(shaped.size.toLong, off + lim).toInt)
    // bare-column projection (aggregate rows are already shaped by $select)
    val bareCols =
      if (isAgg) None
      else items.map(_.collect { case SoqlWire.BareCol(c) => c })
    val sb = new StringBuilder
    slice.foreach { row =>
      val out = bareCols.fold(row) { cs =>
        val o = mapper.createObjectNode()
        // explicit type arg: ObjectNode.set's generic return infers
        // Nothing in Scala and checkcast-crashes at runtime
        cs.foreach(c => o.set[JsonNode](c, row.get(c)))
        o: JsonNode
      }
      sb.append(mapper.writeValueAsString(out)).append('\n')
    }
    (sb.toString, slice.size.toLong)
  }

  /** Serve `dir` over loopback HTTP; returns the base URL. Static page /
    * manifest files at `/<name>`, the SoQL rows endpoint at `/__soql`.
    */
  def serve(spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    if (hookedApps.add(spark.sparkContext.applicationId)) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = stopAll()
      })
    }
    servers.computeIfAbsent(dir, { d =>
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      val root = new File(d).getCanonicalFile
      server.createContext("/", { exchange: com.sun.net.httpserver.HttpExchange =>
        val reqPath = exchange.getRequestURI.getPath.stripPrefix("/")
        if (reqPath == SoqlPath) {
          // a handler exception must surface as a 500, not a silently
          // dropped connection (which the client would misread as a
          // transient fault and burn its whole retry budget on)
          try {
            val rawQuery = Option(exchange.getRequestURI.getRawQuery).getOrElse("")
            val (body, rows) = soqlAnswer(d, rawQuery)
            logRequest(d, s"$SoqlPath?${java.net.URLDecoder.decode(rawQuery, "UTF-8")}", rows)
            respond(exchange, body.getBytes("UTF-8"))
          } catch {
            case scala.util.control.NonFatal(t) =>
              System.err.println(s"LoopbackPages soql handler error: $t")
              t.printStackTrace()
              exchange.sendResponseHeaders(500, -1); exchange.close()
          }
        } else {
          // Canonicalize and confine to the served dir: the server is
          // loopback-only but session-lifetime, and a raw `new File(d, path)`
          // would follow `../` segments out of the fixture dir and serve any
          // JVM-readable file.
          val f = new File(root, reqPath).getCanonicalFile
          val confined = f.getPath == root.getPath ||
            f.getPath.startsWith(root.getPath + File.separator)
          if (!confined || !f.isFile) { exchange.sendResponseHeaders(404, -1); exchange.close() }
          else {
            logRequest(d, reqPath, -1L)
            respond(exchange, java.nio.file.Files.readAllBytes(f.toPath))
          }
        }
      })
      server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4,
        r => { val t = new Thread(r, "graft-loopback-pages"); t.setDaemon(true); t }))
      server.start()
      (server, s"http://127.0.0.1:${server.getAddress.getPort}")
    })._2
  }

  def stopAll(): Unit = {
    servers.values.forEach { case (server, _) => server.stop(0) }
    servers.clear()
    soqlCache.clear()
    soqlShapeCache.clear()
    requestLogs.clear()
  }
}

case class PagedInputPartition(file: String, fullSchema: StructType,
                               required: StructType,
                               retry: RetryPolicy = RetryPolicy(3, 50L))
    extends InputPartition

/** Parses one JSONL page with Jackson, emitting only required columns. */
class PagedPartitionReader(p: PagedInputPartition) extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val lines = PagedFetch.fetchLines(p.file, p.retry)
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (!lines.hasNext) { false }
    else { row = JsonLineRows.parse(mapper, lines.next(), p.required); true }
  }
  override def get(): InternalRow = row
  override def close(): Unit = lines.close()
}

// ------------------------------------------------------------ manifest
case class PageStat(file: String, rows: Long, minKey: Long, maxKey: Long)

case class PagedManifest(keyCol: String, schema: StructType, pages: Seq[PageStat])

object PagedManifest {
  def read(path: String, retry: RetryPolicy = RetryPolicy(3, 50L)): PagedManifest = {
    val mapper = new ObjectMapper()
    // Through the same timeout/retry/gzip fetch path as pages — a bare
    // `readTree(URL)` has no timeouts, so a stalled manifest GET would hang
    // PLANNING (not even a task Spark could retry) indefinitely.
    val root = mapper.readTree(PagedFetch.fetchBytes(
      if (PagedFetch.isUrl(path)) s"$path/_manifest.json"
      else new File(path, "_manifest.json").getPath, retry))
    val schema = DataType.fromDDL(root.get("schemaDdl").asText()).asInstanceOf[StructType]
    val pages = ArrayBuffer[PageStat]()
    val it = root.get("pages").elements()
    while (it.hasNext) {
      val p: JsonNode = it.next()
      pages += PageStat(p.get("file").asText(), p.get("rows").asLong(),
        p.get("minKey").asLong(), p.get("maxKey").asLong())
    }
    PagedManifest(root.get("keyCol").asText(), schema, pages.toSeq)
  }

  /** Write a DataFrame as a paged-JSONL fixture: rows sorted by `keyCol`
    * split into `pageSize`-row page files, plus the stats manifest. Driver
    * streams via `toLocalIterator` — fixture generation only, not an
    * operator.
    */
  def writeFixture(df: DataFrame, dir: String, keyCol: String, pageSize: Int): Unit = {
    val f = new File(dir)
    f.mkdirs()
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val mapper = new ObjectMapper()
    val pages = ArrayBuffer[PageStat]()
    var pageRows = 0L
    var minKey = Long.MaxValue
    var maxKey = Long.MinValue
    var pageNo = 0
    var out: PrintWriter = null
    def openPage(): Unit = {
      out = new PrintWriter(new File(f, f"page-$pageNo%05d.jsonl"), "UTF-8")
      pageRows = 0; minKey = Long.MaxValue; maxKey = Long.MinValue
    }
    def closePage(): Unit = if (out != null && pageRows > 0) {
      out.close()
      pages += PageStat(f"page-$pageNo%05d.jsonl", pageRows, minKey, maxKey)
      pageNo += 1
    } else if (out != null) out.close()
    openPage()
    val it = df.sort(keyCol).toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val node = mapper.createObjectNode()
      schema.fields.zipWithIndex.foreach { case (fd, i) =>
        if (r.isNullAt(i)) node.putNull(fd.name)
        else fd.dataType match {
          case LongType => node.put(fd.name, r.getLong(i))
          case IntegerType => node.put(fd.name, r.getInt(i))
          case DoubleType => node.put(fd.name, r.getDouble(i))
          case StringType => node.put(fd.name, r.getString(i))
          case BooleanType => node.put(fd.name, r.getBoolean(i))
          case dt => throw new UnsupportedOperationException(s"type $dt")
        }
      }
      out.println(mapper.writeValueAsString(node))
      val k = r.getLong(keyIdx)
      minKey = math.min(minKey, k); maxKey = math.max(maxKey, k)
      pageRows += 1
      if (pageRows >= pageSize) { closePage(); openPage() }
    }
    closePage()
    val root = mapper.createObjectNode()
    root.put("keyCol", keyCol)
    root.put("schemaDdl", schema.toDDL)
    val arr = root.putArray("pages")
    pages.foreach { p =>
      val n = arr.addObject()
      n.put("file", p.file); n.put("rows", p.rows)
      n.put("minKey", p.minKey); n.put("maxKey", p.maxKey)
    }
    val mw = new PrintWriter(new File(f, "_manifest.json"), "UTF-8")
    mw.println(mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    mw.close()
  }
}
