package graft.sources

import java.util

import com.fasterxml.jackson.databind.JsonNode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference, NullOrdering, SortDirection, SortOrder => V2SortOrder}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SoQL-faithful OFFSET pagination for the `graft-paged` provider
  * (`mode=offset`) — the wire contract the reference actually speaks
  * (`scripts/extract.py:56-72`): manifest-less `$limit`/`$offset` GETs
  * against a rows endpoint, pushed filters serialized into `$where`
  * (`scripts/extract.py:61-63`), required columns into `$select`, looping
  * until a short page. The server — Socrata in the reference, the loopback
  * fixture here — interprets the query string; the client never sees rows
  * the predicate excluded.
  *
  * Two planning shapes:
  *  - `probeCount=true` (default): one planning-time `$select=count(1)`
  *    probe with the same `$where` sizes the result, then ONE
  *    InputPartition PER OFFSET PAGE → pages fetch in parallel across
  *    executors (the count query is itself SoQL — Socrata answers it).
  *    Each page still stops early if the server returns fewer rows than
  *    `$limit` (data shrank between probe and fetch — offset paging is not
  *    snapshot-consistent, exactly as against the real API).
  *  - `probeCount=false`: a single partition walking
  *    `$offset += $limit` until a short page — the reference's serial loop,
  *    byte-for-byte the same GET sequence, for servers without count().
  *
  * Schema is EXPLICIT (`.schema(...)`): there is no manifest to infer from,
  * matching the reference where the column list is hard-coded
  * (`scripts/extract.py:33-41`).
  *
  * Filters serialized into `$where` are TRUSTED to the server — the same
  * trust the reference's protocol places in Socrata (page counts and
  * offsets all index the server-filtered set, so a mis-evaluating server
  * corrupts paging regardless of any client re-check), and what allows
  * aggregates to push below the filter. The fixture server's evaluation
  * is therefore spec-pinned to Spark's exact comparison semantics;
  * predicates the wire grammar can't express stay residual in Spark.
  */
object SoqlWire {
  /** SoQL literal rendering; None = not expressible, filter stays
    * client-side only.
    */
  private def lit(v: Any): Option[String] = v match {
    case l: Long    => Some(l.toString)
    case i: Int     => Some(i.toString)
    case s: Short   => Some(s.toString)
    case b: Byte    => Some(b.toString)
    case d: Double  => Some(d.toString)
    case f: Float   => Some(f.toString)
    case s: String  => Some("'" + s.replace("'", "''") + "'")
    case b: Boolean => Some(b.toString)
    case _          => None
  }

  /** One comparison filter → SoQL clause, if expressible. */
  def render(f: Filter): Option[String] = f match {
    case EqualTo(c, v)            => lit(v).map(l => s"$c = $l")
    case GreaterThan(c, v)        => lit(v).map(l => s"$c > $l")
    case GreaterThanOrEqual(c, v) => lit(v).map(l => s"$c >= $l")
    case LessThan(c, v)           => lit(v).map(l => s"$c < $l")
    case LessThanOrEqual(c, v)    => lit(v).map(l => s"$c <= $l")
    case IsNotNull(c)             => Some(s"$c IS NOT NULL")
    case _                        => None
  }

  def renderAll(filters: Seq[Filter]): Option[String] = {
    val clauses = filters.flatMap(render)
    if (clauses.isEmpty) None else Some(clauses.mkString(" AND "))
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  /** Render a pushed sort as the SoQL `$order` value: `col ASC,col2 DESC`. */
  def renderOrder(cols: Seq[(String, Boolean)]): String =
    cols.map { case (c, asc) => s"$c ${if (asc) "ASC" else "DESC"}" }.mkString(",")

  /** Build a rows-endpoint URL with the SoQL query parameters. */
  def pageUrl(endpoint: String, select: Option[String], where: Option[String],
              order: Option[String], limit: Option[Long], offset: Option[Long],
              group: Option[String] = None): String = {
    val params =
      select.map(s => "$select" -> s).toSeq ++
        where.map(w => "$where" -> w) ++
        group.map(g => "$group" -> g) ++
        order.map(o => "$order" -> o) ++
        limit.map(l => "$limit" -> l.toString) ++
        offset.map(o => "$offset" -> o.toString)
    if (params.isEmpty) endpoint
    else endpoint + "?" + params.map { case (k, v) => enc(k) + "=" + enc(v) }.mkString("&")
  }

  // ---------------- fixture-server-side evaluation (LoopbackPages) ------
  // The loopback stand-in for Socrata's query engine: parses the clause
  // grammar `render` emits (`col op literal [AND ...]`) and evaluates it
  // against a JSON row. Fixture infrastructure, not the engine's read path
  // — the CLIENT never evaluates $where.

  private val Clause = """\s*(\w+)\s*(<=|>=|=|<|>)\s*(.+?)\s*""".r

  /** Split a rendered `$where` into clauses on " AND " OUTSIDE quoted
    * string literals — a pushed value like `'1-URGENT AND 2-HIGH'` is one
    * literal, not a conjunction. (The `''` escape toggles the quote state
    * twice, which is self-consistent.)
    */
  private def splitClauses(where: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < where.length) {
      val c = where.charAt(i)
      if (c == '\'') { inQuote = !inQuote; sb.append(c); i += 1 }
      else if (!inQuote && where.startsWith(" AND ", i)) {
        out += sb.toString; sb.clear(); i += 5
      } else { sb.append(c); i += 1 }
    }
    out += sb.toString
    out.result()
  }

  /** Unsigned UTF-8 byte order — Spark compares strings as `UTF8String`
    * bytes, and Java's UTF-16 `compareTo` DISAGREES for supplementary
    * characters (surrogates sort below U+E000..U+FFFF; their UTF-8
    * encodings sort above). The paging offsets index the server-filtered
    * set, so the server must reproduce Spark's ordering exactly —
    * under-inclusion loses rows the residual filter can never restore.
    */
  private def utf8Cmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def cmpToBool(op: String, cmp: Int): Boolean = op match {
    case "="  => cmp == 0
    case ">"  => cmp > 0
    case ">=" => cmp >= 0
    case "<"  => cmp < 0
    case "<=" => cmp <= 0
  }

  /** Evaluate a rendered `$where` against one JSON row. Unknown columns /
    * malformed clauses throw — a fixture server that silently matched
    * everything would hide a broken pushdown. Numeric comparison is EXACT
    * (BigDecimal, never a double round-trip: a bigint above 2^53 must not
    * round onto its neighbor); string comparison is UTF-8 byte order to
    * match Spark.
    */
  private val NotNullClause = """\s*(\w+)\s+IS\s+NOT\s+NULL\s*""".r

  def eval(where: String, row: JsonNode): Boolean =
    splitClauses(where).forall {
      case NotNullClause(col) =>
        val node = row.get(col)
        node != null && !node.isNull
      case Clause(col, op, rawLit) =>
        val node = row.get(col)
        if (node == null || node.isNull) false
        else if (rawLit.startsWith("'")) {
          val v = rawLit.stripPrefix("'").stripSuffix("'").replace("''", "'")
          cmpToBool(op, utf8Cmp(node.asText(), v))
        } else if (rawLit == "true" || rawLit == "false") {
          op == "=" && node.asBoolean() == (rawLit == "true")
        } else if (!node.isNumber) {
          false // type-mismatched clause matches nothing
        } else {
          cmpToBool(op, node.decimalValue().compareTo(new java.math.BigDecimal(rawLit)))
        }
      case other => throw new IllegalArgumentException(s"unparseable clause: $other")
    }

  /** Comparator over JSON rows for a rendered `$order` spec, reproducing
    * Spark's default sort semantics exactly: nulls first ascending / last
    * descending, numbers by exact decimal value, strings by unsigned
    * UTF-8 bytes. (Fixture-server-side, like [[eval]].)
    */
  def orderComparator(spec: String): java.util.Comparator[JsonNode] = {
    val keys = spec.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { part =>
      val bits = part.split("\\s+")
      // reject unknown direction tokens instead of silently sorting DESC
      require(bits.length <= 2 &&
        (bits.length < 2 || bits(1).equalsIgnoreCase("ASC") || bits(1).equalsIgnoreCase("DESC")),
        s"unparseable $$order part: $part")
      (bits(0), bits.length < 2 || bits(1).equalsIgnoreCase("ASC"))
    }
    (a: JsonNode, b: JsonNode) =>
      keys.iterator.map { case (c, asc) =>
        val (x, y) = (a.get(c), b.get(c))
        val xn = x == null || x.isNull
        val yn = y == null || y.isNull
        if (xn && yn) 0
        else if (xn) { if (asc) -1 else 1 } // nulls first asc / last desc
        else if (yn) { if (asc) 1 else -1 }
        else {
          val base = nodeCompare(x, y)
          if (asc) base else -base
        }
      }.find(_ != 0).getOrElse(0)
  }

  /** Non-null JSON value compare matching Spark: exact decimal for
    * numbers, unsigned UTF-8 bytes for strings.
    */
  def nodeCompare(x: JsonNode, y: JsonNode): Int =
    if (x.isNumber && y.isNumber) x.decimalValue().compareTo(y.decimalValue())
    else if (x.isBoolean && y.isBoolean) java.lang.Boolean.compare(x.asBoolean(), y.asBoolean())
    else utf8Cmp(x.asText(), y.asText())

  // ---------------- fixture-server-side $select / $group evaluation ----

  sealed trait SelItem
  case class BareCol(name: String) extends SelItem
  case class AggItem(fn: String, arg: String, alias: String) extends SelItem

  private val AggRe = """(?i)(count|sum|min|max)\((\w+|1)\)(?:\s+as\s+(\w+))?""".r

  def parseSelect(sel: String): Seq[SelItem] =
    sel.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map {
      case AggRe(fn, arg, alias) =>
        AggItem(fn.toLowerCase, arg,
          Option(alias).getOrElse(s"${fn.toLowerCase}($arg)"))
      case c if c.matches("""\w+""") => BareCol(c)
      case other => throw new IllegalArgumentException(s"unparseable $$select item: $other")
    }

  /** Evaluate `$select` aggregates over `$group` groups — the server side
    * of complete aggregate pushdown (and of the planning count probe,
    * which is the degenerate global-group case). Exact arithmetic:
    * counts/integral sums in integers, double sums in BigDecimal, min/max
    * by [[nodeCompare]]; SQL semantics: aggregates skip nulls, empty
    * input yields one row for a global aggregate and zero rows grouped.
    */
  def evalAggregate(rows: Vector[JsonNode], groupCols: Seq[String],
                    items: Seq[SelItem],
                    mapper: com.fasterxml.jackson.databind.ObjectMapper): Vector[JsonNode] = {
    val groups = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[JsonNode]]()
    // canonical group key: numerically equal values must land in ONE group
    // even when pages render them differently ({"x":5} vs {"x":5.0}) —
    // there is no Spark Aggregate left above a COMPLETE pushdown to merge
    // split groups
    def canon(n: JsonNode): String =
      if (n == null || n.isNull) "\u0000null"
      else if (n.isNumber) n.decimalValue().stripTrailingZeros().toPlainString
      else n.asText()
    if (groupCols.isEmpty) {
      val b = groups.getOrElseUpdate("", scala.collection.mutable.ArrayBuffer())
      b ++= rows
    } else rows.foreach { r =>
      val k = groupCols.map(c => canon(r.get(c))).mkString("\u0000")
      groups.getOrElseUpdate(k, scala.collection.mutable.ArrayBuffer()) += r
    }
    val ord = scala.math.Ordering.comparatorToOrdering(
      new java.util.Comparator[JsonNode] {
        def compare(a: JsonNode, b: JsonNode): Int = nodeCompare(a, b)
      })
    groups.values.iterator.map { grp =>
      val o = mapper.createObjectNode()
      items.foreach {
        case BareCol(c) =>
          o.set[JsonNode](c, if (grp.nonEmpty) grp.head.get(c) else null)
        case AggItem("count", "1", alias) => o.put(alias, grp.size.toLong)
        case AggItem("count", c, alias) =>
          o.put(alias, grp.count(r => { val n = r.get(c); n != null && !n.isNull }).toLong)
        case AggItem(fn @ ("min" | "max"), c, alias) =>
          val vals = grp.iterator.map(_.get(c)).filter(n => n != null && !n.isNull).toSeq
          if (vals.isEmpty) o.putNull(alias)
          else o.set[JsonNode](alias, if (fn == "min") vals.min(ord) else vals.max(ord))
        case AggItem("sum", c, alias) =>
          val vals = grp.iterator.map(_.get(c)).filter(n => n != null && !n.isNull).toVector
          if (vals.isEmpty) o.putNull(alias)
          else {
            val s = vals.foldLeft(java.math.BigDecimal.ZERO)((acc, n) => acc.add(n.decimalValue()))
            // longValueExact THROWS on overflow (→ a failed request → the
            // scan errors): Spark 4 defaults to ANSI mode, where the
            // un-pushed sum raises ARITHMETIC_OVERFLOW — erroring matches
            // it; silently wrapping would hand back a wrong number with
            // no Aggregate left in Spark to notice
            if (vals.forall(_.isIntegralNumber)) o.put(alias, s.longValueExact())
            else o.put(alias, s.doubleValue())
          }
        case AggItem(fn, _, _) =>
          throw new IllegalArgumentException(s"unsupported aggregate: $fn")
      }
      o: JsonNode
    }.toVector
  }
}

class SoqlTable(endpoint: String, schema: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft-soql:$endpoint"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SoqlScanBuilder(endpoint, schema, PagedTable.retryOf(options),
      options.getLong("pageSize", 1000L),
      options.getBoolean("probeCount", true),
      options.getLong("aggLimit", 1000000L),
      // `$order` on every data GET — Socrata's own recommendation for
      // offset paging: without it, page N's contents may shift between
      // requests ("col" or "col DESC,col2"; not needed by the loopback
      // fixture, whose natural order is stable, but the faithful client
      // shape against a real API)
      Option(options.get("pageOrder")),
      options.getLong("maxRowsPerTrigger", 0L))
}

class SoqlScanBuilder(endpoint: String, fullSchema: StructType, retry: RetryPolicy,
                      pageSize: Long, probeCount: Boolean,
                      aggLimit: Long = 1000000L,
                      pageOrder: Option[String] = None,
                      maxRowsPerTrigger: Long = 0L)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownRequiredColumns
    with SupportsPushDownTopN with SupportsPushDownAggregates
    with SupportsPushDownOffset {
  require(pageSize >= 1, s"pageSize must be >= 1, got $pageSize")
  // aggLimit <= 0 would send $limit=0 AND disarm the truncation tripwire:
  // an empty aggregate would return as a "successful" result
  require(aggLimit >= 1, s"aggLimit must be >= 1, got $aggLimit")

  private var where: Option[String] = None
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var topN: Option[(Seq[(String, Boolean)], Int)] = None
  private var agg: Option[SoqlAgg] = None
  private var required: StructType = fullSchema

  private def colOf(e: V2Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames().length == 1 => Some(nr.fieldNames()(0))
    case _ => None
  }

  /** GROUP BY + count/sum/min/max → `$select=<aggs>&$group=<cols>`, SoQL's
    * native aggregation idiom — the whole aggregate runs server-side and
    * one row per group crosses the wire. COMPLETE pushdown (Spark's own
    * Aggregate node disappears): sound because the plan is a single
    * partition and the server computes exact results (counts/long-sums in
    * integer arithmetic, min/max by the same comparator Spark would use;
    * double sums accumulate in BigDecimal, if anything tighter than
    * IEEE-order summation). Distinct aggregates and non-column arguments
    * are rejected and stay in Spark.
    */
  private def translateAgg(a: Aggregation): Option[SoqlAgg] = {
    val groups = a.groupByExpressions().toSeq.map(colOf)
    if (groups.exists(_.isEmpty)) return None
    val groupCols = groups.flatten
    val items = a.aggregateExpressions().toSeq.zipWithIndex.map {
      case (_: CountStar, i) => Some((s"count(1) as agg$i", s"agg$i", LongType))
      case (c: Count, i) if !c.isDistinct =>
        colOf(c.column).map(n => (s"count($n) as agg$i", s"agg$i", LongType))
      case (m: Min, i) =>
        colOf(m.column).map(n => (s"min($n) as agg$i", s"agg$i",
          fullSchema(fullSchema.fieldIndex(n)).dataType))
      case (m: Max, i) =>
        colOf(m.column).map(n => (s"max($n) as agg$i", s"agg$i",
          fullSchema(fullSchema.fieldIndex(n)).dataType))
      case (s: Sum, i) if !s.isDistinct =>
        colOf(s.column).flatMap { n =>
          fullSchema(fullSchema.fieldIndex(n)).dataType match {
            case LongType | IntegerType => Some((s"sum($n) as agg$i", s"agg$i", LongType))
            // Double sums do NOT push: the server would accumulate in
            // BigDecimal while Spark sums in IEEE arrival order, so the
            // same query could change answer when pushdown fires
            // (e.g. [1e17, 1, -1e17] sums to 0.0 in double, 1.0 exactly)
            case _ => None
          }
        }
      case _ => None
    }
    if (items.exists(_.isEmpty)) return None
    val flat = items.flatten
    val schema = StructType(
      groupCols.map(c => fullSchema(fullSchema.fieldIndex(c))) ++
        flat.map { case (_, name, dt) => StructField(name, dt) })
    Some(SoqlAgg(
      select = (groupCols ++ flat.map(_._1)).mkString(","),
      group = groupCols.mkString(","),
      schema = schema))
  }

  // Spark calls supportCompletePushDown then pushAggregation with the same
  // Aggregation; translate once
  private var lastTranslated: Option[(Aggregation, Option[SoqlAgg])] = None
  private def translated(a: Aggregation): Option[SoqlAgg] = {
    if (!lastTranslated.exists(_._1 eq a)) lastTranslated = Some((a, translateAgg(a)))
    lastTranslated.get._2
  }

  override def supportCompletePushDown(a: Aggregation): Boolean = translated(a).isDefined

  override def pushAggregation(a: Aggregation): Boolean = {
    translated(a) match {
      case some @ Some(sa) =>
        agg = some
        // the scan now outputs agg results; Spark may still prune further
        required = sa.schema
        true
      case None => false
    }
  }

  /** `$where` serialization (`scripts/extract.py:61-63`): every expressible
    * comparison goes to the server and is TRUSTED (not kept residual) —
    * the same trust the reference's whole protocol places in Socrata's
    * `$where` (its page counts and offsets all assume server filtering),
    * and the prerequisite for pushing aggregates below the filter. The
    * fixture server's evaluation is spec-pinned to Spark's exact
    * semantics (BigDecimal numerics, UTF-8 string order); untranslatable
    * predicates stay residual in Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (translated, residual) = filters.partition(f => SoqlWire.render(f).isDefined)
    pushed = translated
    where = SoqlWire.renderAll(pushed.toSeq)
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** `$limit` cap on the page budget; partial pushdown, Spark re-applies. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); false }

  /** `OFFSET n` IS the protocol: shift the whole paged read by `n`
    * server-side (fully pushed — the server's row order is stable, which
    * is all Spark's offset-on-unordered-relation semantics require).
    * Declined after a TopN pushed: the sort/skip composition order would
    * then be Spark's to enforce.
    */
  private var baseOffset: Int = 0
  override def pushOffset(o: Int): Boolean =
    if (topN.isDefined) false
    else { baseOffset = o; true }

  /** `ORDER BY ... LIMIT k` → ONE GET with `$order=...&$limit=k`: the
    * whole TopN runs server-side (SoQL's native idiom — Socrata docs
    * recommend `$order` for every paged read). FULLY pushed, so Spark
    * drops its Sort and Limit — sound because the plan collapses to a
    * single partition and the fixture server reproduces Spark's exact
    * ordering (unsigned UTF-8 bytes for strings, exact decimal compare,
    * default null placement). Only simple column references with default
    * null ordering are accepted; anything else stays in Spark.
    */
  override def pushTopN(orders: Array[V2SortOrder], l: Int): Boolean = {
    val cols = orders.toSeq.map { so =>
      colOf(so.expression()).flatMap { name =>
        val asc = so.direction() == SortDirection.ASCENDING
        val defaultNulls = so.nullOrdering() ==
          (if (asc) NullOrdering.NULLS_FIRST else NullOrdering.NULLS_LAST)
        if (defaultNulls) Some(name -> asc) else None
      }
    }
    if (cols.isEmpty || cols.exists(_.isEmpty)) false
    else { topN = Some((cols.flatten, l)); true }
  }
  override def isPartiallyPushed(): Boolean = false

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan =
    new SoqlScan(endpoint, fullSchema, required, where, limit, topN, agg, pageOrder,
      pageSize, probeCount, aggLimit, retry, baseOffset, maxRowsPerTrigger)
}

/** A complete-pushdown aggregation: the `$select` aggregate list, the
  * `$group` columns, and the scan output schema (group cols + agg values).
  */
case class SoqlAgg(select: String, group: String, schema: StructType)

/** One InputPartition per `$offset` page (count-probed), or a single
  * serial-loop partition (`probeCount=false`).
  */
case class SoqlPagePartition(url: String, required: StructType, retry: RetryPolicy,
                             failAtRows: Long = -1L,
                             exactRows: Long = -1L) extends InputPartition
case class SoqlSerialPartition(endpoint: String, select: Option[String],
                               where: Option[String], order: Option[String],
                               pageSize: Long,
                               maxRows: Long, required: StructType,
                               retry: RetryPolicy,
                               startOffset: Long = 0L) extends InputPartition

class SoqlScan(endpoint: String, fullSchema: StructType, required: StructType,
               where: Option[String], limit: Option[Int],
               topN: Option[(Seq[(String, Boolean)], Int)],
               agg: Option[SoqlAgg],
               pageOrder: Option[String], pageSize: Long,
               probeCount: Boolean, aggLimit: Long, retry: RetryPolicy,
               baseOffset: Int = 0,
               maxRowsPerTrigger: Long = 0L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // `$select` mirrors column pruning into the wire format — but never an
  // empty projection (a bare count() pushes zero columns; ask for the
  // first schema column so rows still frame correctly).
  private def select: Option[String] = {
    val cols = if (required.isEmpty) fullSchema.fieldNames.take(1) else required.fieldNames
    Some(cols.mkString(","))
  }

  override def description(): String =
    s"graft-soql endpoint=$endpoint where=${where.getOrElse("-")} " +
      s"limit=${limit.getOrElse(-1)} offset=$baseOffset " +
      s"topN=${topN.map(t => SoqlWire.renderOrder(t._1) + " LIMIT " + t._2).getOrElse("-")} " +
      s"agg=${agg.map(a => a.select + (if (a.group.nonEmpty) " GROUP BY " + a.group else "")).getOrElse("-")} " +
      s"pageSize=$pageSize probeCount=$probeCount"

  override def planInputPartitions(): Array[InputPartition] = {
    val cap = limit.map(_.toLong).getOrElse(Long.MaxValue)
    if (agg.isDefined) {
      // complete aggregate pushdown: one GET carries $select (aggregates)
      // + $group (+ a TopN's $order/$limit when Spark pushed one on the
      // aggregated relation); one row per group comes back. When no user
      // limit was pushed, an explicit safety $limit still goes on the
      // wire: real SODA endpoints apply a DEFAULT row cap (1000) that
      // would silently truncate the group list — the reader treats a
      // response that fills the safety cap as an error, not a result.
      val a = agg.get
      val userLimit = topN.map(_._2.toLong).orElse(limit.map(_.toLong))
      Array(SoqlPagePartition(
        SoqlWire.pageUrl(endpoint, Some(a.select), where,
          topN.map(t => SoqlWire.renderOrder(t._1)),
          userLimit.orElse(Some(aggLimit)),
          if (baseOffset > 0) Some(baseOffset.toLong) else None,
          group = Some(a.group).filter(_.nonEmpty)),
        required, retry,
        failAtRows = if (userLimit.isEmpty) aggLimit else -1L))
    } else if (topN.isDefined) {
      // fully-pushed ORDER BY + LIMIT: one GET, the server sorts and caps
      val (cols, k) = topN.get
      Array(SoqlPagePartition(
        SoqlWire.pageUrl(endpoint, select, where, Some(SoqlWire.renderOrder(cols)),
          Some(math.min(k.toLong, cap)), Some(0L)),
        required, retry))
    } else if (!probeCount) {
      Array(SoqlSerialPartition(endpoint, select, where, pageOrder, pageSize,
        cap, required, retry, baseOffset.toLong))
    } else {
      // Planning-time count probe — itself a SoQL query with the SAME
      // $where, so the server sizes exactly what the scan will read.
      val total = SoqlCount.probe(endpoint, where, retry)
      // a pushed OFFSET shifts the whole read window server-side
      val n = math.min(math.max(0L, total - baseOffset), cap)
      val pages = ((n + pageSize - 1) / pageSize).toInt
      (0 until pages).map { i =>
        val off = baseOffset + i.toLong * pageSize
        val rows = math.min(pageSize, n - i.toLong * pageSize)
        // the LAST page asks for exactly its remainder, not a full
        // pageSize — over-asking ships rows the pushed limit would drop
        SoqlPagePartition(
          SoqlWire.pageUrl(endpoint, select, where, pageOrder, Some(rows), Some(off)),
          required, retry): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = SoqlScan.readerFactory

  /** S1 × I2 over the OFFSET protocol as idiomatic Structured Streaming:
    * the streaming offset is the count of rows of the server-filtered,
    * stably-ordered result set consumed so far, so checkpointLocation owns
    * exactly the cursor the reference's resumable `$offset` loop tracks by
    * hand (`scripts/extract.py:56-72` + watermark file). Each trigger
    * re-probes `count(1)` with the same `$where` — the incremental poll —
    * and reads only the appended tail. Requires the source to be
    * append-only under a stable order (the reference's own watermark
    * assumption); a shrunken result set fails the resume LOUDLY.
    */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    // Filters/columns compose with streaming (they fix the set the offset
    // indexes for the query's lifetime); a pushed TopN / aggregate /
    // OFFSET reshapes the wire protocol with no incremental meaning.
    // Spark never pushes those below a streaming relation today — fail
    // loudly if that ever changes rather than mis-stream.
    require(agg.isEmpty && topN.isEmpty && baseOffset == 0,
      s"graft-soql streaming supports filter/column pushdown only " +
        s"(got agg=$agg topN=$topN offset=$baseOffset)")
    // The streaming cursor IS the count(1) of the filtered set — a server
    // that can't count (probeCount=false, the serial loop-until-short-page
    // protocol) has no offset to checkpoint. Reject up front rather than
    // letting every trigger die in the probe with an opaque IOException.
    require(probeCount,
      "graft-soql streaming requires count-probe support (probeCount=true): " +
        "the streaming offset is the server-side count(1) of the filtered set")
    new SoqlMicroBatchStream(endpoint, select, where, pageOrder, pageSize,
      required, retry, maxRowsPerTrigger)
  }
}

object SoqlScan {
  private[sources] val readerFactory: PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        partition match {
          case p: SoqlPagePartition   => new SoqlPageReader(p)
          case p: SoqlSerialPartition => new SoqlSerialReader(p)
        }
    }
}

/** The `$select=count(1)` probe shared by batch planning and the streaming
  * poll. A response that doesn't carry the count FAILS LOUDLY: defaulting
  * to zero would plan an empty scan and masquerade as "no data".
  */
object SoqlCount {
  def probe(endpoint: String, where: Option[String], retry: RetryPolicy): Long = {
    val url = SoqlWire.pageUrl(endpoint, Some("count(1) as cnt"), where, None, None, None)
    val body = new String(PagedFetch.fetchBytes(url, retry), "UTF-8")
    val line = body.linesIterator.find(_.nonEmpty).getOrElse(
      throw new java.io.IOException(s"empty count-probe response from $url"))
    val cnt = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line).get("cnt")
    if (cnt == null || (!cnt.isNumber && !cnt.isTextual))
      throw new java.io.IOException(
        s"count probe returned no usable 'cnt' field from $url: $line")
    // Socrata returns counts as strings; accept both shapes
    if (cnt.isNumber) cnt.asLong() else cnt.asText().toLong
  }
}

/** Streaming offset = rows consumed of the server-filtered ordered set. */
case class SoqlStreamOffset(rows: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"rows":$rows}"""
}

object SoqlStreamOffset {
  def parse(json: String): SoqlStreamOffset =
    SoqlStreamOffset(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json).get("rows").asLong())
}

class SoqlMicroBatchStream(endpoint: String, select: Option[String],
                           where: Option[String], order: Option[String],
                           pageSize: Long, required: StructType,
                           retry: RetryPolicy, maxRowsPerTrigger: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => StreamOffset, ReadLimit}

  // AvailableNow pins the drain target at query start: ONE probe, then the
  // run consumes exactly [start, target) even while the server keeps
  // growing. Long.MaxValue = not an AvailableNow run → probe per trigger.
  @volatile private var availableNowCap: Long = Long.MaxValue
  @volatile private var lastTotal: Long = 0L

  private def probeTotal(): Long = {
    val t = SoqlCount.probe(endpoint, where, retry)
    lastTotal = t
    t
  }

  override def initialOffset(): StreamOffset = SoqlStreamOffset(0L)
  override def deserializeOffset(json: String): StreamOffset = SoqlStreamOffset.parse(json)
  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()

  override def prepareForTriggerAvailableNow(): Unit = availableNowCap = probeTotal()

  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerTrigger > 0) ReadLimit.maxRows(maxRowsPerTrigger)
    else ReadLimit.allAvailable()

  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with admission control")

  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val from = start.asInstanceOf[SoqlStreamOffset].rows
    val total =
      if (availableNowCap != Long.MaxValue) availableNowCap
      // append-only ⇒ total is monotone: a previous probe that already
      // proved a backlog (from < lastTotal) makes this trigger's count(1)
      // round trip redundant — drain the known backlog first, re-probe
      // only once the cursor catches up.
      else if (from < lastTotal) lastTotal
      else probeTotal()
    // Rows [0, from) were consumed under the append-only contract; a
    // count below the cursor means history was rewritten — silently
    // re-aligning would skip or replay data.
    require(total >= from,
      s"soql-stream checkpoint has consumed $from rows but the server now " +
        s"reports $total matching $$where=${where.getOrElse("-")} — the " +
        s"result set shrank while the query was down (the offset protocol " +
        s"is append-only). Deletions/rewrites require a fresh checkpoint.")
    // Honor the limit the ENGINE passes, not the constructor option:
    // Trigger.Once explicitly sends allAvailable() to override the
    // source's default (process-everything contract). min against the
    // remainder also keeps from+maxRows overflow-safe at Long.MaxValue.
    val step = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        math.min(r.maxRows(), total - from)
      case _ => total - from
    }
    SoqlStreamOffset(from + step)
  }

  override def reportLatestOffset(): StreamOffset = SoqlStreamOffset(lastTotal)

  override def planInputPartitions(start: StreamOffset, end: StreamOffset): Array[InputPartition] = {
    val from = start.asInstanceOf[SoqlStreamOffset].rows
    val to = end.asInstanceOf[SoqlStreamOffset].rows
    val pages = ((to - from) + pageSize - 1) / pageSize
    (0L until pages).map { i =>
      val off = from + i * pageSize
      val rows = math.min(pageSize, to - off)
      // exactRows: in batch a short page just ends early (the result is
      // whatever the server holds NOW); in streaming the offsets are
      // already committed, so a short page means rows this batch owns
      // vanished mid-flight — fail the batch, don't silently drop them.
      SoqlPagePartition(
        SoqlWire.pageUrl(endpoint, select, where, order, Some(rows), Some(off)),
        required, retry, exactRows = rows): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = SoqlScan.readerFactory
}

/** Reads one offset page. A short page (server shrank since the probe) just
  * ends early — Spark's residual filter/limit keep the result exact.
  */
class SoqlPageReader(p: SoqlPagePartition) extends PartitionReader[InternalRow] {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val lines = PagedFetch.fetchLines(p.url, p.retry)
  private var seen = 0L
  private var row: InternalRow = _
  override def next(): Boolean =
    if (!lines.hasNext) {
      // streaming partitions pin their row count: the offsets are already
      // committed, so a short page = owned rows vanished mid-batch
      if (p.exactRows >= 0 && seen < p.exactRows)
        throw new java.io.IOException(
          s"page returned $seen of ${p.exactRows} expected rows — the " +
            s"server-side result set shrank mid-batch (the streaming offset " +
            s"protocol is append-only): ${p.url}")
      false
    } else {
      seen += 1
      // tripwire for silent server-side truncation: a response that fills
      // its entire safety $limit (set only when no user limit was pushed)
      // is indistinguishable from a capped one — fail instead of
      // returning a quietly incomplete result
      if (p.failAtRows > 0 && seen >= p.failAtRows)
        throw new java.io.IOException(
          s"response filled its entire $$limit=${p.failAtRows} safety cap — " +
            s"likely server-side truncation (raise the aggLimit reader option): ${p.url}")
      row = JsonLineRows.parse(mapper, lines.next(), p.required)
      true
    }
  override def get(): InternalRow = row
  override def close(): Unit = lines.close()
}

/** The reference's serial page loop (`scripts/extract.py:56-72`): GET with
  * `$offset`, stop when a page returns fewer than `$limit` rows.
  */
class SoqlSerialReader(p: SoqlSerialPartition) extends PartitionReader[InternalRow] {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private var offset = p.startOffset
  private var emitted = 0L
  private var pageRows = 0L   // rows seen in the current page
  private var reqLim = 0L     // the $limit the current page was asked for
  private var lines: PagedFetch.PagedLineIterator = _
  private var row: InternalRow = _

  private def openPage(): Unit = {
    reqLim = math.min(p.pageSize, p.maxRows - emitted)
    lines = PagedFetch.fetchLines(
      SoqlWire.pageUrl(p.endpoint, p.select, p.where, p.order, Some(reqLim), Some(offset)),
      p.retry)
    pageRows = 0
  }

  override def next(): Boolean = {
    if (emitted >= p.maxRows) return false
    if (lines == null) openPage()
    while (!lines.hasNext) {
      val short = pageRows < reqLim // fewer rows than asked ⇒ server is out
      lines.close()
      offset += pageRows
      if (short || emitted >= p.maxRows) return false
      openPage()
    }
    row = JsonLineRows.parse(mapper, lines.next(), p.required)
    pageRows += 1
    emitted += 1
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = if (lines != null) lines.close()
}

/** Shared JSONL-row → InternalRow conversion (manifest and offset modes
  * parse identical wire rows).
  */
object JsonLineRows {
  def parse(mapper: com.fasterxml.jackson.databind.ObjectMapper, line: String,
            required: StructType): InternalRow = {
    val node = mapper.readTree(line)
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      val f = required.fields(i)
      val n = node.get(f.name)
      vals(i) =
        if (n == null || n.isNull) null
        else f.dataType match {
          case LongType    => n.asLong()
          case IntegerType => n.asInt()
          case DoubleType  => n.asDouble()
          case StringType  => org.apache.spark.unsafe.types.UTF8String.fromString(n.asText())
          case BooleanType => n.asBoolean()
          case dt => throw new UnsupportedOperationException(s"type $dt")
        }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }
}
