package graft.ops

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, LessThan, Literal}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.VersionedTable.ColStat

/** Manifest stats lifted from the parquet FOOTERS a commit just wrote —
  * the zero-extra-jobs path behind [[VersionedTable]]'s commits. The
  * footers already hold exact per-column (min, max, nullCount) and exact
  * row counts; re-scanning the output to recompute them doubles every
  * commit's IO at 100 TB. Values convert to Catalyst INTERNAL form and
  * render through the same `Cast(x, STRING)` (session timezone included)
  * as the scan-side aggregation, so manifests are encoding-identical
  * whichever path produced them (spec-pinned).
  *
  * Strictly conservative: `lift` returns None — sending the whole commit
  * down the scan path — whenever ANY (file, column) lacks trustworthy
  * footer stats: float/double columns (parquet excludes NaN from stats
  * while Spark orders NaN largest), INT96 timestamps (no usable order),
  * NANOS units (truncation would break the max bound), legacy-ambiguous
  * binary orderings (parquet-mr itself reports those stats as absent),
  * or simply dropped statistics. An all-null chunk set IS usable (it is
  * the all-null ColStat). Commits beyond `maxFooterFiles` also fall back
  * — a serial driver footer loop stops amortizing where a scan starts
  * to.
  */
object FooterStats {

  private val maxFooterFiles = 512

  /** Row count of one parquet file from its FOOTER — a driver-side
    * metadata read (no Spark job), used by the DV auto-materialize
    * policy to size sidecars without scanning them.
    */
  def rowCount(path: Path, conf: org.apache.hadoop.conf.Configuration): Long = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
    val footer = try reader.getFooter finally reader.close()
    import scala.jdk.CollectionConverters._
    footer.getBlocks.asScala.map(_.getRowCount).sum
  }

  def lift(spark: SparkSession, commitDir: Path, statsCols: Seq[String],
           schema: StructType): Option[Seq[(String, Long, Map[String, ColStat])]] = {
    val unsupported = statsCols.exists(c => schema(c).dataType match {
      case FloatType | DoubleType => true
      case _ => false
    })
    if (unsupported) return None
    val conf = spark.sessionState.newHadoopConf()
    val fs = commitDir.getFileSystem(conf)
    if (!fs.exists(commitDir)) return Some(Seq.empty)
    val parts = fs.listStatus(commitDir)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    if (parts.length > maxFooterFiles) return None
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    // footer opens are independent ~ms-scale IO waits: a serial loop puts
    // file-count × latency on EVERY commit's critical path, so lift in
    // parallel on a bounded pool (a handful of files stays inline — the
    // pool would cost more than it saves)
    val lifted: Seq[Option[(String, Long, Map[String, ColStat])]] =
      if (parts.length <= 4) parts.toSeq.map(liftOne(_, conf, statsCols, schema, tz))
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(16, parts.length))
        try {
          parts.toSeq.map { p =>
            pool.submit(new java.util.concurrent.Callable[
                Option[(String, Long, Map[String, ColStat])]] {
              override def call() = liftOne(p, conf, statsCols, schema, tz)
            })
          }.map(_.get())
        } finally pool.shutdown()
      }
    if (lifted.exists(_.isEmpty)) None
    // 0-row part files carry no data and no information — the scan path
    // never produced entries for them either
    else Some(lifted.flatten.filter(_._2 > 0).toSeq)
  }

  private def liftOne(st: FileStatus, conf: org.apache.hadoop.conf.Configuration,
                      statsCols: Seq[String], schema: StructType, tz: String)
      : Option[(String, Long, Map[String, ColStat])] = {
    import scala.jdk.CollectionConverters._
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
    val footer = try reader.getFooter finally reader.close()
    val blocks = footer.getBlocks.asScala.toSeq
    val rows = blocks.map(_.getRowCount).sum
    val perCol = statsCols.map { c =>
      val dt = schema(c).dataType
      val chunks = blocks.map(_.getColumns.asScala
        .find(_.getPath.toDotString == c))
      if (chunks.exists(_.isEmpty)) return None // nested/missing column
      val stats = chunks.flatten.map(_.getStatistics)
      if (stats.exists(s => s == null || s.isEmpty || !s.isNumNullsSet))
        return None // dropped or untrustworthy footer stats
      val nulls = stats.map(_.getNumNulls).sum
      val nonNull = stats.filter(_.hasNonNullValue)
      if (nonNull.isEmpty) {
        // `hasNonNullValue == false` does NOT imply all-null: INT96 (and
        // other no-order encodings) record null counts but never values.
        // Only the arithmetic proof nulls == rows licenses the all-null
        // ColStat — anything else falls back to the scan path, because a
        // fabricated (None, None) stat would let pruning DROP a live file
        if (nulls == rows) c -> ColStat(dt.sql, None, None, nulls)
        else return None
      } else {
        val pt = chunks.flatten.head.getPrimitiveType
        val mins = nonNull.map(s => internalOf(minOf(s), dt, pt))
        val maxs = nonNull.map(s => internalOf(maxOf(s), dt, pt))
        if (mins.exists(_.isEmpty) || maxs.exists(_.isEmpty)) return None
        val mn = mins.flatten.reduce((a, b) => if (less(a, b, dt)) a else b)
        val mx = maxs.flatten.reduce((a, b) => if (less(a, b, dt)) b else a)
        c -> ColStat(dt.sql, Some(render(mn, dt, tz)), Some(render(mx, dt, tz)),
          nulls)
      }
    }.toMap
    Some((st.getPath.getName, rows, perCol))
  }

  private def minOf(s: Statistics[_]): Any = s.genericGetMin
  private def maxOf(s: Statistics[_]): Any = s.genericGetMax

  /** Footer value → Catalyst internal value for `dt`, consulting the
    * column's parquet `PrimitiveType` where the physical encoding is
    * ambiguous; None = untrusted (commit falls back to the scan path).
    */
  private def internalOf(v: Any, dt: DataType,
                         pt: org.apache.parquet.schema.PrimitiveType): Option[Any] =
    (dt, v) match {
      case (LongType, l: java.lang.Long) => Some(l)
      case (IntegerType, i: java.lang.Integer) => Some(i)
      case (ShortType, i: java.lang.Integer) => Some(i.shortValue())
      case (ByteType, i: java.lang.Integer) => Some(i.byteValue())
      case (BooleanType, b: java.lang.Boolean) => Some(b)
      case (StringType, b: Binary) => Some(UTF8String.fromBytes(b.getBytes))
      case (DateType, i: java.lang.Integer) => Some(i) // days since epoch
      case (TimestampType | TimestampNTZType, l: java.lang.Long) =>
        // trust only explicit MICROS/MILLIS annotations with the matching
        // UTC adjustment; INT96 arrives as Binary (no usable order) and
        // NANOS would floor-truncate the max bound — both refuse
        pt.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
              if ts.isAdjustedToUTC == (dt == TimestampType) =>
            ts.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MICROS => Some(l)
              case LogicalTypeAnnotation.TimeUnit.MILLIS =>
                Some(l * 1000L)
              case _ => None
            }
          case _ => None
        }
      case (d: DecimalType, i: java.lang.Integer) =>
        Some(Decimal(BigDecimal(BigInt(i.longValue()), d.scale), d.precision, d.scale))
      case (d: DecimalType, l: java.lang.Long) =>
        Some(Decimal(BigDecimal(BigInt(l.longValue()), d.scale), d.precision, d.scale))
      case (d: DecimalType, b: Binary) =>
        Some(Decimal(BigDecimal(BigInt(b.getBytes), d.scale), d.precision, d.scale))
      case _ => None
    }

  private def less(a: Any, b: Any, dt: DataType): Boolean =
    LessThan(Literal(a, dt), Literal(b, dt)).eval(null).asInstanceOf[Boolean]

  private def render(v: Any, dt: DataType, tz: String): String =
    Cast(Literal(v, dt), StringType, Some(tz)).eval(null).toString
}
