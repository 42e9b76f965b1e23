package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  // Schema-inference cache: a bare `spark.read.parquet(path)` runs a small
  // footer-reading Spark job EVERY call to infer the schema. The driver
  // tables are immutable fixtures, so infer once per path and construct
  // every later scan with the cached schema — query construction becomes
  // genuinely job-free (ContractSpec pins this), and at warehouse scale a
  // footer/listing job per plan construction is real driver latency.
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** `events.ts` has shipped in three parquet vintages: TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects — read as raw nanos via the
    * legacy conf and truncate to microseconds, the same ns→us truncation
    * DuckDB applies), TIMESTAMP(MICROS) adjusted-to-UTC (reads natively
    * as TimestampType), and TIMESTAMP(MICROS) with isAdjustedToUTC=false
    * (reads as TimestampNTZType). Dispatch on the type the footer
    * actually declares and normalize everything to TimestampType — every
    * downstream query was written against it, and under the UTC session
    * timezone the NTZ→TZ cast preserves the wall-clock exactly as
    * DuckDB's naive-timestamp oracle does.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // The legacy conf must be ON while the footer is probed (the NANOS
    // vintage cannot even be schema-read without it) — but it mutates
    // SHARED session state, so restore it unless the footer really is
    // nanos: only that vintage's SCANS depend on the conf at execution
    // time, and only then does the set stick (documented hazard: other
    // nanos-timestamp parquet in the same session would also read as
    // long while an events nanos plan is live).
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = s.conf.getOption(key)
    s.conf.set(key, "true")
    // the conf sticks ONLY for the nanos vintage (its scans depend on it
    // at execution time); every other exit — including a throw from a
    // missing/unreadable fixture — restores the session's prior value
    var keepConf = false
    try {
      val raw = apply(s, d, "events")
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      raw.schema("ts").dataType match {
        case LongType =>
          keepConf = true
          raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
        case TimestampNTZType =>
          raw.withColumn("ts", raw.col("ts").cast(TimestampType))
        case TimestampType => raw
        // fail at LOAD time with the vintage named — a wildcard pass-through
        // would re-create round 8's failure mode, where an unannounced
        // fixture retype surfaced only as nine queries dying one by one
        case other => throw new IllegalStateException(
          s"events.ts fixture vintage $other is not handled — extend Tables.events " +
            "with the new type's normalization to TimestampType")
      }
    } finally if (!keepConf) prior match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
