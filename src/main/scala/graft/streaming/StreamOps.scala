package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming operators (SURVEY §2.6): the reference's
  * checkpoint/high-water-mark machinery (scripts/extract.py:74-95) maps to
  * `checkpointLocation` + watermarks; its chunked batch loop maps to
  * micro-batches. The same aggregation functions run in batch and stream —
  * equivalence is the test contract (SURVEY §5.4).
  */
object StreamOps {

  /** Tumbling-window aggregation — identical logical plan in batch and
    * streaming; caller supplies either a batch frame or a readStream frame.
    */
  def tumblingAgg(events: DataFrame, width: String): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window aggregation (width, slide). */
  def slidingAgg(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Session windows per user (gap-based). */
  def sessionAgg(events: DataFrame, gap: String): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Run a streaming transform over a bounded file source to completion
    * (Trigger.AvailableNow + memory sink) and return the result — the
    * batch↔stream equivalence harness. `schemaDdl` must match the files.
    */
  def runBounded(spark: SparkSession, srcDir: String, schemaDdl: String,
                 queryName: String)(f: DataFrame => DataFrame): DataFrame = {
    val src = spark.readStream.schema(schemaDdl).parquet(srcDir)
    val q = f(src).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
