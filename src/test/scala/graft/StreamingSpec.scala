package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Batch↔stream equivalence (SURVEY §5.4): the same tumbling/session agg
  * over the same events must produce identical results via readStream
  * (AvailableNow) and plain batch.
  */
class StreamingSpec extends SparkSuite {

  private lazy val eventsDir: String = {
    // Re-materialize events with a µs timestamp (source file is ns, which
    // the streaming parquet source rejects the same way batch does).
    val dir = Files.createTempDirectory("events_us").toString + "/events"
    Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    dir
  }
  private val schemaDdl =
    "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("tumbling window: stream(AvailableNow) == batch") {
    val batch = StreamOps.tumblingAgg(spark.read.parquet(eventsDir), "6 hours")
    val stream = StreamOps.runBounded(spark, eventsDir, schemaDdl, "tumbling_out")(
      StreamOps.tumblingAgg(_, "6 hours"))
    assert(canon(stream) == canon(batch))
    assert(batch.count() > 0)
  }

  test("session window: stream(AvailableNow) == batch") {
    val batch = StreamOps.sessionAgg(spark.read.parquet(eventsDir), "30 minutes")
    val stream = StreamOps.runBounded(spark, eventsDir, schemaDdl, "session_out")(
      StreamOps.sessionAgg(_, "30 minutes"))
    assert(canon(stream) == canon(batch))
    assert(batch.count() > 0)
  }
}
