package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
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

  test("stream-stream join (watermarked, bounded skew): stream == batch") {
    val base = Files.createTempDirectory("ssj").toString
    // small slice: the join is quadratic within (user, 10-minute skew)
    Tables.events(spark, sf).filter(col("user_id") < 10)
      .select("event_id", "ts", "user_id")
      .write.mode("overwrite").parquet(s"$base/src")
    val ddl = "event_id bigint, ts timestamp, user_id bigint"
    val batch = StreamOps.streamStreamJoin(
      spark.read.parquet(s"$base/src"), spark.read.parquet(s"$base/src"),
      "user_id", "10 MINUTES")
    def stream(q: String) = {
      val src1 = spark.readStream.schema(ddl).parquet(s"$base/src")
      val src2 = spark.readStream.schema(ddl).parquet(s"$base/src")
      val qry = StreamOps.streamStreamJoin(src1, src2, "user_id", "10 MINUTES")
        .writeStream.outputMode("append").format("memory").queryName(q)
        .option("checkpointLocation", s"$base/ckpt_$q")
        .trigger(Trigger.AvailableNow()).start()
      qry.awaitTermination()
      spark.table(q)
    }
    val got = stream("ssj_out")
    assert(batch.count() > 0, "fixture should produce in-window pairs")
    assert(canon(got) == canon(batch))
  }

  test("I2: checkpointed ingest resumes from offsets; replay inserts nothing") {
    import spark.implicits._
    val base = Files.createTempDirectory("ingest").toString
    val (srcDir, ckpt, wh) = (s"$base/src", s"$base/ckpt", s"$base/warehouse")
    val ddl = "k bigint, v string"

    // phase 1: keys 0..99 arrive; stream to termination
    (0L until 100L).map(k => (k, s"first-$k")).toDF("k", "v")
      .write.mode("append").parquet(srcDir)
    StreamOps.incrementalIngest(spark, srcDir, ddl, ckpt, wh, Seq("k"), Seq("v"))
      .awaitTermination()
    assert(spark.read.parquet(wh).count() == 100)

    // phase 2: keys 50..149 arrive (half overlap, conflicting payloads);
    // restart with the SAME checkpoint — only the new file is consumed,
    // and the keyed upsert keeps the phase-1 rows (first-writer-wins)
    (50L until 150L).map(k => (k, s"second-$k")).toDF("k", "v")
      .write.mode("append").parquet(srcDir)
    StreamOps.incrementalIngest(spark, srcDir, ddl, ckpt, wh, Seq("k"), Seq("v"))
      .awaitTermination()
    val after = spark.read.parquet(wh).cache()
    assert(after.count() == 150)
    assert(after.groupBy("k").count().filter($"count" > 1).isEmpty, "no duplicate keys")
    assert(after.filter($"k" === 75L).head().getString(1) == "first-75",
      "first writer must win on replayed keys")

    // phase 3: restart once more with NO new data — the checkpoint knows
    // every file is consumed; warehouse unchanged
    StreamOps.incrementalIngest(spark, srcDir, ddl, ckpt, wh, Seq("k"), Seq("v"))
      .awaitTermination()
    assert(spark.read.parquet(wh).count() == 150)
  }

  test("streaming CDC apply: kill/resume equals one batch merge, tombstones included") {
    import spark.implicits._
    val base = Files.createTempDirectory("cdcstream").toString
    val (srcDir, ckpt, wh) = (s"$base/src", s"$base/ckpt", s"$base/warehouse")
    val ddl = "k bigint, s string, seq bigint, del boolean"
    val tiebreak = Seq(col("seq").desc)
    val payload = Seq("s", "seq")

    // phase 1: inserts for keys 0..49
    val b1 = (0L until 50L).map(k => (k, s"v1-$k", 1L, false))
    b1.toDF("k", "s", "seq", "del").write.mode("append").parquet(srcDir)
    StreamOps.streamingCdcApply(spark, srcDir, ddl, ckpt, wh,
      Seq("k"), tiebreak, deleteCond = $"del", payloadCols = payload)
      .awaitTermination()
    assert(spark.read.parquet(wh).count() == 50)

    // phase 2 (the "resume" after a stop): updates 0..9, tombstones 10..19,
    // inserts 50..59 arrive; restart on the SAME checkpoint consumes only
    // the new file
    val b2 = (0L until 10L).map(k => (k, s"v2-$k", 2L, false)) ++
      (10L until 20L).map(k => (k, s"v1-$k", 2L, true)) ++
      (50L until 60L).map(k => (k, s"v2-$k", 2L, false))
    b2.toDF("k", "s", "seq", "del").write.mode("append").parquet(srcDir)
    StreamOps.streamingCdcApply(spark, srcDir, ddl, ckpt, wh,
      Seq("k"), tiebreak, deleteCond = $"del", payloadCols = payload)
      .awaitTermination()

    // the streamed end state must equal ONE batch merge of the full
    // changelog (latest-wins tiebreak makes sequential == single apply)
    val whBatch = s"$base/warehouse_batch"
    graft.ops.Warehouse.applyChangesParquet((b1 ++ b2).toDF("k", "s", "seq", "del"),
      whBatch, Seq("k"), tiebreak, deleteCond = $"del", payloadCols = payload)
    val canonWh = spark.read.parquet(wh).select("k", "s", "seq")
      .as[(Long, String, Long)].collect().toSet
    val canonBatch = spark.read.parquet(whBatch).select("k", "s", "seq")
      .as[(Long, String, Long)].collect().toSet
    assert(canonWh == canonBatch, "stream ≠ batch end state")
    assert(canonWh.size == 50 && !canonWh.exists { case (k, _, _) => 10 <= k && k < 20 },
      "tombstoned keys must be gone")
    assert(canonWh.count { case (_, s, _) => s.startsWith("v2-") } == 20)

    // replay safety, both crash windows:
    // (a) marker written, offsets uncommitted → SAME batchId is skipped
    val replay = (0L until 10L).map(k => (k, s"GHOST-$k", 3L, false))
      .toDF("k", "s", "seq", "del")
    val whP = new org.apache.hadoop.fs.Path(wh)
    val fs = whP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(whP.getParent, "_" + whP.getName + ".lastbatch")
    val lastId = {
      val in = fs.open(marker)
      try new String(in.readAllBytes()).trim.toLong finally in.close()
    }
    assert(!StreamOps.applyCdcBatch(replay, lastId, wh, Seq("k"), tiebreak,
      $"del", payload), "an already-applied batchId must be skipped")
    assert(spark.read.parquet(wh).select("k", "s", "seq")
      .as[(Long, String, Long)].collect().toSet == canonWh)
    // (b) merge done, marker unwritten → re-merge of the same changelog
    // converges to the same table
    val sameAgain = b2.toDF("k", "s", "seq", "del")
    assert(StreamOps.applyCdcBatch(sameAgain, lastId + 1, wh, Seq("k"), tiebreak,
      $"del", payload))
    assert(spark.read.parquet(wh).select("k", "s", "seq")
      .as[(Long, String, Long)].collect().toSet == canonWh,
      "replayed merge must converge")
  }

  test("streaming CDC into the versioned table: exactly-once via the manifest txn ledger") {
    import spark.implicits._
    import graft.ops.{VersionedTable => VT}
    val base = Files.createTempDirectory("cdcvstream").toString
    val (srcDir, ckpt, tbl) = (s"$base/src", s"$base/ckpt", s"$base/table")
    val ddl = "k bigint, s string, seq bigint, del boolean"
    val tiebreak = Seq(col("seq").desc)

    // bootstrap: initial snapshot is version 1 (Debezium shape)
    val snap = (0L until 50L).map(k => (k, s"v1-$k", 0L))
      .toDF("k", "s", "seq")
    VT.create(snap, tbl, statsCols = Seq("k"))
    // an un-bootstrapped table refuses the stream loudly
    intercept[IllegalArgumentException] {
      StreamOps.streamingCdcApplyVersioned(spark, srcDir, ddl, ckpt,
        s"$base/nope", Seq("k"), tiebreak, $"del", appId = "cdc")
    }

    // phase 1: updates 0..9 + tombstones 10..19 stream in as batch 0
    val b1 = (0L until 10L).map(k => (k, s"v2-$k", 1L, false)) ++
      (10L until 20L).map(k => (k, s"v1-$k", 1L, true))
    b1.toDF("k", "s", "seq", "del").write.mode("append").parquet(srcDir)
    StreamOps.streamingCdcApplyVersioned(spark, srcDir, ddl, ckpt, tbl,
      Seq("k"), tiebreak, $"del", appId = "cdc").awaitTermination()
    assert(VT.currentVersion(spark, tbl).contains(2L))
    assert(VT.read(spark, tbl).count() == 40)

    // phase 2 (resume on the same checkpoint): inserts 50..59 as batch 1
    val b2 = (50L until 60L).map(k => (k, s"v2-$k", 2L, false))
    b2.toDF("k", "s", "seq", "del").write.mode("append").parquet(srcDir)
    StreamOps.streamingCdcApplyVersioned(spark, srcDir, ddl, ckpt, tbl,
      Seq("k"), tiebreak, $"del", appId = "cdc").awaitTermination()
    assert(VT.currentVersion(spark, tbl).contains(3L))

    // end state == ONE batch merge of the full changelog onto the snapshot
    val model = graft.ops.Warehouse.applyChanges(snap,
      graft.ops.Warehouse.dedupByKey((b1 ++ b2).toDF("k", "s", "seq", "del"),
        Seq("k"), tiebreak), Seq("k"), $"del")
      .select("k", "s", "seq").as[(Long, String, Long)].collect().toSet
    val got = VT.read(spark, tbl).select("k", "s", "seq")
      .as[(Long, String, Long)].collect().toSet
    assert(got == model, "stream ≠ batch end state")

    // crash window (merge committed / offsets uncommitted): replaying the
    // LAST batch id must skip — no GHOST data, no version bump
    val ghost = Seq((0L, "GHOST", 9L, false)).toDF("k", "s", "seq", "del")
    assert(VT.commitMerge(ghost, tbl, Seq("k"), tiebreak, $"del",
      txn = Some("cdc" -> 1L)) == 3L)
    assert(VT.read(spark, tbl).filter($"k" === 0L)
      .as[(Long, String, Long)].head()._2 == "v2-0")
    // every streamed state is still time-travel-readable
    assert(VT.read(spark, tbl, asOf = Some(1L)).count() == 50)
    assert(VT.read(spark, tbl, asOf = Some(2L)).count() == 40)
    assert(VT.readManifest(spark, tbl, 3L).txns == Map("cdc" -> 1L))
  }

  test("S1 x I2: readStream over the paged source — kill mid-run, resume equals batch") {
    // MICRO_BATCH_READ on graft-paged: the page index is the streaming
    // offset, so checkpointLocation owns the "pages done" cursor the
    // reference's resumable loop tracks by hand. Kill the query between
    // micro-batches, restart on the same checkpoint, and the union of
    // delivered batches must equal the batch read exactly — no page
    // replayed, none skipped.
    val base = Files.createTempDirectory("pagedstream").toString
    val src = s"$base/pages"
    graft.sources.PagedManifest.writeFixture(
      Tables.orders(spark, sf)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"),
      src, "o_orderkey", pageSize = 200)
    val out = s"$base/out"
    val batches = new java.util.concurrent.atomic.AtomicInteger

    def run(killAtBatch: Int): Unit = {
      val q = spark.readStream.format("graft-paged")
        .option("maxPagesPerTrigger", "2")
        .load(src)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          if (id == killAtBatch) throw new RuntimeException(s"injected kill at batch $id")
          df.write.mode("append").parquet(out)
          batches.incrementAndGet(): Unit
        }
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination()
      catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
        assert(e.getMessage.contains("injected kill") ||
          String.valueOf(e.getCause).contains("injected kill"))
      }
    }

    run(killAtBatch = 2)   // batches 0,1 commit; batch 2 dies before writing
    assert(batches.get() == 2, s"exactly 2 batches should commit, got ${batches.get()}")
    run(killAtBatch = -1)  // resume on the same checkpoint, drain the rest

    val got = spark.read.parquet(out)
    val want = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    assert(batches.get() > 3, "the fixture must span several micro-batches")
    assert(got.count() == want.count(), "no page skipped, none replayed")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the batch path is untouched by streaming support
    assert(spark.read.format("graft-paged").load(src).count() == want.count())
  }

  test("paged-stream checkpoint fails LOUDLY if consumed pages were rewritten") {
    // appending pages is a safe resume; renumbering/resizing already-
    // consumed pages must not silently skip data (the positional-index
    // hazard of a bare integer offset)
    val base = Files.createTempDirectory("pagedrewrite").toString
    val src = s"$base/pages"
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    graft.sources.PagedManifest.writeFixture(orders, src, "o_orderkey", pageSize = 200)

    def run(killAtBatch: Int): Option[Throwable] = {
      val q = spark.readStream.format("graft-paged")
        .option("maxPagesPerTrigger", "2")
        .load(src)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          if (id == killAtBatch) throw new RuntimeException("injected kill")
          df.count(): Unit
        }
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      try { q.awaitTermination(); None }
      catch { case e: org.apache.spark.sql.streaming.StreamingQueryException => Some(e) }
    }

    assert(run(killAtBatch = 1).isDefined, "first run must die mid-stream")
    // rewrite the fixture with a different page size: same rows, but the
    // consumed prefix no longer describes the same pages
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(src))
    graft.sources.PagedManifest.writeFixture(orders, src, "o_orderkey", pageSize = 170)
    val err = run(killAtBatch = -1)
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: causes(t.getCause)
    assert(err.isDefined && causes(err.get).exists(_.contains("does not match the manifest")),
      s"resume over a rewritten manifest must fail explicitly, got: $err")
  }

  test("watermark-TTL'd streaming dedup: unique keys out, bounded state") {
    import spark.implicits._
    val base = Files.createTempDirectory("wmdedup").toString
    Tables.events(spark, sf).select("event_id", "ts", "user_id")
      .unionAll(Tables.events(spark, sf).select("event_id", "ts", "user_id").limit(500))
      .write.mode("overwrite").parquet(s"$base/src")
    val src = spark.readStream
      .schema("event_id bigint, ts timestamp, user_id bigint").parquet(s"$base/src")
    val q = StreamOps.streamingDedupWithinWatermark(src, Seq("event_id"), "ts", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("wm_out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("wm_out")
    val distinctIn = Tables.events(spark, sf).select("event_id").distinct().count()
    assert(out.count() == distinctIn, "each event_id exactly once despite duplicates")
    assert(out.groupBy("event_id").count().filter($"count" > 1).isEmpty)
  }

  test("streaming first-seen dedup emits exactly one row per key across batches") {
    import spark.implicits._
    val base = Files.createTempDirectory("fsdedup").toString
    // two files → (typically) separate micro-batches; key 7 appears in both
    Seq((7L, "a1"), (8L, "b1"), (7L, "a2")).toDF("k", "v")
      .repartition(1).write.mode("append").parquet(s"$base/src")
    Seq((7L, "a3"), (9L, "c1")).toDF("k", "v")
      .repartition(1).write.mode("append").parquet(s"$base/src")
    val src = spark.readStream.schema("k bigint, v string").parquet(s"$base/src")
      .as[(Long, String)]
    val q = StreamOps.streamingFirstSeen[Long, (Long, String)](src, _._1)
      .toDF("k", "v")
      .writeStream.outputMode("append").format("memory").queryName("fs_out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("fs_out").as[(Long, String)].collect()
    assert(out.map(_._1).sorted.toSeq == Seq(7L, 8L, 9L), s"got ${out.toSeq}")
  }

  test("transformWithState running totals: stream(AvailableNow) == batch agg") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = Files.createTempDirectory("tws").toString
      val src = spark.readStream.schema(schemaDdl).parquet(eventsDir)
      val q = StreamOps.statefulRunningTotals(src)
        .writeStream.outputMode("update").format("memory").queryName("tws_out")
        .option("checkpointLocation", s"$ckpt/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // keep the LAST update per key (multiple micro-batches re-emit keys)
      val got = spark.table("tws_out").collect()
        .groupBy(_.getLong(0))
        .map { case (k, rows) => k -> rows.maxBy(_.getLong(1)) }
      val expect = spark.read.parquet(eventsDir)
        .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("s"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got.nonEmpty && got.size == expect.size)
      got.foreach { case (k, row) =>
        val (en, es) = expect(k)
        assert(row.getLong(1) == en, s"count mismatch for user $k")
        assert(math.abs(row.getDouble(2) - es) < 1e-6, s"sum mismatch for user $k")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
