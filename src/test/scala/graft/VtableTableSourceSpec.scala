package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.{VersionedTable => VT}

/** Streaming TABLE source over a versioned table
  * ([[graft.sources.VtableTableSource]], `readStream.format(
  * "graft-vtable")`): initial snapshot then per-commit appended rows,
  * offsets = versions, exactly-once across kill/resume, loud refusal of
  * row-rewriting commits (skippable), layout commits invisible.
  */
class VtableTableSourceSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("vtsrc").toString

  private def mk(dir: String): Unit =
    VT.create(Seq((1L, "a"), (2L, "b")).toDF("k", "s")
      .repartitionByRange(2, $"k").sortWithinPartitions("k"), dir, Seq("k"))

  private def drain(dir: String, ckpt: String, out: String,
                    opts: Map[String, String] = Map.empty): Unit = {
    var reader = spark.readStream.format("graft-vtable").option("dir", dir)
    opts.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load()
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def outRows(out: String): Seq[(Long, String)] =
    spark.read.parquet(out).as[(Long, String)].collect().toSeq

  test("snapshot then appends: drained output equals the table, exactly-once across restarts") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    VT.commitAppend(Seq((3L, "c")).toDF("k", "s"), dir)          // v2
    drain(dir, s"$root/ckpt", s"$root/out")
    // snapshot at stream start covers v1+v2
    assert(outRows(s"$root/out").toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // appends land as deltas on resume; replay adds nothing
    VT.commitAppend(Seq((4L, "d")).toDF("k", "s"), dir)          // v3
    VT.commitAppend(Seq((5L, "e")).toDF("k", "s"), dir)          // v4
    drain(dir, s"$root/ckpt", s"$root/out")
    drain(dir, s"$root/ckpt", s"$root/out") // no-op redrain
    val got = outRows(s"$root/out")
    assert(got.size == 5, s"exactly-once violated: $got")
    assert(got.toSet == VT.read(spark, dir).as[(Long, String)].collect().toSet)
  }

  test("startingVersion follows appends only, no snapshot") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    VT.commitAppend(Seq((3L, "c")).toDF("k", "s"), dir)          // v2
    VT.commitAppend(Seq((4L, "d")).toDF("k", "s"), dir)          // v3
    drain(dir, s"$root/ckpt", s"$root/out", Map("startingVersion" -> "2"))
    assert(outRows(s"$root/out").toSet == Set((3L, "c"), (4L, "d")))
  }

  test("startingTimestamp resolves to the earliest commit at or after it") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)              // v1
    VT.commitAppend(Seq((3L, "c")).toDF("k", "s"), dir)          // v2
    VT.commitAppend(Seq((4L, "d")).toDF("k", "s"), dir)          // v3
    def fmt(ms: Long): String = {
      val zone = java.time.ZoneId.of(
        spark.sessionState.conf.sessionLocalTimeZone)
      java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .format(java.time.Instant.ofEpochMilli(ms).atZone(zone))
    }
    val adj2 = VT.readMeta(spark, dir, 2L).adjTs
    assert(adj2 > 0L, "commits must carry adjusted timestamps")
    // exactly v2's stamp: the stream starts AT v2 (inclusive)
    drain(dir, s"$root/c1", s"$root/o1",
      Map("startingTimestamp" -> fmt(adj2)))
    assert(outRows(s"$root/o1").toSet == Set((3L, "c"), (4L, "d")))
    // strictly between v2 and v3 (stamps strictly increase): starts at v3
    drain(dir, s"$root/c2", s"$root/o2",
      Map("startingTimestamp" -> fmt(adj2 + 1L)))
    assert(outRows(s"$root/o2").toSet == Set((4L, "d")))
    // before the first commit: the whole history (no snapshot semantics —
    // per-commit deltas from v1, same as startingVersion=1)
    drain(dir, s"$root/c3", s"$root/o3",
      Map("startingTimestamp" -> "2000-01-01 00:00:00"))
    assert(outRows(s"$root/o3").toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // after the newest commit: future commits only
    val adj3 = VT.readMeta(spark, dir, 3L).adjTs
    val srcF = new graft.sources.VtableTableSource(spark,
      Map("dir" -> dir, "startingTimestamp" -> fmt(adj3 + 1L)))
    assert(srcF.getOffset.isEmpty,
      "a post-history startingTimestamp must have nothing to emit yet")
    VT.commitAppend(Seq((5L, "e")).toDF("k", "s"), dir)          // v4
    drain(dir, s"$root/c4", s"$root/o4",
      Map("startingTimestamp" -> fmt(adj3 + 1L)))
    assert(outRows(s"$root/o4").toSet == Set((5L, "e")))
    // the two spellings refuse to combine
    val e = intercept[Exception](new graft.sources.VtableTableSource(spark,
      Map("dir" -> dir, "startingVersion" -> "2",
        "startingTimestamp" -> fmt(adj2))))
    assert(e.getMessage.contains("mutually exclusive"), e.getMessage)
  }

  /** Streaming-flagged batch → collectable: the inverse of the source's
    * `asStreaming`, for driving the Source API directly in tests.
    */
  private def destream(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val plan = df.queryExecution.analyzed.transform {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.isStreaming => lr.copy(isStreaming = false)
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          if lr.isStreaming => lr.copy(isStreaming = false)
    }
    org.apache.spark.sql.GraftShim.dataFrame(spark, plan)
  }

  test("crash-restart replay of the snapshot batch is a pure function of the logged offset") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)                // v1
    VT.commitAppend(Seq((3L, "c")).toDF("k", "s"), dir)           // v2
    // batch 0's end offset is logged (v2), then the process dies before
    // commit; meanwhile the table grows
    val srcA = new graft.sources.VtableTableSource(spark, Map("dir" -> dir))
    val end0 = srcA.getOffset.get
    assert(end0.json.toLong == 2L)
    VT.commitAppend(Seq((4L, "d")).toDF("k", "s"), dir)           // v3
    // the restarted query builds a NEW source instance (snapshot planning
    // floor re-pins at v3) and REPLAYS batch 0 from the offset log — the
    // slice must be the table AS OF the logged offset, not the new floor
    val srcB = new graft.sources.VtableTableSource(spark, Map("dir" -> dir))
    val replay = destream(srcB.getBatch(None, end0))
      .as[(Long, String)].collect().toSet
    assert(replay == Set((1L, "a"), (2L, "b"), (3L, "c")),
      s"replayed batch 0 must not include post-offset commits: $replay")
    // the follow-up batch delivers exactly the rest — union is exactly-once
    val end1 = srcB.getOffset.get
    val next = destream(srcB.getBatch(Some(end0), end1))
      .as[(Long, String)].collect().toSet
    assert(next == Set((4L, "d")), s"batch 1 must emit only (v2, v3]: $next")
  }

  test("startingVersion=1 follows from the create commit (no snapshot-sentinel collision)") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)               // v1
    VT.commitAppend(Seq((3L, "c")).toDF("k", "s"), dir)           // v2
    drain(dir, s"$root/ckpt", s"$root/out", Map("startingVersion" -> "1"))
    assert(outRows(s"$root/out").toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")),
      "v1's created rows count as that commit's appends")
  }

  test("snapshot offsets are only logged at CLEAN versions: DV ride-alongs cap the batch, a dirty floor refuses at planning") {
    val root = tmp(); val dir = s"$root/t"
    VT.create(Seq((1L, "a"), (2L, "b")).toDF("k", "s")
        .repartitionByRange(2, $"k").sortWithinPartitions("k"),
      dir, Seq("k"), props = Map(VT.DvsEnabledProp -> "true"))  // v1, clean
    val limit =
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
    // source constructed while clean; a DV commit lands before the first
    // trigger — the offset must CAP at v1 (an AS-OF-v2 snapshot could
    // never replay: manifests are immutable)
    val src = new graft.sources.VtableTableSource(spark, Map("dir" -> dir))
    VT.commitDeleteDv(spark, dir, $"k" === 1L)                   // v2: dvs
    val o = src.latestOffset(null, limit)
    assert(o.json.toLong == 1L,
      s"batch 0 must stop before the DV version, got ${o.json}")
    // a stream STARTED on a dirty table refuses at planning — nothing is
    // logged, so OPTIMIZE + restart recovers (a logged dirty offset would
    // wedge the checkpoint permanently)
    val src2 = new graft.sources.VtableTableSource(spark, Map("dir" -> dir))
    val ex = intercept[IllegalStateException](src2.latestOffset(null, limit))
    assert(ex.getMessage.contains("OPTIMIZE"), ex.getMessage)
    // materialize, then the whole pipeline drains end to end
    VT.materializeDvs(spark, dir)                                 // v3
    drain(dir, s"$root/ckpt", s"$root/out",
      Map("skipChangeCommits" -> "true"))
    assert(outRows(s"$root/out").toSet == Set((2L, "b")))
  }

  test("maxBytesPerBatch bounds admission; at least one version always admits") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)               // v1
    (3L to 5L).foreach(k =>
      VT.commitAppend(Seq((k, "x")).toDF("k", "s"), dir))         // v2..v4
    val limit =
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
    // a 1-byte budget can never fit a parquet file: the soft cap still
    // admits exactly one version per batch
    val tight = new graft.sources.VtableTableSource(spark,
      Map("dir" -> dir, "startingVersion" -> "2", "maxBytesPerBatch" -> "1"))
    val o1 = tight.latestOffset(null, limit)
    assert(o1.json.toLong == 2L, s"soft cap must admit one version: ${o1.json}")
    val o2 = tight.latestOffset(o1, limit)
    assert(o2.json.toLong == 3L)
    // a huge budget admits everything available in one batch
    val roomy = new graft.sources.VtableTableSource(spark,
      Map("dir" -> dir, "startingVersion" -> "2",
        "maxBytesPerBatch" -> (1L << 40).toString))
    assert(roomy.latestOffset(null, limit).json.toLong == 4L)
  }

  test("row-rewriting commits refuse loudly; skipChangeCommits skips them") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    drain(dir, s"$root/ckpt", s"$root/out")
    VT.commitMerge(Seq((1L, "A", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                          // v2: update
    VT.commitAppend(Seq((9L, "z")).toDF("k", "s"), dir)          // v3
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(dir, s"$root/ckpt", s"$root/out")
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ chain(e.getCause))
    assert(chain(ex).exists(m => m.contains("skipChangeCommits") &&
      m.contains("graft-vtable-cdf")), s"undiagnostic refusal: ${chain(ex)}")
    // opting in resumes FROM THE CHECKPOINT, emitting only the append
    drain(dir, s"$root/ckpt", s"$root/out",
      Map("skipChangeCommits" -> "true"))
    assert(outRows(s"$root/out").toSet ==
      Set((1L, "a"), (2L, "b"), (9L, "z")),
      "the skipped merge must contribute nothing; the append must land")
  }

  test("compaction is invisible: a layout rewrite emits zero rows") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    drain(dir, s"$root/ckpt", s"$root/out")
    VT.commitAppend(Seq((3L, "c")).toDF("k", "s"), dir)          // v2
    VT.commitCompact(spark, dir)                                  // v3: layout only
    drain(dir, s"$root/ckpt", s"$root/out")
    assert(outRows(s"$root/out").toSet == Set((1L, "a"), (2L, "b"), (3L, "c")),
      "compaction rewrote bytes, not rows — the stream must not re-emit")
  }

  test("a recreated table fails the stream loudly") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    drain(dir, s"$root/ckpt", s"$root/out")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    mk(dir)
    VT.commitAppend(Seq((9L, "z")).toDF("k", "s"), dir)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(dir, s"$root/ckpt", s"$root/out")
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ chain(e.getCause))
    assert(chain(ex).exists(_.contains("recreated")),
      s"undiagnostic failure: ${chain(ex)}")
    assert(outRows(s"$root/out").toSet == Set((1L, "a"), (2L, "b")),
      "nothing from the impostor log may land")
  }

  test("VACUUM refuses to strand a registered stream cursor; FORCE and dropCursor override") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    drain(dir, s"$root/ckpt", s"$root/out") // pins its committed offset (v1)
    // the table races ahead; the paused stream's cursor stays at v1
    (3L to 6L).foreach(k =>
      VT.commitAppend(Seq((k, "x")).toDF("k", "s"), dir))      // v2..v5
    val ex = intercept[IllegalArgumentException](
      VT.vacuum(spark, dir, keepVersions = 1))
    assert(ex.getMessage.contains("stream cursors") &&
      ex.getMessage.contains("FORCE"), s"undiagnostic refusal: ${ex.getMessage}")
    // nothing was reclaimed by the refused vacuum
    assert(VT.read(spark, dir, asOf = Some(1L)).count() == 2L)
    // SQL spelling refuses identically; FORCE overrides
    graft.functions.GraftFunctions.register(spark)
    intercept[Exception](graft.sql.GraftSql.sql(spark,
      s"VACUUM graft_vtable('$dir') RETAIN 1 VERSIONS").collect())
    graft.sql.GraftSql.sql(spark,
      s"VACUUM graft_vtable('$dir') RETAIN 1 VERSIONS FORCE").collect()
    assert(VT.versions(spark, dir) == Seq(5L), "FORCE must reclaim")
    // a caught-up stream advances its pin past the horizon: vacuum passes
    val dir2 = s"$root/t2"; mk(dir2)
    drain(dir2, s"$root/ckpt2", s"$root/out2")
    VT.commitAppend(Seq((9L, "z")).toDF("k", "s"), dir2)
    drain(dir2, s"$root/ckpt2", s"$root/out2") // commit() pins v2 == horizon
    VT.vacuum(spark, dir2, keepVersions = 1)
    // and an operator can drop a dead stream's pin instead of forcing
    val dir3 = s"$root/t3"; mk(dir3)
    drain(dir3, s"$root/ckpt3", s"$root/out3")
    VT.commitAppend(Seq((9L, "z")).toDF("k", "s"), dir3)
    intercept[IllegalArgumentException](VT.vacuum(spark, dir3, 1))
    assert(VT.dropCursor(spark, dir3, VT.cursorPins(spark, dir3).head._1))
    VT.vacuum(spark, dir3, keepVersions = 1)
  }

  test("schema widening MID-QUERY fails the batch loudly; a restarted query adopts it") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    // mid-query: the source instance pinned the 2-column schema, then the
    // table widens and appends under 3 columns — the batch must refuse
    // (silently dropping the new column would be data loss downstream)
    val src = new graft.sources.VtableTableSource(spark,
      Map("dir" -> dir), s"$root/meta")
    VT.commitAddColumns(spark, dir, Seq("v" -> "BIGINT"))         // v2: metadata
    VT.commitAppend(Seq((3L, "c", 30L)).toDF("k", "s", "v"), dir) // v3: wider
    val end = src.getOffset.get
    val ex = intercept[IllegalStateException](src.getBatch(None, end))
    assert(ex.getMessage.contains("restart"),
      s"undiagnostic failure: ${ex.getMessage}")
    // a restarted query re-pins the schema at start and just works — the
    // snapshot arrives under the wider schema (old rows NULL-filled)
    drain(dir, s"$root/ckpt", s"$root/out")
    assert(spark.read.parquet(s"$root/out").as[(Long, String, Option[Long])]
      .collect().toSet ==
      Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(30L))),
      "a fresh query must adopt the widened schema end to end")
  }
}
