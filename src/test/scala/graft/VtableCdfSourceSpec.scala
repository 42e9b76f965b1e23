package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.ops.{VersionedTable => VT}

/** Streaming change-data-feed SOURCE over a versioned table: offsets are
  * table versions, each commit replays as a deterministic manifest diff,
  * restarts resume exactly-once from the engine's offset log, and the
  * `net` mode folds backlogs into one diff per batch.
  */
class VtableCdfSourceSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("cdfsrc").toString

  private def mk(dir: String): Unit = {
    VT.create(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
      .repartitionByRange(2, $"k").sortWithinPartitions("k"), dir, Seq("k"))
  }

  private def drain(dir: String, ckpt: String, q: String,
                    opts: Map[String, String] = Map.empty): Unit = {
    var reader = spark.readStream.format("graft-vtable-cdf")
      .option("dir", dir).option("keys", "k")
    opts.foreach { case (k, v) => reader = reader.option(k, v) }
    val qry = reader.load()
      .writeStream.outputMode("append").format("memory").queryName(q)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    qry.awaitTermination()
  }

  private def rows(q: String): Set[(String, Long, String, Long)] =
    spark.table(q).select($"change_type", $"k", $"s", $"_commit_version")
      .as[(String, Long, String, Long)].collect().toSet

  test("bootstrap from 0: snapshot as inserts, then per-commit diffs with versions") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    VT.commitMerge(Seq((2L, "B", false), (4L, "d", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v2
    VT.commitMerge(Seq((1L, "x", true)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v3
    drain(dir, s"$root/ckpt", "cdf_boot", Map("startingVersion" -> "0"))
    assert(rows("cdf_boot") == Set(
      ("insert", 1L, "a", 1L), ("insert", 2L, "b", 1L), ("insert", 3L, "c", 1L),
      ("update", 2L, "B", 2L), ("insert", 4L, "d", 2L),
      ("delete", 1L, "a", 3L)))
  }

  /** Durable-sink drain: the memory sink cannot recover from a
    * checkpoint, so restart semantics are proved against the parquet
    * file sink — the production shape anyway.
    */
  private def drainToParquet(dir: String, ckpt: String, out: String,
                             opts: Map[String, String]): Unit = {
    var reader = spark.readStream.format("graft-vtable-cdf")
      .option("dir", dir).option("keys", "k")
    opts.foreach { case (k, v) => reader = reader.option(k, v) }
    val qry = reader.load()
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    qry.awaitTermination()
  }

  private def parquetRows(out: String): Set[(String, Long, String, Long)] =
    spark.read.parquet(out)
      .select($"change_type", $"k", $"s", $"_commit_version")
      .as[(String, Long, String, Long)].collect().toSet

  test("restart resumes exactly-once from the checkpoint") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    VT.commitMerge(Seq((4L, "d", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v2
    drainToParquet(dir, ckpt, out, Map("startingVersion" -> "1"))
    assert(parquetRows(out) == Set(("insert", 4L, "d", 2L)))
    // more commits, then resume from the SAME checkpoint: only the new
    // window replays — nothing duplicated, nothing lost
    VT.commitMerge(Seq((4L, "D2", false), (5L, "e", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v3
    drainToParquet(dir, ckpt, out, Map("startingVersion" -> "1"))
    assert(parquetRows(out) == Set(("insert", 4L, "d", 2L),
      ("update", 4L, "D2", 3L), ("insert", 5L, "e", 3L)))
    // an idle resume adds nothing
    drainToParquet(dir, ckpt, out, Map("startingVersion" -> "1"))
    assert(parquetRows(out).size == 3)
  }

  test("schema evolution mid-stream: loud failure, then a restart resumes wider, exactly-once") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    VT.commitMerge(Seq((4L, "d", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v2
    // a RUNNING stream (schema pinned at start) sees an append-only
    // evolution land mid-stream: the batch containing the evolved commit
    // must fail LOUDLY — silently dropping the new column's changes is
    // the failure mode the pin exists to prevent
    val qry = spark.readStream.format("graft-vtable-cdf")
      .option("dir", dir).option("keys", "k")
      .option("startingVersion", "1").load()
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      qry.processAllAvailable() // v2 drained under the narrow schema
      VT.commitMergeEvolve(
        Seq((5L, "e", 50L, false)).toDF("k", "s", "extra", "del"),
        dir, Seq("k"), Seq.empty, $"del")                              // v3 (+extra)
      val ex = intercept[Exception] {
        qry.processAllAvailable()
        qry.awaitTermination(30000)
      }
      val chain = Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(chain.contains("evolved mid-stream"),
        s"expected the loud evolution failure, got: $chain")
    } finally if (qry.isActive) qry.stop()
    // post-evolution churn BEFORE the restart — the recovered stream must
    // pick up both the evolution commit and this one
    VT.commitMerge(Seq((4L, "D2", 40L, false)).toDF("k", "s", "extra", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v4
    // restart from the SAME checkpoint: the new source pins the WIDER
    // schema and resumes from the committed offset — nothing lost (v3,
    // v4 both arrive), nothing doubled (v2 does not replay)
    val qry2 = spark.readStream.format("graft-vtable-cdf")
      .option("dir", dir).option("keys", "k")
      .option("startingVersion", "1").load()
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    qry2.awaitTermination()
    val wide = org.apache.spark.sql.types.StructType.fromDDL(
      "change_type STRING, k BIGINT, s STRING, extra BIGINT, _commit_version BIGINT")
    val got = spark.read.schema(wide).parquet(out)
      .as[(String, Long, String, Option[Long], Long)].collect().toSeq
    assert(got.size == got.toSet.size, s"duplicated change rows: $got")
    assert(got.toSet == Set(
      ("insert", 4L, "d", None, 2L),            // pre-evolution file: extra reads NULL
      ("insert", 5L, "e", Some(50L), 3L),
      ("update", 4L, "D2", Some(40L), 4L)),
      s"got $got")
  }

  test("a recreated table fails the stream loudly: identity beats version cursors") {
    // offsets ARE versions and versions restart across drop/recreate at
    // one path — without the pinned table id the stream first idles
    // silently (new current version below the committed offset), then
    // emits garbage diffs spanning two unrelated logs
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    VT.commitAppend(Seq((4L, "d")).toDF("k", "s"), dir)                // v2
    drainToParquet(dir, s"$root/ckpt", s"$root/out",
      Map("startingVersion" -> "1"))
    // drop + recreate, then advance the NEW table past the old cursor
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    mk(dir)                                                            // new v1
    VT.commitAppend(Seq((9L, "z")).toDF("k", "s"), dir)                // new v2
    VT.commitAppend(Seq((10L, "y")).toDF("k", "s"), dir)               // new v3
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainToParquet(dir, s"$root/ckpt", s"$root/out", Map.empty)
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: chain(e.getCause))
    assert(chain(ex).exists(m => m != null && m.contains("recreated")),
      s"undiagnostic failure: ${chain(ex)}")
    // the pre-drop output is intact; nothing from the impostor log landed
    assert(parquetRows(s"$root/out") == Set(("insert", 4L, "d", 2L)))
  }

  test("identity pin is LAZY: a pin unobservable at construction still arms on first call") {
    // Pinning once at construction pins NOTHING when no table id is
    // visible yet (table dropped between construction and first trigger)
    // — silently disabling the drop/recreate check for the query's whole
    // lifetime. The lazy pin re-attempts per call: the first observed id
    // is pinned, and a LATER recreate still fails loudly.
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    val src = new graft.sources.VtableCdfSource(spark,
      Map("dir" -> dir, "keys" -> "k"), s"$root/meta")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // drop + recreate BEFORE any source call: the constructor-era id is
    // never observed, so the first call pins the NEW table's id (nothing
    // was consumed yet — pin-at-first-start semantics)…
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    mk(dir)
    assert(src.getOffset.isEmpty, "no changes past startingVersion yet")
    VT.commitAppend(Seq((4L, "d")).toDF("k", "s"), dir)
    assert(src.getOffset.nonEmpty, "the recreated table's commit is visible")
    // …and a SECOND recreate after the pin armed fails loudly
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    mk(dir)
    VT.commitAppend(Seq((9L, "z")).toDF("k", "s"), dir)
    val ex = intercept[IllegalStateException](src.getOffset)
    assert(ex.getMessage.contains("recreated"),
      s"undiagnostic failure: ${ex.getMessage}")
  }

  test("net mode folds a multi-commit window into one diff") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    // churn that partially cancels: k=4 inserted then updated; k=2
    // updated then deleted — the NET window must show only end-vs-start
    VT.commitMerge(Seq((4L, "d", false), (2L, "B", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v2
    VT.commitMerge(Seq((4L, "D2", false), (2L, "x", true)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v3
    drain(dir, s"$root/ckpt", "cdf_net",
      Map("startingVersion" -> "1", "net" -> "true"))
    assert(rows("cdf_net") == Set(
      ("insert", 4L, "D2", 3L), ("delete", 2L, "b", 3L)))
    // per-commit mode over the same window shows the intermediate states
    drain(dir, s"$root/ckpt2", "cdf_full", Map("startingVersion" -> "1"))
    assert(rows("cdf_full") == Set(
      ("insert", 4L, "d", 2L), ("update", 2L, "B", 2L),
      ("update", 4L, "D2", 3L), ("delete", 2L, "B", 3L)))
  }

  test("preimages mode emits the retraction encoding downstream IVM needs") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    VT.commitMerge(Seq((2L, "B", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v2
    drain(dir, s"$root/ckpt", "cdf_pre",
      Map("startingVersion" -> "1", "preimages" -> "true"))
    assert(rows("cdf_pre") == Set(
      ("update_preimage", 2L, "b", 2L), ("update_postimage", 2L, "B", 2L)))
  }

  test("vacuum reclaims cache slices below the oldest kept version only") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    VT.commitMerge(Seq((4L, "d", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v2
    VT.commitMerge(Seq((5L, "e", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v3
    drain(dir, s"$root/ckpt", "cdf_vac", Map("startingVersion" -> "1"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def windows: Set[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir, "_cdf"))
        .map(_.getPath.getName.split('-').take(2).mkString("-")).toSet
    assert(windows == Set("v1-2", "v2-3"))
    // keep v2..v3: the v1→2 slice's window end (2) is still kept → stays;
    // only slices ending BELOW the oldest kept version reclaim
    VT.vacuum(spark, dir, keepVersions = 2)
    assert(windows == Set("v1-2", "v2-3"))
    VT.commitMerge(Seq((6L, "f", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v4
    VT.vacuum(spark, dir, keepVersions = 2)                            // keep v3, v4
    assert(windows == Set("v2-3"),
      "slices ending below the oldest kept version must reclaim")
    // the surviving cache still serves a fresh-checkpoint stream
    drain(dir, s"$root/ckpt2", "cdf_vac2", Map("startingVersion" -> "3"))
    assert(rows("cdf_vac2") == Set(("insert", 6L, "f", 4L)))
  }

  test("admission control: a deep backlog drains in capped multi-version batches") {
    val root = tmp(); val dir = s"$root/t"; mk(dir)
    (1 to 4).foreach { i =>
      VT.commitAppend(Seq((100L + i, s"v$i")).toDF("k", "s").coalesce(1), dir)
    }
    // maxSlicesPerBatch=2 with AvailableNow: the engine asks latestOffset
    // per batch, the source caps each to 2 versions, and the drain still
    // reaches the pinned end — 4 commits across >= 2 batches, exactly once
    drain(dir, s"$root/ckpt", "cdf_deep",
      Map("startingVersion" -> "1", "maxSlicesPerBatch" -> "2"))
    assert(rows("cdf_deep") ==
      (1 to 4).map(i => ("insert", 100L + i, s"v$i", (i + 1).toLong)).toSet)
    // a getBatch window wider than the cap (an engine without admission
    // control) still refuses loudly and names the knobs
    val src = new graft.sources.VtableCdfSource(spark,
      Map("dir" -> dir, "keys" -> "k", "maxSlicesPerBatch" -> "2",
        "startingVersion" -> "1"))
    def off(v: Long) = new org.apache.spark.sql.execution.streaming.Offset {
      override def json: String = v.toString
    }
    val ex = intercept[IllegalStateException] {
      src.getBatch(Some(off(1L)), off(5L))
    }
    assert(ex.getMessage.contains("net=true"))
    // net mode folds the same backlog into one slice per batch
    drain(dir, s"$root/ckpt_net", "cdf_deep_net",
      Map("startingVersion" -> "1", "net" -> "true"))
    assert(rows("cdf_deep_net") ==
      (1 to 4).map(i => ("insert", 100L + i, s"v$i", 5L)).toSet)
  }
}
