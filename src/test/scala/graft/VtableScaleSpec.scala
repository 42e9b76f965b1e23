package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.{VersionedTable => VT}

/** The metadata layer at scale: above `inlineMaxFiles` the manifest is
  * O(delta) + periodic parquet checkpoints, and pruning / touched-file
  * detection run as Spark jobs over the checkpoint relation. These specs
  * pin (a) every read path staying exact across the inline→delta
  * transition, (b) commit cost being O(delta) — bytes-asserted — on a
  * 50k-file table, and (c) the distributed pruning tier engaging above
  * the threshold with decisions identical to the driver tier's.
  */
class VtableScaleSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("vtscale").toString + "/t"

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def manifestLen(dir: String, v: Long): Long = {
    val p = new org.apache.hadoop.fs.Path(dir, f"_vlog/v$v%012d.json")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).getLen
  }

  private def ckptExists(dir: String, v: Long): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir, f"_vlog/ckpt-v$v%012d.parquet")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** One row, exactly one data file — deterministic file counts. */
  private def row1(k: Long, s: String) =
    Seq((k, s)).toDF("k", "s").coalesce(1)

  test("inline→delta transition: reads, time travel, CDF, merge, restore, vacuum all exact") {
    withConfs(
      "spark.graft.vtable.inlineMaxFiles" -> "2",
      "spark.graft.vtable.checkpointInterval" -> "2",
      "spark.graft.vtable.distributedPruneThreshold" -> "3") {
      val dir = tmp()
      VT.create(row1(1L, "a"), dir, Seq("k"))          // v1: 1 file, full
      VT.commitAppend(row1(2L, "b"), dir)              // v2: 2 files, full
      VT.commitAppend(row1(3L, "c"), dir)              // v3: 3 files, delta
      VT.commitAppend(row1(4L, "d"), dir)              // v4: delta + ckpt
      VT.commitAppend(row1(5L, "e"), dir)              // v5: delta
      assert(VT.readMeta(spark, dir, 2L).mode == "full")
      assert(VT.readMeta(spark, dir, 3L).mode == "delta")
      assert(VT.readMeta(spark, dir, 5L).mode == "delta")
      assert((3L to 5L).exists(ckptExists(dir, _)),
        "a checkpoint must land within checkpointInterval delta commits")
      // every version reads exactly, through whatever replay base applies
      assert(VT.read(spark, dir, Some(1L)).count() == 1)
      assert(VT.read(spark, dir, Some(3L)).count() == 3)
      assert(VT.read(spark, dir).as[(Long, String)].collect().toSet ==
        (1L to 5L).map(k => k -> ('a' + k - 1).toChar.toString).toSet)
      // history is header-only and still exact
      assert(VT.history(spark, dir).map(h => (h._1, h._3, h._4)) ==
        (1L to 5L).reverse.map(v => (v, v.toInt, v)))
      // CDF across the transition folds from the delta manifests
      val feed = VT.changesBetween(spark, dir, 1L, 5L, Seq("k"))
        .select($"change_type", $"k").as[(String, Long)].collect().toSet
      assert(feed == (2L to 5L).map(("insert", _)).toSet)
      // merge above the distributed threshold: touched-file detection runs
      // as a Spark job and the result matches a from-scratch oracle
      VT.lastTouchedMode = ""
      VT.commitMerge(Seq((3L, "C2", false), (6L, "f", false), (2L, "x", true))
          .toDF("k", "s", "del"), dir, Seq("k"), Seq.empty, $"del")
      assert(VT.lastTouchedMode == "distributed")
      assert(VT.read(spark, dir).as[(Long, String)].collect().toSet ==
        Set(1L -> "a", 3L -> "C2", 4L -> "d", 5L -> "e", 6L -> "f"))
      // pruned read through the distributed tier stays exact
      VT.lastPruneMode = ""
      val pruned = VT.readWhere(spark, dir, $"k" >= 3L && $"k" <= 5L)
        .as[(Long, String)].collect().toSet
      assert(VT.lastPruneMode == "distributed")
      assert(pruned == Set(3L -> "C2", 4L -> "d", 5L -> "e"))
      // restore to a pre-transition version, then vacuum: the kept chain
      // re-bases onto a fresh checkpoint and every kept read survives
      val rv = VT.restore(spark, dir, 2L)
      assert(VT.read(spark, dir).as[(Long, String)].collect().toSet ==
        Set(1L -> "a", 2L -> "b"))
      VT.vacuum(spark, dir, keepVersions = 2)
      assert(VT.read(spark, dir).as[(Long, String)].collect().toSet ==
        Set(1L -> "a", 2L -> "b"))
      assert(VT.read(spark, dir, Some(rv - 1))
        .as[(Long, String)].collect().toSet ==
        Set(1L -> "a", 3L -> "C2", 4L -> "d", 5L -> "e", 6L -> "f"))
      intercept[IllegalArgumentException](VT.read(spark, dir, Some(1L)))
    }
  }

  test("50k-file table: commits are O(delta) in bytes, pruning runs distributed, replay exact") {
    val dir = tmp()
    // real base: negative keys, kept clear of the synthetic key space so
    // merges/pruned reads never open a fabricated path
    VT.create(row1(-1L, "r1"), dir, Seq("k"))
    VT.commitAppend(row1(-2L, "r2"), dir)
    // register 50k external files by reference — pure metadata commits
    def entry(i: Int) = VT.FileEntry(f"ext/f$i%06d.parquet", 1L,
      Map("k" -> VT.ColStat("BIGINT", Some(i.toString), Some(i.toString), 0L)))
    var v = 0L
    (0 until 5).foreach { b =>
      v = VT.commitAddFiles(spark, dir,
        (b * 10000 until (b + 1) * 10000).map(entry))
    }
    assert(VT.readMeta(spark, dir, v).numFiles == 50002L)
    // each 10k batch outgrew the inline bound → checkpointed immediately
    assert(ckptExists(dir, v))
    // O(delta) commit: a 1-file append against the 50k-file table writes
    // a manifest orders of magnitude smaller than the table's file list
    val va = VT.commitAppend(row1(-3L, "r3"), dir)
    assert(VT.readMeta(spark, dir, va).mode == "delta")
    assert(manifestLen(dir, va) < 20000,
      s"append manifest should be O(delta) bytes, got ${manifestLen(dir, va)}")
    assert(VT.readMeta(spark, dir, va).numFiles == 50003L)
    // replay correctness: the materialized list folds checkpoint + deltas
    assert(VT.readManifest(spark, dir, va).files.size == 50003)
    // pruning runs as a Spark job and lands on exactly the right files
    VT.lastPruneMode = ""
    val survivors = VT.pruneForSpec(spark, dir,
      Seq(("k", Some(lit(123L)), Some(lit(125L)))), Seq.empty)
    assert(VT.lastPruneMode == "distributed")
    assert(survivors.toSet ==
      Set("ext/f000123.parquet", "ext/f000124.parquet", "ext/f000125.parquet"))
    // touched-file detection likewise: a merge on the real keys flows
    // through the distributed tier and rewrites only the real files
    VT.lastTouchedMode = ""
    val vm = VT.commitMerge(Seq((-1L, "R1", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")
    assert(VT.lastTouchedMode == "distributed")
    // the rewritten slice reads back exactly (restricted below the
    // synthetic key space, which exists only as metadata)
    val got = VT.readWhere(spark, dir, $"k" <= -1L)
      .as[(Long, String)].collect().toSet
    assert(got == Set(-1L -> "R1", -2L -> "r2", -3L -> "r3"))
    // CDF over the merge window folds from delta manifests — never walks
    // the 50k-entry list — and names exactly the changed key
    val feed = VT.changesBetween(spark, dir, vm - 1, vm, Seq("k"))
      .select($"change_type", $"k", $"s").as[(String, Long, String)]
      .collect().toSet
    assert(feed == Set(("update", -1L, "R1")))
    // tableStats folds the stats as a SPARK JOB above the threshold: the
    // 50k synthetic files DO NOT EXIST on disk, so a correct answer here
    // is constructive proof the fold is manifest-only (header rows,
    // cluster-folded bounds through the column's own Catalyst order)
    val ts = VT.tableStats(spark, dir)
    assert(ts.rows == 50003L && ts.exact)
    assert(ts.cols("k") == ((0L, Some("-3"), Some("49999"))))
  }

  test("10^6-file table: distributed prune, touched-file detection, stats, vacuum planning") {
    // the next metadata decade past the 50k spec: one MILLION registered
    // entries through checkpointed replay. Everything data-proportional
    // must run as a Spark job — pruning, touched-file detection, the
    // stats fold, and (new this round) vacuum's reference set — with the
    // driver collecting only survivors/orphans.
    val dir = tmp()
    VT.create(row1(-1L, "r1"), dir, Seq("k"))
    VT.commitAppend(row1(-2L, "r2"), dir)
    def entry(i: Int) = VT.FileEntry(f"ext/f$i%07d.parquet", 1L,
      Map("k" -> VT.ColStat("BIGINT", Some(i.toString), Some(i.toString), 0L)))
    var v = 0L
    val tBuild0 = System.nanoTime()
    (0 until 10).foreach { b =>
      v = VT.commitAddFiles(spark, dir,
        (b * 100000 until (b + 1) * 100000).map(entry))
    }
    val tBuild = (System.nanoTime() - tBuild0) / 1e9
    assert(VT.readMeta(spark, dir, v).numFiles == 1000002L)
    // O(delta) commit cost is independent of the million entries
    val va = VT.commitAppend(row1(-3L, "r3"), dir)
    assert(manifestLen(dir, va) < 20000,
      s"append manifest must stay O(delta) bytes at 10^6 files: ${manifestLen(dir, va)}")
    // pruning: distributed, exact survivors out of a million candidates
    VT.lastPruneMode = ""
    val tPrune0 = System.nanoTime()
    val survivors = VT.pruneForSpec(spark, dir,
      Seq(("k", Some(lit(777123L)), Some(lit(777125L)))), Seq.empty)
    val tPrune = (System.nanoTime() - tPrune0) / 1e9
    assert(VT.lastPruneMode == "distributed")
    assert(survivors.toSet == Set("ext/f0777123.parquet",
      "ext/f0777124.parquet", "ext/f0777125.parquet"))
    // stats fold: one Spark job, exact over the synthetic million
    val tStats0 = System.nanoTime()
    val ts = VT.tableStats(spark, dir)
    val tStats = (System.nanoTime() - tStats0) / 1e9
    assert(ts.rows == 1000003L && ts.exact)
    assert(ts.cols("k") == ((0L, Some("-3"), Some("999999"))))
    // touched-file detection on a merge: distributed, rewrites only the
    // real files (the synthetic entries exist solely as metadata)
    VT.lastTouchedMode = ""
    VT.commitMerge(Seq((-1L, "R1", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")
    assert(VT.lastTouchedMode == "distributed")
    assert(VT.readWhere(spark, dir, $"k" <= -1L)
      .as[(Long, String)].collect().toSet ==
      Set(-1L -> "R1", -2L -> "r2", -3L -> "r3"))
    // vacuum planning: the reference set must NOT materialize a million
    // paths on the driver — the orphan decision is a distributed
    // anti-join, and the losers' real bytes still reclaim exactly
    val tVac0 = System.nanoTime()
    VT.lastVacuumMode = ""
    val reclaimed = VT.vacuum(spark, dir, keepVersions = 1)
    val tVac = (System.nanoTime() - tVac0) / 1e9
    assert(VT.lastVacuumMode == "distributed",
      "a 10^6-file vacuum must plan its reference set distributed")
    assert(reclaimed >= 1, "the merge's pre-image file must reclaim")
    assert(VT.readWhere(spark, dir, $"k" <= -1L)
      .as[(Long, String)].collect().toSet ==
      Set(-1L -> "R1", -2L -> "r2", -3L -> "r3"),
      "vacuum must not touch a referenced byte")
    // pruning still exact after the vacuum checkpoint rewrite
    assert(VT.pruneForSpec(spark, dir,
      Seq(("k", Some(lit(5L)), Some(lit(5L)))), Seq.empty) ==
      Seq("ext/f0000005.parquet"))
    info(f"10^6-file walls: build=$tBuild%.1f s prune=$tPrune%.2f s " +
      f"stats=$tStats%.2f s vacuum=$tVac%.2f s")
  }

  test("a stats-less registered file blocks metadata-only answers but not reads") {
    val dir = tmp()
    VT.create(row1(1L, "a"), dir, Seq("k"))
    // register a REAL second file by reference, honest rows but NO stats
    val src = VT.readManifest(spark, dir, 1L).files.head.path
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$dir/$src"), fs,
      new org.apache.hadoop.fs.Path(s"$dir/ext/copy.parquet"), false,
      spark.sparkContext.hadoopConfiguration)
    VT.commitAddFiles(spark, dir,
      Seq(VT.FileEntry("ext/copy.parquet", 1L, Map.empty)))
    graft.functions.GraftFunctions.register(spark)
    // COUNT(*) still answers from the header; MIN over a blind column must
    // DECLINE the metadata answer and fall back to the (correct) scan
    val df = spark.sql(s"SELECT COUNT(*) AS n, MIN(k) AS mn FROM graft_vtable('$dir')")
    assert(df.as[(Long, Long)].head() == ((2L, 1L)))
    assert(df.queryExecution.executedPlan.toString.contains("Scan"),
      "a blind entry must force the scan, not a fabricated metadata answer")
  }

  test("a CREATE bigger than the inline bound replays from the empty base") {
    withConfs("spark.graft.vtable.inlineMaxFiles" -> "2") {
      val dir = tmp()
      // 4 files in the INITIAL commit: v1 is delta-mode with no ancestor
      val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "s")
        .repartitionByRange(4, $"k").sortWithinPartitions("k")
      VT.create(base, dir, Seq("k"))
      assert(VT.readMeta(spark, dir, 1L).mode == "delta")
      assert(ckptExists(dir, 1L),
        "an oversized create must checkpoint immediately")
      assert(VT.read(spark, dir).as[(Long, String)].collect().toSet ==
        Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
      assert(VT.readManifest(spark, dir, 1L).files.size == 4)
      // and the table keeps working: append + merge + time travel
      VT.commitAppend(row1(5L, "e"), dir)
      VT.commitMerge(Seq((2L, "B", false)).toDF("k", "s", "del"),
        dir, Seq("k"), Seq.empty, $"del")
      assert(VT.read(spark, dir).count() == 5)
      assert(VT.read(spark, dir, Some(1L)).count() == 4)
    }
  }

  test("a path removed then re-registered nets to NO change in the feed") {
    withConfs("spark.graft.vtable.inlineMaxFiles" -> "1") {
      val dir = tmp()
      VT.create(row1(1L, "a"), dir, Seq("k"))                         // v1
      VT.commitAppend(row1(2L, "b"), dir)                             // v2
      VT.commitAppend(row1(3L, "c"), dir)                             // v3
      val victim = VT.readManifest(spark, dir, 3L).files
        .find(_.stats("k").min.contains("2")).get // k=2's file, by stats
      // v4 drops k=2's file (delete rewrites it away entirely); the
      // table stays ABOVE inlineMaxFiles so the whole window remains
      // delta-mode and changesBetween takes the manifest FOLD, not the
      // materialized-set-diff fallback (spec-pinned below)
      VT.commitDelete(spark, dir, $"k" === 2L)
      // ...v5 re-registers the SAME path by reference (file still on disk)
      VT.commitAddFiles(spark, dir, Seq(victim))
      assert(((4L to 5L)).forall(v => VT.readMeta(spark, dir, v).mode == "delta"),
        "window must stay delta-mode to exercise the fold branch")
      assert(VT.read(spark, dir).as[(Long, String)].collect().toSet ==
        Set(1L -> "a", 2L -> "b", 3L -> "c"))
      // the all-delta window fold must cancel remove-then-readd — the
      // content at both window ends is identical, so the feed is EMPTY
      assert(VT.changesBetween(spark, dir, 3L, 5L, Seq("k")).isEmpty)
    }
  }

  test("driver and distributed pruning tiers agree decision-for-decision") {
    val dir = tmp()
    val base = spark.range(1000)
      .select($"id".as("k"), concat(lit("s"), $"id").as("s"))
      .repartitionByRange(10, $"k").sortWithinPartitions("k")
    VT.create(base, dir, statsCols = Seq("k"))
    val preds = Seq(("k", Some(lit(150L)), Some(lit(420L))))
    val ins = Seq(("k", Seq(lit(7L), lit(523L))))
    VT.lastPruneMode = ""
    val driver = VT.pruneForSpec(spark, dir, preds, ins)
    assert(VT.lastPruneMode == "driver")
    withConfs("spark.graft.vtable.distributedPruneThreshold" -> "1") {
      VT.lastPruneMode = ""
      val dist = VT.pruneForSpec(spark, dir, preds, ins)
      assert(VT.lastPruneMode == "distributed")
      assert(dist.sorted == driver.sorted,
        "both tiers must produce the identical survivor set")
    }
  }
}
