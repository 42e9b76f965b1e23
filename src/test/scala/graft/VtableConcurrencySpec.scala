package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.spark.sql.functions._
import graft.ops.{VersionedTable => VT}

/** Optimistic concurrency under real contention: many writers hammering
  * one table through [[VT.withCommitRetry]] must produce a SERIALIZABLE
  * history — versions dense, every batch's rows present exactly once,
  * the transaction ledger monotone — and vacuum must reap the losers'
  * orphaned data dirs without touching a surviving byte. Also the
  * adversarial vacuum × patch-chain interaction: a chain state kept by
  * retention must stay byte-correct after mid-chain reclamation.
  */
class VtableConcurrencySpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("vtconc").toString + "/t"

  private def stress(dir: String, writers: Int, commitsEach: Int): Unit = {
    VT.create(Seq((0L, 0L)).toDF("w", "b").coalesce(1), dir, Seq("w"))
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1 to writers).foreach { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try (1 to commitsEach).foreach { b =>
            VT.withCommitRetry(attempts = 200) {
              VT.commitAppend(
                Seq((w.toLong, b.toLong)).toDF("w", "b").coalesce(1), dir,
                txn = Some(s"writer-$w" -> b.toLong))
            }
          } catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(180, TimeUnit.SECONDS), "stress pool timed out")
    assert(failures.isEmpty, s"writer failed: ${Option(failures.peek())}")
    // serializable history: versions dense from 1, one commit per batch
    val vs = VT.versions(spark, dir)
    assert(vs == (1L to (1L + writers * commitsEach)).toSeq,
      s"history must be dense, got ${vs.take(5)}..${vs.takeRight(5)}")
    // every batch exactly once — no lost update, no double-apply
    val got = VT.read(spark, dir).as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "duplicate rows — a batch applied twice")
    assert(got.toSet ==
      ((0L, 0L) +: (for { w <- 1 to writers; b <- 1 to commitsEach }
        yield (w.toLong, b.toLong))).toSet,
      "every writer's every batch must be present exactly once")
    // the ledger carries each writer's final cursor
    val m = VT.readManifest(spark, dir, vs.last)
    (1 to writers).foreach { w =>
      assert(m.txns.get(s"writer-$w").contains(commitsEach.toLong),
        s"ledger lost writer-$w's cursor: ${m.txns}")
    }
    // losers' orphaned data dirs reclaim; survivors stay byte-correct
    VT.vacuum(spark, dir, keepVersions = vs.size)
    assert(VT.read(spark, dir).as[(Long, Long)].collect().toSet == got.toSet)
  }

  test("8 writers x 5 commits: dense versions, exactly-once batches, monotone ledger") {
    stress(tmp(), writers = 8, commitsEach = 5)
  }

  test("the same stress through delta manifests + concurrent checkpoints") {
    val olds = Seq("spark.graft.vtable.inlineMaxFiles" -> "1",
      "spark.graft.vtable.checkpointInterval" -> "3")
      .map { case (k, v) =>
        val o = spark.conf.getOption(k); spark.conf.set(k, v); k -> o
      }
    try stress(tmp(), writers = 8, commitsEach = 5)
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("vacuum under a patch chain: kept mid-chain state stays byte-correct") {
    val dir = tmp()
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "s")
      .repartitionByRange(2, $"k").sortWithinPartitions("k")
    VT.create(base, dir, Seq("k"))                                     // v1
    VT.commitPatch(Seq((2L, "B", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v2: patch
    VT.commitPatch(Seq((3L, "x", true), (5L, "e", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v3: patch
    VT.compactPatches(spark, dir)                                      // v4: fold
    VT.commitPatch(Seq((1L, "A2", false)).toDF("k", "s", "del"),
      dir, Seq("k"), Seq.empty, $"del")                                // v5: patch
    val v3Expect = Set(1L -> "a", 2L -> "B", 4L -> "d", 5L -> "e")
    val v5Expect = Set(1L -> "A2", 2L -> "B", 4L -> "d", 5L -> "e")
    assert(VT.read(spark, dir, Some(3L)).as[(Long, String)].collect().toSet == v3Expect)
    // keep v3..v5: the OLDEST KEPT version is a mid-chain patch state —
    // every chain file it references must survive the reclamation of v1/v2
    val deleted = VT.vacuum(spark, dir, keepVersions = 3)
    assert(VT.read(spark, dir, Some(3L)).as[(Long, String)].collect().toSet == v3Expect,
      "oldest kept patch-state must read byte-correct after vacuum")
    assert(VT.read(spark, dir, Some(4L)).as[(Long, String)].collect().toSet == v3Expect)
    assert(VT.read(spark, dir).as[(Long, String)].collect().toSet == v5Expect)
    intercept[IllegalArgumentException](VT.read(spark, dir, Some(2L)))
    // now drop below the chain: keeping only the compacted + later states
    // reclaims the folded patch files
    val deleted2 = VT.vacuum(spark, dir, keepVersions = 2)
    assert(deleted + deleted2 > 0, "vacuum should reclaim the folded patch files")
    assert(VT.read(spark, dir, Some(4L)).as[(Long, String)].collect().toSet == v3Expect)
    assert(VT.read(spark, dir).as[(Long, String)].collect().toSet == v5Expect)
  }
}
