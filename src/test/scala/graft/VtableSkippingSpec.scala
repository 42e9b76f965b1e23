package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.ops.{VersionedTable => VT}

/** The optimizer-integrated data-skipping rule
  * ([[graft.plans.VtableSkipping]]): a plain `Filter` over a versioned
  * read must skip manifest-pruned files with NO cooperation from the
  * caller — and must never change an answer.
  */
class VtableSkippingSpec extends SparkSuite {
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  private def tmp(): String =
    Files.createTempDirectory("vtskip").toString + "/t"

  /** File counts of every parquet scan in the EXECUTED plan. */
  private def scanFiles(df: DataFrame): Seq[Int] =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location.inputFiles.length
    }

  /** 4 range-clustered files over k = 0..99 → tight per-file intervals. */
  private def mkTable(dir: String): Unit = {
    val base = spark.range(100)
      .select($"id".as("k"), ($"id" % 7).cast("string").as("s"))
      .repartitionByRange(4, $"k").sortWithinPartitions($"k")
    VT.create(base, dir, statsCols = Seq("k"))
  }

  test("DataFrame Filter over read() prunes files inside the optimizer") {
    val dir = tmp(); mkTable(dir)
    val df = VT.read(spark, dir).filter($"k" >= 10L && $"k" <= 30L)
    val files = scanFiles(df)
    assert(files.nonEmpty && files.head < 4,
      s"expected a pruned scan (<4 files), got $files")
    assert(df.as[(Long, String)].collect().toSet ==
      (10L to 30L).map(k => (k, (k % 7).toString)).toSet)
  }

  test("SQL WHERE over graft_vtable prunes through the same rule") {
    val dir = tmp(); mkTable(dir)
    val df = spark.sql(
      s"SELECT k, s FROM graft_vtable('$dir') WHERE k BETWEEN 80 AND 99")
    val files = scanFiles(df)
    assert(files.nonEmpty && files.head < 4,
      s"expected a pruned scan (<4 files), got $files")
    assert(df.as[(Long, String)].collect().toSet ==
      (80L to 99L).map(k => (k, (k % 7).toString)).toSet)
  }

  test("OR conjuncts never prune; answer stays exact") {
    val dir = tmp(); mkTable(dir)
    val df = VT.read(spark, dir).filter($"k" < 5L || $"k" > 94L)
    assert(scanFiles(df) == Seq(4), "a top-level OR must not prune")
    assert(df.count() == 10L)
  }

  test("no-survivor predicate collapses to an empty local relation") {
    val dir = tmp(); mkTable(dir)
    val df = VT.read(spark, dir).filter($"k" === 1000L)
    assert(scanFiles(df).isEmpty, "no parquet scan should remain")
    assert(df.count() == 0L)
  }

  test("large IN list (optimized to InSet) still prunes") {
    val dir = tmp(); mkTable(dir)
    // 12 values > the default In→InSet conversion threshold (10), all in
    // the first file's range
    val vals = (0L to 11L)
    val df = VT.read(spark, dir).filter($"k".isin(vals: _*))
    val files = scanFiles(df)
    assert(files.nonEmpty && files.head < 4,
      s"InSet should prune to the covering files, got $files")
    assert(df.select($"k").as[Long].collect().toSet == vals.toSet)
  }

  test("the same read() DataFrame prunes again on a second query (tag not consumed)") {
    val dir = tmp(); mkTable(dir)
    val base = VT.read(spark, dir)
    assert(scanFiles(base.filter($"k" <= 20L)).head < 4)
    assert(scanFiles(base.filter($"k" >= 80L)).head < 4)
    // and an unfiltered read still scans everything
    assert(base.count() == 100L)
  }

  test("un-minable conjuncts ride along; mined ones still prune") {
    val dir = tmp(); mkTable(dir)
    val df = VT.read(spark, dir)
      .filter($"k" >= 10L && $"k" <= 30L && length($"s") >= 1)
    val files = scanFiles(df)
    assert(files.nonEmpty && files.head < 4)
    assert(df.count() == 21L)
  }

  test("filter over a patch chain stays exact (base tag under the fold)") {
    val dir = tmp(); mkTable(dir)
    VT.commitPatch(Seq((10L, "patched", false), (1000L, "new", false))
      .toDF("k", "s", "__del"), dir, Seq("k"),
      tiebreak = Seq.empty, deleteCond = col("__del"))
    val df = VT.read(spark, dir).filter($"k" >= 5L && $"k" <= 15L)
    val got = df.as[(Long, String)].collect().toSet
    val want = (5L to 15L).map(k =>
      (k, if (k == 10L) "patched" else (k % 7).toString)).toSet
    assert(got == want)
  }

  test("pruned file set equals the library-level pruning decision") {
    val dir = tmp(); mkTable(dir)
    val (libSurvivors, _) =
      VT.pruneFiles(spark, dir, "k", lit(25L), lit(60L))
    val df = VT.read(spark, dir).filter($"k" >= 25L && $"k" <= 60L)
    assert(scanFiles(df) == Seq(libSurvivors.size))
  }
}
