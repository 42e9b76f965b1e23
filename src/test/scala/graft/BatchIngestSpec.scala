package graft

import org.apache.spark.sql.functions._

import graft.ops.BatchIngest
import graft.sources.PagedManifest

/** Watermark-keyed resumable batch ingest (SURVEY §1.5 quirk 4): a resume
  * after the warehouse watermark moved must not skip or double-read rows.
  */
class BatchIngestSpec extends SparkSuite {
  import spark.implicits._

  private def freshDirs(tag: String): (String, String, String) = {
    val base = s"/root/repo/target/fixtures/batch_ingest_$tag"
    val p = new java.io.File(base)
    if (p.exists()) org.apache.commons.io.FileUtils.deleteDirectory(p)
    (s"$base/pages", s"$base/warehouse", s"$base/ckpt.json")
  }

  private def mkPages(pagesDir: String): Unit =
    PagedManifest.writeFixture(
      (1L to 100L).map(k => (k, s"payload$k")).toDF("k", "payload"),
      pagesDir, "k", pageSize = 10)

  test("crash mid-run + moved watermark: resume neither skips nor duplicates") {
    val (pagesDir, whDir, ckpt) = freshDirs("quirk4")
    mkPages(pagesDir)
    // seed the warehouse: keys 1..30 already present → fresh run cuts wm=30
    (1L to 30L).map(k => (k, s"payload$k")).toDF("k", "payload")
      .write.parquet(whDir)

    // run 1: crashes after 3 pages of the wm=30 page list have committed
    val boom = intercept[RuntimeException] {
      BatchIngest.ingest(spark, pagesDir, whDir, ckpt, "k", Seq(col("payload")),
        onPageCommitted = i => if (i >= 2) throw new RuntimeException("injected crash"))
    }
    assert(boom.getMessage == "injected crash")
    val saved = BatchIngest.readCheckpoint(ckpt).get
    assert(saved.watermark == 30L && saved.pagesDone == 3)

    // the warehouse HWM moves while we are down (another writer lands
    // keys 95..100) — the exact scenario where the reference's
    // offset-against-fresh-watermark resume goes wrong
    (95L to 100L).map(k => (k, s"payload$k")).toDF("k", "payload")
      .write.mode("append").parquet(whDir)

    // NEGATIVE CONTROL — the reference's resume semantics
    // (scripts/extract.py:100+103): fresh watermark, saved page offset.
    // wm=100 filters the page list to zero pages after offset 3, so keys
    // 61..94 would never be ingested. Assert the hazard is real.
    val freshWm = BatchIngest.currentHwm(spark, whDir, "k")
    assert(freshWm == 100L)
    val manifest = PagedManifest.read(pagesDir)
    val naivePages = manifest.pages.filter(_.maxKey > freshWm).drop(saved.pagesDone)
    val alreadyThere = spark.read.parquet(whDir).select("k").as[Long].collect().toSet
    val naiveMissed = (31L to 94L).toSet -- alreadyThere --
      naivePages.flatMap(p => p.minKey to p.maxKey).toSet
    assert(naiveMissed.nonEmpty,
      "precondition: the reference's fresh-watermark resume would skip rows here")

    // run 2: OUR resume — keyed by the checkpointed watermark
    BatchIngest.ingest(spark, pagesDir, whDir, ckpt, "k", Seq(col("payload")))
    val after = spark.read.parquet(whDir)
    assert(after.count() == 100L, "no rows skipped")
    assert(after.select("k").distinct().count() == 100L, "no rows double-read")
    assert(after.select("k").as[Long].collect().toSet == (1L to 100L).toSet)
    assert(BatchIngest.readCheckpoint(ckpt).isEmpty,
      "a completed run must clear the checkpoint so the next run cuts a fresh wm")
  }

  test("crash between upsert and checkpoint write replays one page without duplicates") {
    val (pagesDir, whDir, ckpt) = freshDirs("replay")
    mkPages(pagesDir)
    // crash BEFORE the first checkpoint lands: page 0's rows are already
    // upserted but pagesDone=0 — the resume re-reads page 0 and the
    // idempotent anti-join upsert must drop every replayed row
    intercept[RuntimeException] {
      BatchIngest.ingest(spark, pagesDir, whDir, ckpt, "k", Seq(col("payload")),
        onPageCommitted = _ => throw new RuntimeException("crash after page 0 commit"))
    }
    // checkpoint recorded page 0 as done (commit happens before the hook);
    // simulate the harsher ordering by rewinding the checkpoint to 0
    val saved = BatchIngest.readCheckpoint(ckpt).get
    java.nio.file.Files.write(java.nio.file.Paths.get(ckpt),
      s"""{"watermark":${saved.watermark},"pagesDone":0}""".getBytes("UTF-8"))
    BatchIngest.ingest(spark, pagesDir, whDir, ckpt, "k", Seq(col("payload")))
    val after = spark.read.parquet(whDir)
    assert(after.count() == 100L && after.select("k").distinct().count() == 100L,
      "replayed page must upsert to zero net new rows")
  }

  test("fresh run with no checkpoint ingests everything above the warehouse HWM") {
    val (pagesDir, whDir, ckpt) = freshDirs("fresh")
    mkPages(pagesDir)
    val n = BatchIngest.ingest(spark, pagesDir, whDir, ckpt, "k", Seq(col("payload")))
    assert(n == 100L)
    assert(spark.read.parquet(whDir).count() == 100L)
    // second run: nothing new, still idempotent
    assert(BatchIngest.ingest(spark, pagesDir, whDir, ckpt, "k", Seq(col("payload"))) == 0L)
  }
}
