package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.PagedManifest

/** Resumable BATCH paged ingest with a checkpoint KEYED BY WATERMARK —
  * the fix for SURVEY §1.5 quirk 4: the reference keeps a
  * `{total_records, offset}` JSON checkpoint (`scripts/extract.py:74-95`)
  * but re-reads the warehouse watermark on resume
  * (`scripts/extract.py:103`), so the saved offset indexes into a
  * DIFFERENT filtered result set and rows are silently skipped or
  * re-read.
  *
  * Here the checkpoint records the watermark the run STARTED with; a
  * resume reuses that watermark (the page list and filter are a pure
  * function of it, so the saved page index points into the same result
  * set), and only a COMPLETED run clears the checkpoint so the next run
  * cuts a fresh watermark. Combined with the idempotent first-writer-wins
  * upsert (D1), every page is applied exactly once in effect — a crash
  * between a page's upsert and its checkpoint write re-runs that one
  * page, whose rows the anti-join then drops.
  *
  * The streaming path (I2, [[graft.streaming.StreamOps]]) gets the same
  * property from Structured Streaming's offset log; this is the batch
  * analog for schedulers that re-invoke a plain job.
  */
object BatchIngest {

  /** `(watermark, pagesDone)` — `pagesDone` counts pages of THIS
    * watermark's filtered page list already upserted.
    */
  case class Checkpoint(watermark: Long, pagesDone: Int)

  def readCheckpoint(path: String): Option[Checkpoint] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(p.toFile)
      Some(Checkpoint(node.get("watermark").asLong(), node.get("pagesDone").asInt()))
    }
  }

  private def writeCheckpoint(path: String, c: Checkpoint): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    // write-then-rename so a crash mid-write never leaves a torn checkpoint
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp,
      s"""{"watermark":${c.watermark},"pagesDone":${c.pagesDone}}"""
        .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Current warehouse high-water mark over `keyCol` (−1 when absent). */
  def currentHwm(spark: SparkSession, warehouseDir: String, keyCol: String): Long = {
    val exists = new org.apache.hadoop.fs.Path(warehouseDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(warehouseDir))
    if (!exists) -1L
    else spark.read.parquet(warehouseDir)
      .agg(coalesce(max(col(keyCol)), lit(-1L))).head().getLong(0)
  }

  /** Ingest every page with `maxKey > watermark` from a paged fixture dir
    * into a parquet warehouse, upserting page by page and checkpointing
    * after each. Returns rows inserted this invocation. `onPageCommitted`
    * fires after each page's checkpoint lands (progress reporting; specs
    * throw from it to simulate a crash).
    *
    * Page files prune via manifest stats exactly like the DSv2 source;
    * the row-level `keyCol > watermark` filter is re-applied because
    * stats pruning is never load-bearing.
    */
  def ingest(spark: SparkSession, pagesDir: String, warehouseDir: String,
             checkpointPath: String, keyCol: String, tiebreak: Seq[Column],
             onPageCommitted: Int => Unit = _ => ()): Long = {
    val manifest = PagedManifest.read(pagesDir)
    val resumed = readCheckpoint(checkpointPath)
    // THE quirk-4 fix: a resumed run reuses the watermark it started with;
    // only a fresh run (no checkpoint) reads the warehouse's current HWM
    val wm = resumed.map(_.watermark)
      .getOrElse(currentHwm(spark, warehouseDir, keyCol))
    val startPage = resumed.map(_.pagesDone).getOrElse(0)
    val pages = manifest.pages.filter(_.maxKey > wm)
    var inserted = 0L
    var i = startPage
    while (i < pages.length) {
      val page = spark.read.schema(manifest.schema)
        .json(s"$pagesDir/${pages(i).file}")
        .filter(col(keyCol) > wm)
      inserted += Warehouse.upsertIntoParquet(page, warehouseDir,
        Seq(keyCol), tiebreak)
      writeCheckpoint(checkpointPath, Checkpoint(wm, i + 1))
      onPageCommitted(i)
      i += 1
    }
    Files.deleteIfExists(Paths.get(checkpointPath))
    inserted
  }
}
