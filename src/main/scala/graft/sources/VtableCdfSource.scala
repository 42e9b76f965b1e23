package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.{GraftCatalog, VersionedTable => VT}

/** STREAMING change-data-feed source over a versioned table — the read
  * side of the CDC loop whose write side is
  * [[graft.streaming.StreamOps.streamingCdcApplyVersioned]] (Delta's
  * `readChangeFeed` shape): `spark.readStream.format("graft-vtable-cdf")
  * .option("dir", …).option("keys", "k").load()` emits one row per
  * change with `change_type`, the table payload, and `_commit_version`.
  *
  * Offsets ARE table versions — the manifest log is already a durable,
  * totally-ordered change log, so the source is stateless: a restart
  * resumes from the checkpoint's version and replays
  * [[VT.changesBetween]] windows, which are deterministic functions of
  * the immutable manifests. Exactly-once falls out of the engine's
  * offset log + the deterministic replay; no sidecar state.
  *
  * Granularity: by default each commit becomes its own slice
  * (`_commit_version` = that commit), preserving full change history —
  * batches spanning more than `maxSlicesPerBatch` commits refuse LOUDLY
  * (a plan with hundreds of unioned diff-joins helps nobody) and point
  * at `net=true`, which folds a whole batch window into ONE net diff
  * (`_commit_version` = window end): the scale path for deep backlogs,
  * with the same semantics the incremental-view consumer already uses.
  *
  * `startingVersion`: default = the table's current version at stream
  * start (future changes only); `0` additionally emits the version-1
  * snapshot as `insert` rows first — the Delta convention for
  * bootstrap-then-follow consumers. `preimages=true` switches to the
  * retraction encoding ([[VT.changesBetween]] `preimages`).
  *
  * Schema is pinned at stream start; an append-only evolution mid-stream
  * fails the batch loudly (restart the stream to pick up the wider
  * schema) rather than silently dropping the new column's changes.
  */
class VtableCdfSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-vtable-cdf"

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), VtableCdfSource.schemaFor(sqlContext.sparkSession, parameters))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new VtableCdfSource(sqlContext.sparkSession, parameters, metadataPath)
}

object VtableCdfSource {
  private[sources] def dirOf(spark: SparkSession,
                             parameters: Map[String, String]): String =
    GraftCatalog.resolveDir(spark, parameters.getOrElse("dir",
      throw new IllegalArgumentException(
        "graft-vtable-cdf: option 'dir' (table name or directory) is required")))

  private[sources] def schemaFor(spark: SparkSession,
                                 parameters: Map[String, String]): StructType = {
    val dir = dirOf(spark, parameters)
    val v = VT.currentVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"graft-vtable-cdf: $dir is not a versioned table"))
    val table = StructType.fromDDL(VT.readMeta(spark, dir, v).schemaDdl)
    StructType(StructField("change_type", StringType, nullable = false) +:
      table.fields :+ StructField("_commit_version", LongType, nullable = false))
  }
}

class VtableCdfSource(spark: SparkSession, parameters: Map[String, String],
                      metadataPath: String = "")
  extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val dir = VtableCdfSource.dirOf(spark, parameters)
  private val keys = parameters.getOrElse("keys",
      throw new IllegalArgumentException(
        "graft-vtable-cdf: option 'keys' (comma-separated key columns) is required"))
    .split(",").map(_.trim).filter(_.nonEmpty).toSeq
  private val preimages = parameters.get("preimages").exists(_.toBoolean)
  private val net = parameters.get("net").exists(_.toBoolean)
  private val maxSlices = parameters.get("maxSlicesPerBatch").map(_.toInt).getOrElse(64)
  private val startVersion: Long = parameters.get("startingVersion").map(_.toLong)
    .getOrElse(VT.currentVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"graft-vtable-cdf: $dir is not a versioned table")))

  override val schema: StructType = VtableCdfSource.schemaFor(spark, parameters)

  /** Offsets ARE versions, and version numbers restart when a table is
    * dropped and recreated at this path — the checkpoint's cursor would
    * then point into a DIFFERENT table's log: first a silent idle (new
    * current version below the committed offset), then garbage diffs once
    * it passes it. The table's identity UUID is pinned IN THE CHECKPOINT
    * (the source's metadata dir) at first start — pinning in the source
    * instance would just re-pin the impostor on restart — and every
    * offset/batch call re-checks it, failing loudly the moment the log
    * underneath changes hands (legacy tables without an id keep the old
    * behavior).
    *
    * The pin is LAZY, re-attempted on every offset/batch call until an id
    * is observed, then cached: pinning once at construction would pin
    * NOTHING when no table id is visible yet (a table dropped between
    * construction and first trigger, a legacy table upgraded mid-stream),
    * silently disabling the identity check for the query's whole lifetime
    * — exactly the hazard the pin exists to close. The unpinned-yet
    * retry costs one metadata read per trigger, on calls that already
    * read the current manifest.
    */
  @volatile private var pinnedTableIdCache: Option[String] = None
  private def pinnedTableId: Option[String] = {
    if (pinnedTableIdCache.isEmpty) {
      pinnedTableIdCache =
        if (metadataPath.isEmpty) VT.tableId(spark, dir)
        else {
          val p = new org.apache.hadoop.fs.Path(metadataPath, "graft-table-id")
          graft.ops.TableIdPin.pinOrRead(
            p.getFileSystem(spark.sparkContext.hadoopConfiguration), p,
            VT.tableId(spark, dir))
        }
    }
    pinnedTableIdCache
  }

  private def requireSameTable(): Unit =
    graft.ops.TableIdPin.requireSame(pinnedTableId, VT.tableId(spark, dir),
      "graft-vtable-cdf", dir,
      "start a NEW stream (new checkpoint) against the new table")

  private case class CdfOffset(version: Long) extends V1Offset {
    override def json: String = version.toString
  }

  private def versionOf(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o match {
      case CdfOffset(v) => v
      case other => other.json.trim.toLong // incl. SerializedOffset replays
    }

  override def getOffset: Option[V1Offset] = {
    requireSameTable()
    val cur = VT.currentVersion(spark, dir).getOrElse(return None)
    if (cur > startVersion || startVersion == 0L && cur >= 1L)
      Some(CdfOffset(cur))
    else None
  }

  // ---- admission control + Trigger.AvailableNow -------------------------
  // With SupportsAdmissionControl the engine hands latestOffset the START
  // offset, so per-batch version capping is SAFE (capping in getOffset
  // could land below a restarted query's committed offset). AvailableNow
  // pins the end version at query start and drains to it in capped
  // batches.
  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = VT.currentVersion(spark, dir)

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    VT.currentVersion(spark, dir).map(CdfOffset).orNull

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    requireSameTable()
    val cur = availableNowEnd
      .orElse(VT.currentVersion(spark, dir)).getOrElse(return null)
    val from = Option(start).map(versionOf).getOrElse(math.max(0L, startVersion))
    // `start` is the last durably committed offset — advance the vacuum
    // pin (commit() alone lags one batch; see VtableTableSource)
    if (from > 0L) pinFloor(from)
    val capped = if (net) cur else math.min(cur, from + maxSlices)
    if (capped > from) CdfOffset(capped) else null
  }

  /** One commit's changes: version 1 from a 0-start is the initial
    * snapshot as inserts; every later version is the manifest diff
    * against its predecessor.
    */
  private def slice(fromV: Long, toV: Long): DataFrame = {
    val df =
      if (fromV == 0L) {
        require(toV == 1L, s"graft-vtable-cdf: snapshot slice must end at v1, got $toV")
        VT.read(spark, dir, Some(1L)).withColumn("change_type", lit("insert"))
      } else
        VT.changesBetween(spark, dir, fromV, toV, keys, preimages)
    df.withColumn("_commit_version", lit(toV))
  }

  private def align(df: DataFrame): DataFrame = {
    val extra = df.columns.filterNot(schema.fieldNames.contains)
    if (extra.nonEmpty)
      throw new IllegalStateException(
        s"graft-vtable-cdf: table $dir evolved mid-stream (new columns: " +
          s"${extra.mkString(", ")}) — restart the stream to adopt the wider schema")
    df.select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** MicroBatchExecution requires getBatch's plan to be STREAMING. The
    * diff itself is a FULL OUTER JOIN — returned directly with streaming-
    * flagged leaves it would become a stream-stream join whose outer rows
    * (inserts/deletes) wait forever on a watermark. So, like Delta's CDC,
    * each slice MATERIALIZES to `_cdf/` change files (idempotent: slices
    * are deterministic functions of immutable manifests, cached under a
    * version-window key, published by atomic rename) and the batch plan
    * is a pure streaming-flagged SCAN of those files. Replays and
    * restarts hit the cache. The `_cdf/` tree is a cache: deleting it when
    * no stream is active only costs recomputation.
    */
  private def asStreaming(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed.transform {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if !lr.isStreaming => lr.copy(isStreaming = true)
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          if !lr.isStreaming => lr.copy(isStreaming = true)
    }
    org.apache.spark.sql.GraftShim.dataFrame(spark, plan)
  }

  private def materialize(fromV: Long, toV: Long): String = {
    // the cache key carries EVERY option that shapes the slice's content
    // (two streams with different key sets classify changes differently
    // and must never serve each other's files) — digested, so a wide
    // composite key cannot blow the filesystem's path-component limit
    val shape = (if (preimages) "pre" else "post") + "|" + keys.mkString(",")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(shape.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val key = s"v$fromV-$toV-$digest"
    val dest = new org.apache.hadoop.fs.Path(dir, s"_cdf/$key")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dest, "_SUCCESS"))) {
      val tmp = new org.apache.hadoop.fs.Path(dir,
        s"_cdf/.$key.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      align(slice(fromV, toV)).write.mode("overwrite").parquet(tmp.toString)
      if (!fs.rename(tmp, dest)) fs.delete(tmp, true) // racer landed a full copy
    }
    dest.toString
  }

  /** Vacuum-guard cursor ([[VT.pinCursor]]): a resumable stream (one with
    * a checkpoint) registers the lowest version its next replay needs —
    * the current batch's window start in getBatch, advanced to the
    * committed offset in commit — so a VACUUM that would strand it
    * refuses loudly instead of silently reclaiming its manifests.
    */
  private def pinFloor(v: Long): Unit =
    if (metadataPath.nonEmpty)
      VT.pinCursor(spark, dir, s"graft-vtable-cdf @ $metadataPath",
        math.max(1L, v))

  override def commit(end: V1Offset): Unit = pinFloor(versionOf(end))

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    requireSameTable()
    val from = start.map(versionOf).getOrElse(math.max(0L, startVersion))
    val to = versionOf(end)
    pinFloor(from)
    if (to <= from)
      return org.apache.spark.sql.GraftShim.dataFrame(spark,
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
          org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
          Seq.empty, isStreaming = true))
    val bounds =
      if (net)
        // one NET diff for the whole window (plus the snapshot slice when
        // bootstrapping from 0 — it has no predecessor to diff against)
        (if (from == 0L) Seq((0L, 1L)) else Seq.empty) ++
          (if (to > math.max(from, 1L)) Seq((math.max(from, 1L), to))
           else Seq.empty)
      else (from until to).map(v => (v, v + 1))
    if (bounds.size > maxSlices)
      throw new IllegalStateException(
        s"graft-vtable-cdf: batch spans ${bounds.size} commits (> $maxSlices) " +
          "— set net=true to fold the window into one diff, raise " +
          "maxSlicesPerBatch, or start closer with startingVersion")
    val paths = bounds.map { case (a, b) => materialize(a, b) }
    asStreaming(spark.read.schema(schema).parquet(paths: _*))
  }

  override def stop(): Unit = ()
}
