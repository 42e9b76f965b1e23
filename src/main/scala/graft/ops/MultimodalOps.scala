package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.7 north-star): media as opaque
  * `binary` columns with typed metadata, decode/feature-extract as
  * partition-wise batch functions.
  *
  * The Spark-side contract (schema, partitioning, batch shape) is real and
  * tested; the actual codec call is STUBBED with a deterministic fake
  * because no image/audio libraries ship in this container — swap
  * [[StubCodec.decode]] for a real decoder (e.g. javax.imageio / ffmpeg via
  * mapPartitions, or a Pandas UDF under PySpark) in production.
  */
object MultimodalOps {

  /** A media row: opaque payload + metadata, the storage shape for
    * image/audio/video at 100 TB (payload in parquet binary or referenced
    * object-store URI; metadata columnar for pruning).
    */
  case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])

  case class DecodedMedia(doc_id: Long, media_type: String, n_bytes: Int,
                          width: Int, height: Int, features: Array[Float])

  /** Pack a text column into a binary payload column with metadata —
    * stands in for reading real media bytes; plumbing is format-agnostic.
    */
  def attachBinary(df: DataFrame, textCol: String, mediaType: String): DataFrame =
    df.withColumn("media_type", lit(mediaType))
      .withColumn("content", encode(col(textCol), "UTF-8"))
      .withColumn("n_bytes", length(col("content")))
      .withColumn("content_sha", sha2(col(textCol), 256))

  /** STUB: deterministic fake decoder. A real implementation would hand the
    * byte buffer to a codec; this derives stable pseudo-dimensions and a
    * byte-statistics feature vector so the distributed plumbing (schema,
    * batching, partition boundaries) is fully exercised and testable.
    */
  object StubCodec {
    def decode(r: MediaRecord): DecodedMedia = {
      val bytes = r.content
      val h = java.util.Arrays.hashCode(bytes)
      // fake dims in [64, 1088) — replace with real codec output
      val width = 64 + math.abs(h % 1024)
      val height = 64 + math.abs((h / 1024) % 1024)
      // feature = 8-bin byte histogram, L1-normalized
      val hist = new Array[Float](8)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 5) += 1f; i += 1 }
      val n = math.max(bytes.length, 1).toFloat
      DecodedMedia(r.doc_id, r.media_type, bytes.length, width, height,
        hist.map(_ / n))
    }
  }

  /** Partition-wise decode: the Scala analogue of `mapInPandas` — each task
    * streams its partition through the codec without collecting to the
    * driver. Narrow op: no shuffle, parallelism = input partitions.
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(StubCodec.decode))
  }

  /** Frame-sampling shape for video-like payloads: split the payload into
    * fixed-size "frames" and keep every `stride`-th — pure expressions, the
    * partitioning/explode pattern a real frame sampler would use.
    */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    // `/` on Columns is DOUBLE division — floor+cast keeps sequence() in
    // integral types.
    val lastFrame = greatest(
      floor((length(col("content")) - 1) / frameBytes).cast("int"), lit(0))
    df.select(col("*"),
        posexplode(transform(
          sequence(lit(0), lastFrame),
          i => col("content").substr((i * frameBytes + 1).cast("int"), lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0)
  }
}
