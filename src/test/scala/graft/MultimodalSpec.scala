package graft

import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaRecord

/** Multimodal-column plumbing (SURVEY §2.7 north-star): binary payloads
  * with typed metadata, partition-wise stub decode, frame sampling. The
  * codec is a deterministic fake; what's under test is the distributed
  * shape — schema, narrow-op partitioning, batch boundaries.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf).limit(200).cache()

  test("attachBinary: payload bytes + stable sha + typed metadata") {
    val m = MultimodalOps.attachBinary(docs, "text", "text/plain")
    assert(m.schema("content").dataType.typeName == "binary")
    val row = m.select("n_bytes", "content", "content_sha").head()
    assert(row.getInt(0) == row.getAs[Array[Byte]](1).length)
    // sha is deterministic: recompute matches
    val again = MultimodalOps.attachBinary(docs, "text", "text/plain")
      .select("content_sha").head().getString(0)
    assert(row.getString(2) == again)
  }

  test("decodeFeatures: narrow op — partition count preserved, no shuffle") {
    val media = MultimodalOps.attachBinary(docs, "text", "text/plain")
      .select($"doc_id", $"media_type", $"content").as[MediaRecord]
      .repartition(7)
    val decoded = MultimodalOps.decodeFeatures(media)
    assert(decoded.rdd.getNumPartitions == 7, "mapPartitions must not reshuffle")
    assert(decoded.count() == 200)
  }

  test("decodeFeatures: deterministic features, n_bytes faithful, L1-normalized") {
    val media = MultimodalOps.attachBinary(docs, "text", "text/plain")
      .select($"doc_id", $"media_type", $"content").as[MediaRecord]
    val d1 = MultimodalOps.decodeFeatures(media).collect().sortBy(_.doc_id)
    val d2 = MultimodalOps.decodeFeatures(media).collect().sortBy(_.doc_id)
    assert(d1.map(_.features.toSeq).toSeq == d2.map(_.features.toSeq).toSeq)
    d1.foreach { r =>
      assert(r.features.length == 8)
      assert(math.abs(r.features.sum - 1.0f) < 1e-3, "histogram must be L1-normalized")
      assert(r.width >= 64 && r.height >= 64)
    }
    val nb = MultimodalOps.attachBinary(docs, "text", "text/plain")
      .select($"doc_id", length($"content").as("n")).as[(Long, Int)].collect().toMap
    d1.foreach(r => assert(r.n_bytes == nb(r.doc_id)))
  }

  test("sampleFrames: full cover at stride 1, every stride-th frame kept") {
    val m = MultimodalOps.attachBinary(docs.limit(20), "text", "text/plain")
    val all = MultimodalOps.sampleFrames(m, frameBytes = 16, stride = 1)
    val reassembled = all
      .groupBy("doc_id")
      .agg(sum(length(col("frame"))).as("total"), max(col("n_bytes")).as("nb"))
      .filter(col("total") =!= col("nb"))
    assert(reassembled.isEmpty, "stride-1 frames must cover the payload exactly")
    val strided = MultimodalOps.sampleFrames(m, frameBytes = 16, stride = 4)
      .select("frame_idx").distinct().as[Int].collect()
    assert(strided.forall(_ % 4 == 0))
  }
}
