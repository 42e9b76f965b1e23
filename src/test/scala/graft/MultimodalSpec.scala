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

  test("ImageCodec: decoded dimensions equal the synthesized PNG's true dimensions") {
    val media = MultimodalOps.synthesizeImages(docs, "doc_id").repartition(5)
    val decoded = MultimodalOps.decodeFeatures(media).collect()
    assert(decoded.length == 200)
    decoded.foreach { r =>
      val (w, h) = (8 + (r.doc_id % 16).toInt, 8 + ((r.doc_id / 16) % 16).toInt)
      assert(r.width == w && r.height == h,
        s"doc ${r.doc_id}: decoded ${r.width}x${r.height}, synthesized ${w}x$h")
      assert(math.abs(r.features.sum - 1.0f) < 1e-3,
        "luminance histogram must be L1-normalized")
      assert(r.n_bytes > 0)
    }
  }

  test("ImageCodec: corrupt and truncated image bytes degrade gracefully") {
    import spark.implicits._
    val goodPng = MultimodalOps.pngFor(7L)
    val rows = Seq(
      MediaRecord(1L, "image/png", goodPng),
      MediaRecord(2L, "image/png", Array[Byte](1, 2, 3, 4)), // wrong magic
      MediaRecord(3L, "image/png", goodPng.take(20)), // truncated header
      MediaRecord(4L, "image/png", Array.empty[Byte]),
      MediaRecord(5L, "video/mp4", Array[Byte](82, 73, 70, 70)) // stub path
    ).toDS()
    val out = MultimodalOps.decodeFeatures(rows).collect().sortBy(_.doc_id)
    assert(out.length == 5, "corrupt rows must survive, not kill the task")
    assert(out(0).width == 15 && out(0).height == 8) // 8 + 7%16, 8 + 0
    for (r <- out.slice(1, 4))
      assert(r.width == -1 && r.height == -1, s"doc ${r.doc_id} should flag undecodable")
    assert(out(4).width >= 64, "video media keeps the stub codec contract")
  }

  test("AudioCodec: decoded rate/frames/RMS match the synthesized WAV") {
    val media = MultimodalOps.synthesizeAudio(docs, "doc_id").repartition(5)
    val decoded = MultimodalOps.decodeFeatures(media).collect()
    assert(decoded.length == 200)
    decoded.foreach { r =>
      assert(r.width == 8000, s"doc ${r.doc_id}: sample rate ${r.width} != 8000")
      val frames = 512 + (r.doc_id % 512).toInt
      assert(r.height == frames,
        s"doc ${r.doc_id}: decoded ${r.height} frames, synthesized $frames")
      // a constant-amplitude sine's RMS is amp/sqrt(2); each of the 8
      // segments spans many cycles, so every segment should sit near it
      val amp = 0.2 + (r.doc_id % 7) * 0.1
      val want = (amp / math.sqrt(2)).toFloat
      r.features.foreach { seg =>
        assert(math.abs(seg - want) < 0.06f,
          s"doc ${r.doc_id}: segment RMS $seg far from sine RMS $want")
      }
    }
  }

  test("AudioCodec: corrupt and truncated audio bytes degrade gracefully") {
    val goodWav = MultimodalOps.wavFor(11L)
    val rows = Seq(
      MediaRecord(1L, "audio/wav", goodWav),
      MediaRecord(2L, "audio/wav", Array[Byte](82, 73, 70, 70)), // bare RIFF magic
      MediaRecord(3L, "audio/wav", goodWav.take(30)), // truncated header
      MediaRecord(4L, "audio/wav", Array.empty[Byte])
    ).toDS()
    val out = MultimodalOps.decodeFeatures(rows).collect().sortBy(_.doc_id)
    assert(out.length == 4, "corrupt rows must survive, not kill the task")
    assert(out(0).width == 8000 && out(0).height == 512 + 11)
    for (r <- out.drop(1))
      assert(r.width == -1 && r.height == -1, s"doc ${r.doc_id} should flag undecodable")
  }

  test("VideoCodec: frame count, dims, and per-frame luminance match the synthesized MJPEG") {
    val media = MultimodalOps.synthesizeVideo(docs, "doc_id").repartition(5)
    val decoded = MultimodalOps.decodeFeatures(media).collect()
    assert(decoded.length == 200)
    decoded.foreach { r =>
      val (w, h) = (16 + (r.doc_id % 8).toInt, 16 + ((r.doc_id / 8) % 8).toInt)
      assert(r.width == w && r.height == h,
        s"doc ${r.doc_id}: decoded ${r.width}x${r.height}, synthesized ${w}x$h")
      val frames = 3 + (r.doc_id % 4).toInt
      assert(r.features.count(_ >= 0f) == frames,
        s"doc ${r.doc_id}: expected $frames decoded frames")
      // constant-gray frames survive JPEG within ~1 gray level
      for (f <- 0 until frames) {
        val want = ((r.doc_id * 31 + f * 97) % 256) / 255.0f
        assert(math.abs(r.features(f) - want) < 0.02f,
          s"doc ${r.doc_id} frame $f: luminance ${r.features(f)} far from $want")
      }
    }
  }

  test("VideoCodec: corrupt and truncated MJPEG bytes degrade gracefully") {
    val good = MultimodalOps.mjpegFor(5L)
    val rows = Seq(
      MediaRecord(1L, "video/x-motion-jpeg", good),
      MediaRecord(2L, "video/x-motion-jpeg", Array[Byte](0, 1, 2, 3)), // no SOI
      MediaRecord(3L, "video/x-motion-jpeg", good.dropRight(4)), // truncated last frame
      MediaRecord(4L, "video/x-motion-jpeg", Array.empty[Byte])
    ).toDS()
    val out = MultimodalOps.decodeFeatures(rows).collect().sortBy(_.doc_id)
    assert(out.length == 4)
    assert(out(0).width == 21 && out(0).height == 16) // 16 + 5%8, 16 + 0
    for (r <- out.drop(1))
      assert(r.width == -1 && r.height == -1, s"doc ${r.doc_id} should flag undecodable")
  }

  test("q_multimodal_decode: registered query returns real dims for every doc") {
    val q = SparkEntry.queries("q_multimodal_decode")(spark, sf)
    // ids ≡0 mod 3 are PNGs, ≡1 WAVs, ≡2 MJPEG videos
    val badImg = q.filter(col("doc_id") % 3 === 0)
      .filter(col("width") < 8 || col("height") < 8 ||
        col("width") =!= (lit(8) + col("doc_id") % 16)).count()
    assert(badImg == 0L, "every synthesized PNG must decode to its true dimensions")
    val badAud = q.filter(col("doc_id") % 3 === 1)
      .filter(col("width") =!= 8000 ||
        col("height") =!= (lit(512) + col("doc_id") % 512)).count()
    assert(badAud == 0L, "every synthesized WAV must decode to its true rate/frames")
    // `/` on Columns is double division — floor-div for the height derivation
    val badVid = q.filter(col("doc_id") % 3 === 2)
      .filter(col("width") =!= (lit(16) + col("doc_id") % 8) ||
        col("height") =!= (lit(16) + floor(col("doc_id") / 8).cast("long") % 8)).count()
    assert(badVid == 0L, "every synthesized MJPEG must decode to its true frame dims")
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
