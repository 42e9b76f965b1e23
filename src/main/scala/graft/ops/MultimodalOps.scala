package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.7 north-star): media as opaque
  * `binary` columns with typed metadata, decode/feature-extract as
  * partition-wise batch functions.
  *
  * Image payloads decode FOR REAL through `javax.imageio` (ships in the
  * JDK): true width/height plus a luminance-histogram feature vector, with
  * corrupt bytes degrading gracefully to sentinel dimensions. Non-image
  * media (no audio/video codec ships in this container) still goes through
  * the deterministic [[StubCodec]] — swap it for ffmpeg-style decoders in
  * production; the Spark-side contract (schema, partitioning, batch shape)
  * is identical either way.
  */
object MultimodalOps {

  // Disable ImageIO's default DISK cache at object init, not just inside
  // ImageCodec: the WRITE paths (pngFor/mjpegFor via ImageIO.write) run
  // before any decode loads ImageCodec, and with the default cache every
  // written image stages through a created-then-deleted temp FILE — at
  // 500k rows that is 500k file creations of pure overhead (measured as
  // the dominant super-linear term in the decode query's sf10 profile).
  // Payloads here are in-heap byte arrays; the memory cache is strictly
  // right for both directions.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Real image decoder over the JDK's `javax.imageio` — no external
    * libraries. Returns TRUE pixel dimensions and an 8-bin luminance
    * histogram (L1-normalized) as the feature vector. Bytes that fail to
    * decode (truncated file, wrong magic, not an image at all) degrade
    * gracefully to `width = height = -1` with the byte-histogram features
    * of [[StubCodec]] — the row survives, flagged, instead of failing the
    * task; a downstream `width > 0` filter is the quality gate.
    */
  object ImageCodec {
    // decode from memory, not via ImageIO's default temp-file cache — the
    // payload is already an in-heap byte array
    javax.imageio.ImageIO.setUseCache(false)

    def decode(r: MediaRecord): DecodedMedia = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
        catch { case _: Exception => null }
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) {
        val stub = StubCodec.decode(r)
        stub.copy(width = -1, height = -1)
      } else {
        val (w, h) = (img.getWidth, img.getHeight)
        val hist = new Array[Float](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            hist(luma >> 5) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        DecodedMedia(r.doc_id, r.media_type, r.content.length, w, h, hist.map(_ / n))
      }
    }
  }

  /** Deterministic PNG synthesis — the test/bench image corpus. Dimensions
    * derive from the id (`8 + id % 16` × `8 + (id/16) % 16`), pixels from a
    * 64-bit mix of (id, x, y), so a decoder's output is predictable without
    * shipping binary fixtures. The JDK PNG writer is deterministic for a
    * given raster.
    */
  def pngFor(id: Long): Array[Byte] = {
    val w = 8 + (id % 16).toInt
    val h = 8 + ((id / 16) % 16).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var z = id * 0x9E3779B97F4A7C15L + x * 0xC2B2AE3D27D4EB4FL + y * 0x165667B19E3779F9L
        z ^= z >>> 29; z *= 0xBF58476D1CE4E5B9L; z ^= z >>> 32
        img.setRGB(x, y, (z & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** id column → deterministic PNG media rows (the image-corpus builder
    * used by the decode query and specs). Partition-wise, no shuffle.
    */
  def synthesizeImages(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map(id => MediaRecord(id, "image/png", pngFor(id)))
  }

  /** Real audio decoder over the JDK's `javax.sound.sampled` — no external
    * libraries, same move as [[ImageCodec]]. Decodes WAV (PCM) payloads:
    * `width` carries the sample rate in Hz, `height` the frame count (the
    * generic dims slots, documented mapping), and the feature vector is an
    * 8-segment RMS amplitude profile in [0, 1] — the audio analog of the
    * image luminance histogram. Non-PCM encodings and bytes that fail to
    * parse degrade to `width = height = -1` with [[StubCodec]] features,
    * same contract as corrupt images.
    */
  /** The JDK's own audio file codecs, obtained ONCE through the public
    * `ServiceLoader` SPI and cached. `AudioSystem`'s static entry points
    * route EVERY call through a synchronized, time-expiring provider
    * registry (`JDK13Services.getProviders` — a global lock plus a
    * re-instantiated ServiceLoader on expiry), and at 32 decode threads
    * that lock convoys: measured 11.8× wall for 10× rows on the WAV
    * chain while the PNG/MJPEG chains stayed linear. Same codec objects
    * (java.desktop's module-declared providers), same bytes — just no
    * shared lock on the per-row path. Provider instances are stateless
    * parsers, safe to share across threads (the JDK registry shares its
    * cached instances the same way).
    */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
  }
  private lazy val audioWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.toSeq
  }

  /** Registry-free `AudioSystem.getAudioInputStream`: try each cached
    * provider on a fresh stream (the static API's mark/reset dance,
    * without its lock). The provider that last succeeded is remembered
    * and tried FIRST: a homogeneous corpus otherwise pays one thrown
    * `UnsupportedAudioFileException` (stack-trace fill and all) per
    * non-matching provider per ROW.
    */
  @volatile private var preferredAudioReader
      : javax.sound.sampled.spi.AudioFileReader = null
  private def readAudioStream(bytes: Array[Byte])
      : javax.sound.sampled.AudioInputStream = {
    val pref = preferredAudioReader
    if (pref != null)
      try return pref.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
    val it = audioReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      if (r ne pref)
        try {
          val ais = r.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          preferredAudioReader = r
          return ais
        } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no installed provider recognizes the payload")
  }

  /** Registry-free `AudioSystem.write(…, WAVE, …)`. */
  private def writeWave(ais: javax.sound.sampled.AudioInputStream,
                        out: java.io.OutputStream): Unit = {
    val t = javax.sound.sampled.AudioFileFormat.Type.WAVE
    audioWriters.find(_.isFileTypeSupported(t, ais)).getOrElse(
      throw new IllegalStateException("no installed WAVE writer"))
      .write(ais, t, out)
  }

  object AudioCodec {
    def decode(r: MediaRecord): DecodedMedia = {
      try {
        val ais = readAudioStream(r.content)
        val fmt = ais.getFormat
        val ok = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian
        if (!ok) throw new javax.sound.sampled.UnsupportedAudioFileException(
          s"unsupported encoding ${fmt.getEncoding}")
        val data = ais.readAllBytes()
        val nSamples = data.length / 2
        if (nSamples <= 0) throw new javax.sound.sampled.UnsupportedAudioFileException("empty")
        // 8-segment RMS profile over the 16-bit little-endian samples
        val sumSq = new Array[Double](8)
        val cnt = new Array[Long](8)
        var i = 0
        while (i < nSamples) {
          val s = ((data(2 * i) & 0xFF) | (data(2 * i + 1) << 8)).toShort
          // i.toLong: `i * 8` wraps Int past ~268M samples (~537 MB PCM),
          // which would index negative and flag a valid WAV as corrupt
          val seg = math.min(7, (i.toLong * 8 / nSamples).toInt)
          sumSq(seg) += s.toDouble * s; cnt(seg) += 1
          i += 1
        }
        val rms = Array.tabulate(8)(seg =>
          if (cnt(seg) == 0) 0f
          else (math.sqrt(sumSq(seg) / cnt(seg)) / 32768.0).toFloat)
        val frames = (nSamples / fmt.getChannels).toInt
        DecodedMedia(r.doc_id, r.media_type, r.content.length,
          fmt.getSampleRate.toInt, frames, rms)
      } catch {
        case _: Exception =>
          StubCodec.decode(r).copy(width = -1, height = -1)
      }
    }
  }

  /** Deterministic WAV synthesis — the test/bench audio corpus, the audio
    * analog of [[pngFor]]: 16-bit PCM mono at 8 kHz, a sine whose length,
    * frequency, and amplitude derive from the id, so a decoder's output is
    * predictable without shipping binary fixtures.
    */
  def wavFor(id: Long): Array[Byte] = {
    val rate = 8000f
    val n = 512 + (id % 512).toInt
    val freq = 100.0 + (id % 40) * 25.0
    val amp = 0.2 + (id % 7) * 0.1
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * amp * 32767).toInt.toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    writeWave(ais, out) // registry-free: see audioWriters
    out.toByteArray
  }

  /** id column → deterministic WAV media rows (audio-corpus builder).
    * Partition-wise, no shuffle — same shape as [[synthesizeImages]].
    */
  def synthesizeAudio(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map(id => MediaRecord(id, "audio/wav", wavFor(id)))
  }

  /** Real video decoder for Motion-JPEG — the one video format the JDK can
    * decode (an MJPEG stream is concatenated baseline JPEG frames; webcams
    * and AVI/MJPEG use it). Frames split on the JPEG SOI/EOI markers
    * (`FFD8`…`FFD9` — safe here because baseline JPEG escapes `FF` inside
    * entropy-coded data and our frames embed no thumbnails) and decode
    * individually through `javax.imageio`. `width`/`height` are the first
    * frame's true dimensions; feature slot `i` is frame `i`'s mean
    * luminance in [0, 1] for the first 8 frames, `-1` padding past the
    * last frame — so the frame count is `features.count(_ >= 0)`.
    * Undecodable bytes degrade to the −1×−1 sentinel like the other
    * codecs. Inter-frame codecs (H.264 etc.) have no in-JDK decoder and
    * stay behind [[StubCodec]].
    */
  object VideoCodec {
    def decode(r: MediaRecord): DecodedMedia = {
      try {
        val bytes = r.content
        val feats = Array.fill(8)(-1f)
        var w = -1
        var h = -1
        var frame = 0
        var i = 0
        while (i + 1 < bytes.length && frame < 8) {
          if (bytes(i) == 0xFF.toByte && bytes(i + 1) == 0xD8.toByte) {
            var j = i + 2
            while (j + 1 < bytes.length &&
              !(bytes(j) == 0xFF.toByte && bytes(j + 1) == 0xD9.toByte)) j += 1
            if (j + 1 >= bytes.length)
              throw new java.io.IOException("unterminated MJPEG frame")
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes, i, j + 2 - i))
            if (img == null) throw new java.io.IOException("undecodable frame")
            if (frame == 0) { w = img.getWidth; h = img.getHeight }
            var lum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                lum += (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
                  (rgb & 0xFF) * 114) / 1000
                x += 1
              }
              y += 1
            }
            feats(frame) = (lum.toDouble / (img.getWidth.toLong * img.getHeight) / 255.0).toFloat
            frame += 1
            i = j + 2
          } else i += 1
        }
        if (frame == 0) throw new java.io.IOException("no JPEG frames")
        DecodedMedia(r.doc_id, r.media_type, bytes.length, w, h, feats)
      } catch {
        case _: Exception =>
          StubCodec.decode(r).copy(width = -1, height = -1)
      }
    }
  }

  /** Deterministic MJPEG synthesis — the video-corpus builder: `3 + id%4`
    * constant-gray JPEG frames (constant rasters survive JPEG's lossy
    * round-trip within ~1 gray level, keeping decode assertions tight),
    * dimensions and per-frame gray level derived from the id.
    */
  def mjpegFor(id: Long): Array[Byte] = {
    val w = 16 + (id % 8).toInt
    val h = 16 + ((id / 8) % 8).toInt
    val frames = 3 + (id % 4).toInt
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < frames) {
      val g = ((id * 31 + f * 97) % 256).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      javax.imageio.ImageIO.write(img, "jpg", out)
      f += 1
    }
    out.toByteArray
  }

  /** id column → deterministic MJPEG media rows (video-corpus builder). */
  def synthesizeVideo(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map(id => MediaRecord(id, "video/x-motion-jpeg", mjpegFor(id)))
  }

  /** STUB: deterministic fake decoder for media types with no in-JDK codec
    * (inter-frame video — H.264/VP9/AV1; images, audio, and MJPEG decode
    * for real). Derives stable pseudo-dimensions and a byte-statistics
    * feature vector so the distributed plumbing (schema, batching,
    * partition boundaries) is fully exercised and testable.
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
    * Dispatches on media_type: images through the real [[ImageCodec]],
    * audio through the real [[AudioCodec]], MJPEG video through the real
    * [[VideoCodec]]; only inter-frame video codecs fall back to
    * [[StubCodec]].
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      if (r.media_type != null && r.media_type.startsWith("image/")) ImageCodec.decode(r)
      else if (r.media_type != null && r.media_type.startsWith("audio/")) AudioCodec.decode(r)
      else if (r.media_type == "video/x-motion-jpeg") VideoCodec.decode(r)
      else StubCodec.decode(r)
    })
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
