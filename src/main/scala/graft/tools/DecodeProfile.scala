package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps
import graft.Tables

/** Decomposition probe for `q_multimodal_decode`'s scaling factor: times
  * the query's stages separately at one SF so the super-linear component
  * (r16 verdict watch item: sf1→sf10 11.8× for 10× rows) can be pinned to
  * synthesis, a specific codec, the final global sort, or none of the
  * engine's own code.
  *
  *   SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.DecodeProfile"
  */
object DecodeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    if (args.contains("--no-cache")) {
      javax.imageio.ImageIO.setUseCache(false)
      println("[decodeprof] ImageIO disk cache DISABLED up front")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(body: => Long): Unit = {
      // rep 0 warms code paths; reps 1-2 are the numbers
      (0 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[decodeprof] $tag%-24s rep$i $dt%8.3f s  (n=$n)")
      }
    }

    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val png = () => MultimodalOps.synthesizeImages(
      docs.filter(col("doc_id") % 3 === 0), "doc_id")
    val wav = () => MultimodalOps.synthesizeAudio(
      docs.filter(col("doc_id") % 3 === 1), "doc_id")
    val mjp = () => MultimodalOps.synthesizeVideo(
      docs.filter(col("doc_id") % 3 === 2), "doc_id")

    def lenOf(ds: org.apache.spark.sql.Dataset[MultimodalOps.MediaRecord]): Long =
      ds.map(_.content.length.toLong)(org.apache.spark.sql.Encoders.scalaLong)
        .toDF("n").agg(sum("n")).head().getLong(0)
    time("synth_png")(lenOf(png()))
    time("synth_wav")(lenOf(wav()))
    time("synth_mjpeg")(lenOf(mjp()))
    time("decode_png")(MultimodalOps.decodeFeatures(png()).toDF().count())
    time("decode_wav")(MultimodalOps.decodeFeatures(wav()).toDF().count())
    time("decode_mjpeg")(MultimodalOps.decodeFeatures(mjp()).toDF().count())
    // decode in ISOLATION: input pinned, so the stage timed is the codec
    val pinnedWav = wav().localCheckpoint()
    time("decode_wav_pinned")(MultimodalOps.decodeFeatures(pinnedWav).toDF().count())
    time("full_no_sort")(MultimodalOps.decodeFeatures(
      png().union(wav()).union(mjp())).toDF().count())
    time("full_query")(
      graft.SparkEntry.queries("q_multimodal_decode")(spark, sfDir).count())
    spark.stop()
  }
}
