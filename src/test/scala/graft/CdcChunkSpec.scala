package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Content-defined chunking (Gear CDC): reassembly, bounds, determinism,
  * and the boundary re-alignment property that justifies CDC over
  * fixed-size chunking for re-crawled corpora.
  */
class CdcChunkSpec extends SparkSuite {
  import spark.implicits._

  private val MIN = 64
  private val MASK = 6
  private val MAX = 512

  private lazy val docs = Tables.documents(spark, sf).limit(200).cache()

  test("chunks reassemble to the original text exactly") {
    // collect_list has no ordering guarantee — sort (idx, chunk) pairs first
    val re = TextOps.cdcChunks(docs, "doc_id", "text", MIN, MASK, MAX)
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
        p => p.getField("chunk")), "").as("reassembled"))
    val mismatches = docs.join(re, "doc_id")
      .filter(col("reassembled") =!= col("text")).count()
    assert(mismatches == 0L, "every document must reassemble from its chunks")
  }

  test("chunk lengths respect [min, max]; only a document's last chunk may run short") {
    val chunks = TextOps.cdcChunks(docs, "doc_id", "text", MIN, MASK, MAX)
    assert(chunks.filter(col("chunk_len") > MAX).count() == 0L)
    val maxIdx = chunks.groupBy("doc_id").agg(max("chunk_idx").as("last_idx"))
    val shortNonLast = chunks.join(maxIdx, "doc_id")
      .filter(col("chunk_idx") =!= col("last_idx") && col("chunk_len") < MIN)
      .count()
    assert(shortNonLast == 0L, "non-final chunks must be at least minSize")
  }

  test("boundaries are deterministic and partitioning-independent") {
    val a = TextOps.cdcChunks(docs, "doc_id", "text", MIN, MASK, MAX)
      .orderBy("doc_id", "chunk_idx").collect().map(_.toSeq).toSeq
    val b = TextOps.cdcChunks(docs.repartition(7), "doc_id", "text", MIN, MASK, MAX)
      .orderBy("doc_id", "chunk_idx").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("an early insertion re-aligns later boundaries; fixed-size chunking does not") {
    // deterministic pseudo-text long enough for ~30 chunks
    val rnd = new scala.util.Random(42)
    val base = (1 to 4000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = "INSERTED-BYTES!" + base
    def fps(text: String): Seq[Long] =
      TextOps.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
          "doc_id", "text", MIN, MASK, MAX)
        .select("chunk_fp").as[Long].collect().toSeq
    val origFps = fps(base)
    val editedFps = fps(edited)
    assert(origFps.size >= 15, s"want a many-chunk document, got ${origFps.size}")
    // all but the first few chunks must re-align and fingerprint identically
    val common = origFps.toSet.intersect(editedFps.toSet).size
    assert(common >= origFps.size - 3,
      s"CDC must re-align after the edit: only $common of ${origFps.size} chunks survived")
    // negative control: fixed-size windows all shift, (almost) nothing dedups
    def fixedFps(text: String): Set[Long] =
      text.grouped(128).map(c => c.foldLeft(0L)((h, ch) => (h * 31 + ch) % 1000000007L)).toSet
    val fixedCommon = fixedFps(base).intersect(fixedFps(edited)).size
    assert(fixedCommon <= 2,
      s"precondition: fixed-size chunking should NOT survive the edit, got $fixedCommon")
  }

  test("a NULL-text document survives as one explicit empty-chunk row") {
    val df = Seq((1L, Some("some normal document text here")), (2L, None))
      .toDF("doc_id", "text")
    val chunks = TextOps.cdcChunks(df, "doc_id", "text", MIN, MASK, MAX)
    assert(chunks.select("doc_id").distinct().count() == 2,
      "null text must not silently drop the document")
    val nullRow = chunks.filter(col("doc_id") === 2L).collect()
    assert(nullRow.length == 1 && nullRow(0).getAs[Int]("chunk_len") == 0)
  }

  test("q_chunk_cdc: registered query is deterministic with dedup-ready shape") {
    val q = SparkEntry.queries("q_chunk_cdc")(spark, sf)
    assert(q.columns.toSeq == Seq("doc_id", "chunk_idx", "chunk_len", "chunk_fp"))
    assert(q.count() > 0)
  }
}
