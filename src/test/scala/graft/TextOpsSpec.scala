package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("tokens splits on whitespace runs and drops empties") {
    val out = Seq("a  b\tc ", "", "  ").toDF("t")
      .select(TextOps.tokens($"t").as("toks")).collect()
    assert(out(0).getSeq[String](0) == Seq("a", "b", "c"))
    assert(out(1).getSeq[String](0).isEmpty)
    assert(out(2).getSeq[String](0).isEmpty)
  }

  test("fingerprint is the polynomial rolling hash mod 1e9+7") {
    val got = Seq("abc").toDF("t")
      .select(TextOps.fingerprint($"t").as("fp")).collect().head.getLong(0)
    val want = "abc".foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    assert(got == want)
  }

  test("langId picks the language with most stopword hits, priority on ties") {
    val df = Seq(
      "the cat sat on the mat and it is that",
      "el perro y la casa de los que se en un",
      "der hund und die katze von den im ein",
      "xyzzy plugh").toDF("t").select(TextOps.langId($"t").as("l"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "es", "de", "und"))
  }

  test("quality signals are exact on a known doc") {
    val row = Seq("the the cat").toDF("t").select(
      TextOps.tokenCount($"t").as("n"),
      TextOps.stopwordCount($"t").as("sw"),
      TextOps.uniqueTokenRatio($"t").as("uq")).collect().head
    assert(row.getLong(0) == 3 && row.getLong(1) == 2)
    assert(math.abs(row.getDouble(2) - 2.0 / 3.0) < 1e-15)
  }

  test("native wordNgrams equals the HOF transform/slice/array_join plan") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      "a b c d e", "one", "", "  leading and   multiple\tspaces \n newline",
      "dup dup dup dup", "exactly three toks", "unicode héllo wörld ünits x"
    ).toDF("t")
    for (n <- Seq(1, 2, 3, 4)) {
      val tok = TextOps.tokens($"t")
      val hof = when(size(tok) >= n,
        transform(sequence(lit(1), size(tok) - lit(n - 1)),
          i => array_join(slice(tok, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
      val rows = docs.select(TextOps.ngrams($"t", n).as("fast"), hof.as("slow"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n: ${r.getSeq[String](0)} != ${r.getSeq[String](1)}")
      }
    }
  }

  test("wordNgrams on null text yields an empty array (legacy when-form behavior)") {
    import org.apache.spark.sql.functions._
    val r = Seq((1, null: String)).toDF("i", "t")
      .select(TextOps.ngrams($"t", 2).as("g")).collect().head
    assert(r.getSeq[String](0) == Seq.empty[String])
  }
}
