package graft

import graft.functions.GraftFunctions

/** The SQL surface: every native kernel callable by name from spark.sql
  * after registration, equal to its Column-API twin.
  */
class SqlSurfaceSpec extends SparkSuite {

  test("registered graft functions evaluate from pure SQL") {
    GraftFunctions.register(spark)
    Tables.documents(spark, sf).limit(50).createOrReplaceTempView("docs_sql")
    Tables.embeddings(spark, sf).limit(50).createOrReplaceTempView("emb_sql")

    val jac = spark.sql(
      """SELECT a.doc_id, b.doc_id,
        |  graft_jaccard(graft_shingles(a.text, 3), graft_shingles(b.text, 3)) AS j,
        |  graft_jaccard_ge(graft_shingles_sorted(a.text, 3),
        |                   graft_shingles_sorted(b.text, 3), 0.0) AS j2
        |FROM docs_sql a JOIN docs_sql b ON a.doc_id < b.doc_id""".stripMargin)
      .collect()
    jac.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-15,
        "SQL jaccard variants must agree")
    }

    val cos = spark.sql(
      """SELECT graft_dot(embedding, embedding) /
        |       (sqrt(graft_normsq(embedding)) * sqrt(graft_normsq(embedding))) AS c
        |FROM emb_sql""".stripMargin).collect()
    cos.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))

    val mh = spark.sql(
      """SELECT graft_sig_eq_frac(graft_minhash(graft_shingles(text, 3), 64),
        |                         graft_minhash(graft_shingles(text, 3), 64)) AS e,
        |       graft_simhash(split(text, '\\s+')) AS sh,
        |       size(graft_rhp_buckets(embedding, 4, 8)) AS nb
        |FROM docs_sql JOIN emb_sql ON doc_id = vec_id""".stripMargin).collect()
    assert(mh.nonEmpty)
    mh.foreach { r =>
      assert(r.getDouble(0) == 1.0, "identical minhash signatures")
      assert(r.getInt(2) == 8, "one bucket per hash table")
    }
  }
}
