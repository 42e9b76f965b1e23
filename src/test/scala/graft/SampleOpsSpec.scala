package graft

import org.apache.spark.sql.functions._

import graft.ops.SampleOps

class SampleOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf).cache()

  test("hashSplit: disjoint, complete, ~80/20, stable under repartition") {
    val (train, test) = SampleOps.hashSplit(docs, $"doc_id", 80)
    val n = docs.count()
    assert(train.count() + test.count() == n)
    assert(train.join(test, "doc_id").isEmpty, "sides must be disjoint")
    val frac = train.count().toDouble / n
    assert(frac > 0.7 && frac < 0.9, s"got $frac")
    // the SAME rows land on the same side after an arbitrary reshuffle
    val (train2, _) = SampleOps.hashSplit(docs.repartition(13), $"doc_id", 80)
    assert(train2.select("doc_id").exceptAll(train.select("doc_id")).isEmpty)
    assert(train.select("doc_id").exceptAll(train2.select("doc_id")).isEmpty)
  }

  test("stratifiedSample: keep-fraction threshold rounds, not truncates") {
    // 0.29*1000 = 289.99999999999997 in doubles: toInt would keep buckets
    // [0,289) and persistently under-sample; round keeps [0,290).
    val ids = (0L until 4000L).toDF("id")
      .withColumn("lang", lit("s"))
      .withColumn("bucket", pmod(xxhash64($"id"), lit(1000)))
    val boundary = ids.filter($"bucket" === 289)
    assert(boundary.count() > 0, "fixture needs ids hashing to bucket 289")
    val kept = SampleOps.stratifiedSample(ids, $"id", $"lang",
      Map("s" -> 0.29), buckets = 1000)
    assert(kept.filter($"bucket" === 289).count() == boundary.count(),
      "bucket 289 is inside a rounded 0.29 threshold (290)")
    assert(kept.filter($"bucket" >= 290).count() == 0)
  }

  test("stratifiedSample: per-stratum fractions honored, deterministic") {
    val fr = Map("en" -> 0.5, "es" -> 0.1)
    val sampled = SampleOps.stratifiedSample(docs, $"doc_id", $"lang", fr).cache()
    val byLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.keySet.subsetOf(fr.keySet), "unlisted strata must drop")
    fr.foreach { case (lang, f) =>
      if (totals.getOrElse(lang, 0L) > 100) {
        val got = byLang.getOrElse(lang, 0L).toDouble / totals(lang)
        assert(math.abs(got - f) < 0.15, s"$lang: kept $got, wanted ~$f")
      }
    }
    val again = SampleOps.stratifiedSample(docs, $"doc_id", $"lang", fr)
    assert(again.exceptAll(sampled).isEmpty && sampled.exceptAll(again).isEmpty)
  }

  test("weightedSample: membership is layout-stable and proportions track weights") {
    val rows = (0L until 8000L).toDF("id")
      .withColumn("src", concat(lit("s"), pmod($"id", lit(4))))
    val w = Map("s0" -> 0.5, "s1" -> 0.25, "s2" -> 0.05) // s3 dropped
    val kept = SampleOps.weightedSample(rows, "id", $"src", w, seed = 3L)
    val byStratum = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byStratum.contains("s3"), "unlisted stratum must be dropped")
    for ((s0, wt) <- w) {
      val frac = byStratum.getOrElse(s0, 0L).toDouble / 2000.0
      assert(math.abs(frac - wt) < 0.05, s"$s0: got $frac want ~$wt")
    }
    // identical membership after an arbitrary reshuffle — the property
    // partition-seeded sample()/randomSplit() cannot give
    val again = SampleOps.weightedSample(rows.repartition(17), "id", $"src", w, seed = 3L)
    assert(again.exceptAll(kept).isEmpty && kept.exceptAll(again).isEmpty)
    // weight 0 keeps nothing; weight 1 keeps everything in the stratum
    val all = SampleOps.weightedSample(rows, "id", $"src", Map("s0" -> 1.0), seed = 3L)
    assert(all.count() == 2000L)
    val none = SampleOps.weightedSample(rows, "id", $"src", Map("s0" -> 0.0), seed = 3L)
    assert(none.count() == 0L)
  }
}
