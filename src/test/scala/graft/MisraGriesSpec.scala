package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{MisraGries, MisraGriesAgg}

/** Misra–Gries heavy hitters: the local aggregator's error/recall bound,
  * and the two-pass pipeline's exactness against a plain group-by.
  */
class MisraGriesSpec extends SparkSuite {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(7L)).get

  // Zipf-ish skew: a few hot keys over a long tail
  private val skewed: List[String] = {
    val hot = List.fill(400)("hot1") ++ List.fill(250)("hot2") ++ List.fill(120)("hot3")
    val tail = sample(Gen.choose(0, 5000).map(i => s"t$i"), 3000)
    scala.util.Random.javaRandomToRandom(new java.util.Random(99))
      .shuffle(hot ++ tail)
  }

  test("local MG summary: superset + error bound on any reduce/merge shape") {
    val agg = new MisraGriesAgg(64)
    val n = skewed.length
    val bound = n / 65 // n / (capacity+1)
    val truth = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // simulate Spark's partial/final shape: chunked reduces, tree merge
    val partials = skewed.grouped(500).map(_.foldLeft(agg.zero)(agg.reduce)).toList
    val summary = partials.reduce(agg.merge)
    for ((k, c) <- truth if c > bound)
      assert(summary.contains(k), s"key $k (count $c > bound $bound) lost")
    for ((k, est) <- summary) {
      val t = truth(k)
      assert(est <= t && est >= t - bound, s"$k: est $est not in [${t - bound}, $t]")
    }
    assert(summary.size <= 64)
  }

  test("exactHeavyHitters equals plain groupBy-having, stable under repartition") {
    val df = skewed.toDF("k")
    val want = df.groupBy("k").agg(count(lit(1)).as("n"))
      .filter($"n" >= 100).orderBy($"k").collect().toSeq
    for (parts <- Seq(1, 7)) {
      val got = MisraGries.exactHeavyHitters(df.repartition(parts), $"k",
        minFreq = 100L, capacity = 256)
        .withColumnRenamed("key", "k").orderBy($"k").collect().toSeq
      assert(got.map(_.toSeq) == want.map(_.toSeq), s"parts=$parts")
    }
  }

  test("exactHeavyHitters on an empty input returns an empty result") {
    val df = Seq.empty[String].toDF("k")
    assert(MisraGries.exactHeavyHitters(df, $"k", minFreq = 1L, capacity = 8).count() == 0L)
  }

  test("exactHeavyHitters refuses a capacity that cannot guarantee recall") {
    val df = (1 to 1000).map(i => s"k${i % 10}").toDF("k")
    intercept[IllegalArgumentException] {
      MisraGries.exactHeavyHitters(df, $"k", minFreq = 5L, capacity = 8)
    }
  }

  test("capacity-free overload escalates past the default and stays exact at 10x volume") {
    // n = 100k with minFreq=10: the 8192-counter default's error bound
    // (100k/8193 ≈ 12) exceeds minFreq, so the fixed-capacity call refuses —
    // the adaptive overload must escalate to n/minFreq+1 = 10001 counters
    // and still return the exact group-by answer.
    val n = 100000
    val df = spark.range(n.toLong)
      .select(concat(lit("k"), (col("id") % 3000).cast("string")).as("k"))
    intercept[IllegalArgumentException] {
      MisraGries.exactHeavyHitters(df, $"k", minFreq = 10L, capacity = 8192)
    }
    val want = df.groupBy("k").agg(count(lit(1)).as("n"))
      .filter($"n" >= 10).orderBy($"k").collect().toSeq
    val got = MisraGries.exactHeavyHitters(df.repartition(8), $"k", minFreq = 10L)
      .withColumnRenamed("key", "k").orderBy($"k").collect().toSeq
    assert(got.map(_.toSeq) == want.map(_.toSeq))
    // derived capacity n/minFreq+1 satisfies the recall require by
    // construction: error bound n/(cap+1) < minFreq
    assert(n / (n / 10 + 1 + 1) < 10)
  }

  test("capacity-free overload does not persist on the no-escalation path") {
    // n = 3770 with minFreq=100: the 8192-counter default's bound is 0, so
    // no escalation — the token stream must NOT be materialized (that cache
    // is the 100 TB anti-pattern the two-pass design avoids), and the
    // returned plan must rescan lineage, not an InMemoryTableScan.
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val df = skewed.toDF("k")
    val got = MisraGries.exactHeavyHitters(df, $"k", minFreq = 100L)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "no-escalation path left a persisted RDD behind")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("InMemoryTableScan"), s"cached scan in plan:\n$plan")
    assert(got.count() == 3L)
  }

  test("capacity-free overload stays exact when every key is a heavy hitter") {
    // minFreq=1 derives capacity n+1 — every distinct key tracked, result
    // must be the full exact group-by even though the default capacity's
    // bound (20000/8193 = 2 >= 1) forces the escalation path.
    val df = spark.range(20000L).select(col("id").cast("string").as("k"))
    val got = MisraGries.exactHeavyHitters(df, $"k", minFreq = 1L)
    assert(got.count() == 20000L)
  }
}
