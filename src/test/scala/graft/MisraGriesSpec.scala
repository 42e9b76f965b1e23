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
}
