package graft

import org.apache.spark.sql.functions._

import graft.functions.{QuantileSketch, QuantileSketchAgg}

class QuantileSketchSpec extends SparkSuite {
  import spark.implicits._

  private val Probs = Seq(0.25, 0.5, 0.75, 0.99)

  /** exact lower order statistic */
  private def exactQ(sorted: Array[Double], p: Double): Double =
    sorted(math.max(0, math.ceil(p * sorted.length).toInt - 1))

  /** rank of v in the sorted data (# elements <= v) */
  private def rankOf(sorted: Array[Double], v: Double): Int =
    sorted.count(_ <= v)

  test("compress preserves total weight and stays sorted") {
    val vals = Array.tabulate(5000)(i => ((i * 7919) % 5000).toDouble)
    val wts = Array.fill(5000)(1L)
    val (v, w) = QuantileSketch.compress(vals, wts, 256)
    assert(v.length <= 256 && w.sum == 5000L)
    assert(v.zip(v.tail).forall { case (a, b) => a <= b })
  }

  test("distributed sketch quantiles land within a few strata of exact (uniform + skewed)") {
    val uniform = (0 until 20000).map(i => ((i * 104729) % 20000).toDouble)
    val skewed = (0 until 20000).map(i => math.pow(((i * 7919) % 20000).toDouble, 3))
    for ((data, label) <- Seq((uniform, "uniform"), (skewed, "skewed"))) {
      val k = 256
      val sk = udaf(new QuantileSketchAgg(k, Probs))
      val got = data.toDF("x").repartition(16)
        .agg(sk($"x").as("qs")).collect().head.getSeq[Double](0)
      val sorted = data.sorted.toArray
      Probs.zip(got).foreach { case (p, est) =>
        val rankErr = math.abs(rankOf(sorted, est) - p * sorted.length)
        // one compression moves ranks by <= n/k; allow a few rounds
        assert(rankErr <= 5.0 * sorted.length / k,
          s"$label p=$p est=$est exact=${exactQ(sorted, p)} rankErr=$rankErr")
      }
    }
  }

  test("sketch on a single small partition is exact") {
    val data = (1 to 100).map(_.toDouble)
    val sk = udaf(new QuantileSketchAgg(256, Probs))
    val got = data.toDF("x").coalesce(1)
      .agg(sk($"x").as("qs")).collect().head.getSeq[Double](0)
    val sorted = data.toArray
    Probs.zip(got).foreach { case (p, est) =>
      assert(est == exactQ(sorted, p), s"p=$p: $est vs ${exactQ(sorted, p)}")
    }
  }
}
