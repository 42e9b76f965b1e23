package graft

import org.apache.spark.sql.functions._

import graft.ops.{AggOps, SimilarityOps}

class QuantizeAggSpec extends SparkSuite {
  import spark.implicits._

  test("quantizeInt8: codes bounded, reconstruction within half a step, zero vector safe") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 127.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(-3.0f, 3.0f, 1.5f, -1.5f)))
      .toDF("vec_id", "embedding")
    val q = SimilarityOps.quantizeInt8(df, "embedding")
    val rows = q.select("vec_id", "scale", "qvec", "embedding").collect()
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val qv = r.getSeq[Long](2)
      val v = r.getSeq[Float](3)
      assert(qv.forall(c => c >= -127 && c <= 127))
      if (scale == 0.0) assert(qv.forall(_ == 0L))
      else {
        // |dequant - original| <= scale/2 (the quantization step bound)
        qv.zip(v).foreach { case (c, x) =>
          assert(math.abs(c * scale - x) <= scale / 2 + 1e-12,
            s"vec ${r.getLong(0)}: code $c * $scale vs $x")
        }
        assert(qv.map(math.abs).max == 127L, "max-magnitude element maps to full scale")
      }
    }
  }

  test("quantize/dequantize round-trip keeps cosine within 1% on real embeddings") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val q = SimilarityOps.quantizeInt8(emb, "embedding")
      .withColumn("deq", SimilarityOps.dequantizeInt8(col("qvec"), col("scale")))
    val drift = q.select(
        SimilarityOps.cosine(col("embedding").cast("array<double>"), col("deq")).as("cos"))
      .agg(min("cos")).head().getDouble(0)
    assert(drift > 0.99, s"worst reconstruction cosine $drift")
  }

  test("merged partial states equal the from-scratch aggregate on every key") {
    val liDf = Tables.lineitem(spark, sf)
    val specs = Seq(
      ("n", "count", lit(1)),
      ("sum_qty", "sum", col("l_quantity").cast("decimal(12,2)")),
      ("min_qty", "min", col("l_quantity")),
      ("max_qty", "max", col("l_quantity")))
    // three arbitrary batches (uneven split, one empty)
    val parts = Seq(
      liDf.filter(col("l_orderkey") % 4 === 0),
      liDf.filter(col("l_orderkey") % 4 =!= 0),
      liDf.limit(0))
      .map(b => AggOps.partialState(b, Seq("l_returnflag"), specs))
    val merged = AggOps.mergeStates(parts, Seq("l_returnflag"), specs)
    val direct = AggOps.partialState(liDf, Seq("l_returnflag"), specs)
      // count-col partials merge via sum; align column types for compare
      .select(col("l_returnflag"), col("n").cast("long").as("n"),
        col("sum_qty").cast(merged.schema("sum_qty").dataType).as("sum_qty"),
        col("min_qty"), col("max_qty"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("HLL distinct states: merge-of-batches == from-scratch sketch, estimate near exact") {
    val liDf = Tables.lineitem(spark, sf)
    val keys = Seq("l_returnflag")
    // three arbitrary batches (uneven split, one empty) — the incremental path
    val parts = Seq(
      liDf.filter(col("l_orderkey") % 4 === 0),
      liDf.filter(col("l_orderkey") % 4 =!= 0),
      liDf.limit(0))
      .map(b => AggOps.distinctState(b, keys, "sk", col("l_partkey")))
    val merged = AggOps.mergeDistinctStates(parts, keys, "sk")
      .select(col("l_returnflag"),
        AggOps.distinctEstimate(col("sk")).as("est"))
    val scratch = AggOps.distinctState(liDf, keys, "sk", col("l_partkey"))
      .select(col("l_returnflag"),
        AggOps.distinctEstimate(col("sk")).as("est"))
    // lattice exactness: merged sketches estimate IDENTICALLY to from-scratch
    assert(merged.exceptAll(scratch).isEmpty && scratch.exceptAll(merged).isEmpty,
      "merged sketch estimates must equal the from-scratch sketch exactly")
    // and the estimate tracks the exact distinct within HLL error
    val exact = liDf.groupBy(keys.map(col): _*)
      .agg(countDistinct(col("l_partkey")).cast("double").as("n"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    merged.collect().foreach { r =>
      val (k, est) = (r.getString(0), r.getLong(1).toDouble)
      assert(math.abs(est - exact(k)) / exact(k) < 0.05,
        s"$k: estimate $est vs exact ${exact(k)}")
    }
  }

  test("saltedAggregate is row-identical to the plain aggregate on a hot key") {
    // single-value key: the degenerate worst case a naive plan funnels to one reducer
    val df = (1 to 5000).map(i => ("hot", i.toLong)).toDF("k", "v")
      .union(Seq(("cold", 1L)).toDF("k", "v"))
    val specs = Seq(
      ("n", "count", lit(1)),
      ("sum_v", "sum", col("v")),
      ("min_v", "min", col("v")),
      ("max_v", "max", col("v")))
    val salted = AggOps.saltedAggregate(df, Seq("k"), specs, buckets = 8)
    val out = salted.collect().map(r => r.getAs[String]("k") ->
      ((r.getAs[Long]("n"), r.getAs[Long]("sum_v"), r.getAs[Long]("min_v"), r.getAs[Long]("max_v")))).toMap
    assert(out("hot") == ((5000L, 5000L * 5001L / 2, 1L, 5000L)))
    assert(out("cold") == ((1L, 1L, 1L, 1L)))
  }

  test("mergeStates rejects non-algebraic ops") {
    assertThrows[IllegalArgumentException] {
      AggOps.partialState(Tables.lineitem(spark, sf), Seq("l_returnflag"),
        Seq(("m", "median", col("l_quantity"))))
    }
  }
}
