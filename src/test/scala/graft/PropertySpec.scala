package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{DedupOps, Transforms => T, Warehouse => W}

/** Property-based tests (SURVEY §5.3): ScalaCheck generators with a fixed
  * seed produce adversarial batches, each property evaluated in ONE Spark
  * job over the whole batch (a job per generated case would be glacial).
  *
  *  - the lenient parsers are TOTAL (never throw — `errors='coerce'`
  *    semantics, `scripts/transform.py:109`)
  *  - domain guards map every input into their closed domain and are
  *    idempotent (law_cat_cd → {F,M,V,I,U}, perp_sex → {M,F,U})
  *  - the borough map is identity on already-mapped values
  *  - dedup output ≤ input, unique per key, idempotent
  *  - upsert is idempotent: a second application adds zero rows
  *  - the native Jaccard kernels agree with each other
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  private val nastyStrings: Gen[String] = Gen.frequency(
    5 -> Gen.asciiPrintableStr,
    3 -> Gen.alphaNumStr,
    2 -> Gen.numStr,
    1 -> Gen.const(""),
    1 -> Gen.const("   "),
    1 -> Gen.oneOf("2020-13-45", "not a date", "1e99", "-", "∞", "NaN", "null",
      "1700000000000", "2021-02-29", "0000-00-00", "9999-99-99"),
    1 -> Gen.stringOf(Gen.oneOf('0', '1', '-', '/', ':', ' ', 'T', 'Z')))

  test("lenient date parsers are total: arbitrary strings never throw") {
    val strs = sample(nastyStrings, 800)
    val df = strs.toDF("s")
    val out = df.select(
      T.lenientDateParse($"s").as("d1"),
      T.dateOrEpochMillis($"s").as("d2"),
      T.lenientDouble($"s").as("x"),
      T.lenientInt($"s").as("i")).collect()
    assert(out.length == strs.length) // completed without exception
  }

  test("epoch-millis fallback: valid millis parse, garbage coerces to null") {
    val rows = Seq("1700000000000" -> "2023-11-14", "2021-06-01" -> "2021-06-01",
      "garbage" -> null, "" -> null)
    val got = rows.map(_._1).toDF("s")
      .select(date_format(T.dateOrEpochMillis($"s"), "yyyy-MM-dd")).as[String]
      .collect()
    assert(got.toSeq == rows.map(_._2))
  }

  test("law-category guard: closed domain {F,M,V,I,U} and idempotent") {
    val strs = sample(nastyStrings, 500) ++ Seq("f", "M", "v", "I", "none", "NONE", null)
    val out = strs.toDF("s")
      .select(T.lawCategoryGuard($"s").as("g"))
      .withColumn("gg", T.lawCategoryGuard($"g"))
      .collect()
    out.foreach { r =>
      assert(Set("F", "M", "V", "I", "U").contains(r.getString(0)), s"out of domain: $r")
      assert(r.getString(0) == r.getString(1), "guard must be idempotent")
    }
  }

  test("sex guard: closed domain {M,F,U} and idempotent") {
    val strs = sample(nastyStrings, 500) ++ Seq("m", "F", null, "x")
    val out = strs.toDF("s")
      .select(T.sexGuard($"s").as("g")).withColumn("gg", T.sexGuard($"g"))
      .collect()
    out.foreach { r =>
      assert(Set("M", "F", "U").contains(r.getString(0)))
      assert(r.getString(0) == r.getString(1))
    }
  }

  test("borough map: identity on mapped values (apply twice == apply once)") {
    val boroughs = Map("B" -> "Bronx", "K" -> "Brooklyn", "M" -> "Manhattan",
      "Q" -> "Queens", "S" -> "Staten Island")
    val strs = sample(nastyStrings, 300) ++ boroughs.keys ++ boroughs.values
    val out = strs.toDF("s")
      .select(T.mapWithPassthrough($"s", boroughs).as("m1"))
      .withColumn("m2", T.mapWithPassthrough($"m1", boroughs))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("dedup: |out| <= |in|, exactly one row per key, idempotent") {
    val keys = sample(Gen.chooseNum(0L, 40L), 400)
    val df = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val d1 = W.dedupByKey(df, Seq("k"), Seq($"payload")).cache()
    assert(d1.count() <= df.count())
    assert(d1.groupBy("k").count().filter($"count" > 1).isEmpty)
    val d2 = W.dedupByKey(d1, Seq("k"), Seq($"payload"))
    assert(d2.exceptAll(d1).isEmpty && d1.exceptAll(d2).isEmpty)
    // deterministic winner: smallest payload per key (the tiebreak order)
    val manual = keys.zipWithIndex.groupBy(_._1).map { case (k, g) =>
      (k, g.map(_._2.toLong).min) }.toSet
    assert(d1.as[(Long, Long)].collect().toSet == manual)
  }

  test("upsert: idempotent (second application adds zero rows), key-unique") {
    val incoming = sample(Gen.chooseNum(0L, 60L), 300).zipWithIndex
      .map { case (k, i) => (k, s"v$i") }.toDF("k", "v")
    val target = sample(Gen.chooseNum(30L, 90L), 100).zipWithIndex
      .map { case (k, i) => (k, s"t$i") }.toDF("k", "v")
    val targetDedup = W.dedupByKey(target, Seq("k"), Seq($"v"))
    val newRows = W.upsertNewRows(
      W.dedupByKey(incoming, Seq("k"), Seq($"v")), targetDedup, Seq("k")).cache()
    val merged = targetDedup.unionByName(newRows).cache()
    assert(merged.groupBy("k").count().filter($"count" > 1).isEmpty,
      "merged warehouse must stay key-unique")
    val second = W.upsertNewRows(
      W.dedupByKey(incoming, Seq("k"), Seq($"v")), merged, Seq("k"))
    assert(second.isEmpty, "re-applying the same batch must add nothing")
  }

  test("native sorted-merge Jaccard agrees with the hash-set kernel") {
    val docs = sample(Gen.alphaNumStr.suchThat(_.nonEmpty), 120)
    val df = docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
      .select($"id", DedupOps.shingles($"text", 3).as("sh"),
        DedupOps.sortedShingles($"text", 3).as("ssh"))
    val pairs = df.as("a").join(df.as("b"), $"a.id" < $"b.id")
      .select(
        DedupOps.jaccard($"a.sh", $"b.sh").as("exact"),
        graft.functions.VectorExpressions
          .jaccardSortedGE($"a.ssh", $"b.ssh", 0.3).as("pruned"))
      .collect()
    pairs.foreach { r =>
      val (exact, pruned) = (r.getDouble(0), r.getDouble(1))
      if (exact >= 0.3) assert(pruned == exact, s"exact=$exact pruned=$pruned")
      else assert(pruned == -1.0 || pruned == exact, s"exact=$exact pruned=$pruned")
    }
  }

  test("bitset Jaccard agrees with the set kernel through a dense-id dictionary") {
    val docs = sample(Gen.alphaNumStr.suchThat(_.nonEmpty), 120)
    val df = docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
      .select($"id", DedupOps.shingles($"text", 3).as("sh"))
    // global dict: distinct shingles → dense ids (any canonical order)
    val dict = df.select(explode($"sh").as("tok")).distinct()
      .orderBy("tok").as[String].collect().zipWithIndex.toMap
    val nWords = (dict.size + 63) / 64
    val toIds = udf((sh: Seq[String]) => sh.map(dict))
    val withBits = df.select($"id", $"sh",
      graft.functions.VectorExpressions
        .idsToBitset(toIds($"sh"), nWords).as("bits"))
    val pairs = withBits.as("a").join(withBits.as("b"), $"a.id" < $"b.id")
      .select(DedupOps.jaccard($"a.sh", $"b.sh").as("set"),
        graft.functions.VectorExpressions
          .bitsetJaccard($"a.bits", $"b.bits").as("bits"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (setJ, bitJ) = (r.getDouble(0), r.getDouble(1))
      assert(setJ == bitJ || (setJ.isNaN && bitJ.isNaN), s"set=$setJ bitset=$bitJ")
    }
  }

  test("minhash estimator: bounded in [0,1], exactly 1 on identical input") {
    val docs = sample(Gen.alphaNumStr.suchThat(_.length > 3), 60)
    val df = docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
      .select($"id", DedupOps.minhashSignature(DedupOps.shingles($"text", 3), 64).as("sig"))
    val self = df.select(DedupOps.minhashEstimate($"sig", $"sig", 64)).as[Double].collect()
    assert(self.forall(_ == 1.0))
    val cross = df.as("a").join(df.as("b"), $"a.id" < $"b.id")
      .select(DedupOps.minhashEstimate($"a.sig", $"b.sig", 64)).as[Double].collect()
    assert(cross.forall(e => e >= 0.0 && e <= 1.0))
  }

  test("native wordNgrams equals the HOF plan on adversarial strings") {
    // mixed whitespace runs, unicode, empties — one Spark job per n
    val wsHeavy: Gen[String] = for {
      toks <- Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr,
        Gen.const("héllo"), Gen.const("宇宙"), Gen.const("a")))
      seps <- Gen.listOfN(toks.length + 1,
        Gen.oneOf(" ", "  ", "\t", "\n", " \t ", ""))
    } yield seps.zipAll(toks, "", "").map { case (s, t) => s + t }.mkString
    val docs = sample(wsHeavy, 120).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
    for (n <- Seq(1, 2, 3)) {
      val tok = graft.ops.TextOps.tokens($"t")
      val hof = when(size(tok) >= n,
        transform(sequence(lit(1), size(tok) - lit(n - 1)),
          i => array_join(slice(tok, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
      val bad = docs.select($"id", graft.ops.TextOps.ngrams($"t", n).as("fast"),
        hof.as("slow")).filter(not($"fast" <=> $"slow")).count()
      assert(bad == 0L, s"n=$n: $bad rows disagree with the HOF plan")
    }
  }

  test("q_approx_distinct: HLL++ estimates land within 3·rsd of exact counts") {
    // The one registered no-oracle aggregate (approx != approx across
    // engines) gets its error bound pinned here instead: at rsd=0.01 the
    // estimate must sit within 3 standard errors of countDistinct — the
    // same columns and rsd the registered query uses.
    val li = Tables(spark, sf, "lineitem")
    val row = li.agg(
      countDistinct($"l_partkey").as("exact_parts"),
      approx_count_distinct($"l_partkey", 0.01).as("approx_parts"),
      countDistinct($"l_orderkey").as("exact_orders"),
      approx_count_distinct($"l_orderkey", 0.01).as("approx_orders")).head()
    for ((exact, approx, nm) <- Seq(
        (row.getLong(0), row.getLong(1), "l_partkey"),
        (row.getLong(2), row.getLong(3), "l_orderkey"))) {
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 3 * 0.01,
        s"$nm: approx $approx vs exact $exact — rel err $relErr exceeds 3*rsd")
    }
    // and the registered query itself returns the same estimates
    val q = SparkEntry.queries("q_approx_distinct")(spark, sf).head()
    assert(q.getLong(0) == row.getLong(1) && q.getLong(1) == row.getLong(3))
  }
}
