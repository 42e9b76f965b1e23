package graft

/** Physical-plan shape assertions — the 100 TB posture, checked at test
  * scale. A query that silently loses its parquet filter pushdown, its
  * broadcast join, or its whole-stage codegen span would still pass the
  * value-level oracle at sf0.01 but regress catastrophically at cluster
  * scale, so the plan shape itself is part of the contract.
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_scan_pushdown: watermark predicate reaches the parquet scan") {
    val p = plan("q_scan_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"),
      s"watermark filter not pushed to scan:\n$p")
  }

  test("q_scan_pushdown: scan reads only the projected columns") {
    val p = plan("q_scan_pushdown")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_extendedprice"),
      s"column pruning failed — scan reads unprojected columns: $readSchema")
  }

  test("q_join_broadcast: planner chose a broadcast hash join") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin:\n$p")
    assert(!p.contains("SortMergeJoin"), "dim join should not sort-merge")
  }

  test("q_join_multiway: all dimension joins broadcast; no dim shuffles") {
    val p = plan("q_join_multiway")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins (cust/supp/nation/region), got $broadcasts")
  }

  test("q_agg_group: two-phase hash aggregation (map-side partial)") {
    val p = plan("q_agg_group")
    val hashAggs = "HashAggregate".r.findAllIn(p).size
    assert(hashAggs >= 2, s"expected partial+final HashAggregate, got $hashAggs:\n$p")
  }

  test("q_agg_group: pipeline runs inside whole-stage codegen") {
    // codegen'd operators carry the `*(stageId)` marker in plan toString
    val df = SparkEntry.queries("q_agg_group")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) HashAggregate") || p.contains("*(1) Filter"),
      s"scan→filter→partial-agg not codegen-fused:\n$p")
  }

  test("q_topk: sort+limit fuses into TakeOrderedAndProject") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$p")
  }

  test("q_similarity_topk: query side broadcast, no cartesian shuffle") {
    val p = plan("q_similarity_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set should broadcast:\n$p")
  }

  test("q_similarity_topk: ranked by the bounded custom operator, not a window sort") {
    // The registered query ends in a presentation orderBy (legitimately a
    // range exchange + sort), so the no-SortExec half is asserted on the
    // ranking relation itself.
    val p = plan("q_similarity_topk")
    assert(p.contains("TopKPerGroup"),
      s"similarity ranking must go through TopKPerGroupExec:\n$p")
    assert(!p.contains("Window"),
      s"scored relation must not shuffle through a window rank:\n$p")
    val ranked = graft.ops.SimilarityOps.bruteForceTopK(
      Tables.embeddings(spark, sf).filter(org.apache.spark.sql.functions.col("vec_id") < 5),
      Tables.embeddings(spark, sf), 10)
    val rp = ranked.queryExecution.executedPlan
    assert(rp.collect { case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
      s"bounded heaps must not plan a SortExec:\n$rp")
  }

  test("native kernels stay inside codegen (no CodegenFallback in hot ops)") {
    // The scoring projection (graft_dot / norm product) must carry the
    // `*(n)` whole-stage-codegen marker — a CodegenFallback expression
    // would demote its Project to an uncodegen'd node.
    val df = SparkEntry.queries("q_similarity_topk")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val scoreLine = p.linesIterator.find(_.contains("graft_dot")).getOrElse("")
    assert(scoreLine.contains("*("), s"scoring projection not codegen'd: $scoreLine\n$p")
  }

  test("q_dedup_editdist: greedy verify expression stays inside codegen") {
    val df = SparkEntry.queries("q_dedup_editdist")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val line = p.linesIterator.find(_.contains("graft_edit_dist_le1")).getOrElse("")
    assert(line.nonEmpty, s"verify must use the greedy kernel:\n$p")
    assert(line.contains("*("), s"edit-distance verify not codegen'd: $line")
  }

  test("q_chunk_cdc: narrow codegen'd scan — boundary expression in codegen, no Exchange before the chunks") {
    val df = SparkEntry.queries("q_chunk_cdc")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val boundsLine = p.linesIterator
      .find(_.contains("graft_cdc_chunk_bounds")).getOrElse("")
    assert(boundsLine.contains("*("), s"CDC boundary scan not codegen'd: $boundsLine\n$p")
    // the only exchange allowed is the final presentation orderBy's range
    // partitioning — chunking itself must be shuffle-free
    assert(!p.contains("Exchange hashpartitioning"),
      s"CDC chunking must not hash-shuffle:\n$p")
  }

  test("q_join_asof: no pair join — union + keyed window, bounded shuffles") {
    val p = plan("q_join_asof")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoop"),
      s"as-of must not plan a join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, // right-side dedup agg + the carry-forward window
      s"expected <=2 hash shuffles, got $exchanges:\n$p")
  }

  test("q_dedup_pk: single shuffle keyed on the dedup key, partial-combining aggregate") {
    val p0 = plan("q_dedup_pk")
    // a materialized AQE cache prints "== Final Plan ==" AND "== Initial
    // Plan ==" for the same subtree — count exchanges once, not per echo
    val p = p0.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"dedup should shuffle once on the key, got $exchanges:\n$p")
    // the k=1 all-ascending tiebreak plans as a NATIVE min(struct)
    // aggregate (partial combine on the map side — the shuffle moves one
    // row per (key, task), not every duplicate), measured ~3x the custom
    // hash-heap operator at sf10's near-unique key cardinality
    assert(p.contains("partial_min"),
      s"dedupByKey must plan a partial-combining min(struct) aggregate:\n$p")
    assert(!p.contains("Window"),
      s"dedupByKey must not plan a window sort:\n$p")
  }

  test("dedupByKey: mixed-direction tiebreak stays on the bounded custom operator") {
    import org.apache.spark.sql.functions.col
    val df = Tables(spark, sf, "lineitem")
    val p = graft.ops.Warehouse.dedupByKey(df, Seq("l_orderkey"),
        Seq(col("l_linenumber").asc, col("l_partkey").desc))
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"),
      s"mixed asc/desc cannot map to min/max(struct) — expected the " +
        s"custom operator:\n$p")
  }

  test("dedupByKey: all-descending tiebreak plans as max(struct)") {
    import org.apache.spark.sql.functions.col
    val df = Tables(spark, sf, "lineitem")
    val p = graft.ops.Warehouse.dedupByKey(df, Seq("l_orderkey"),
        Seq(col("l_linenumber").desc, col("l_partkey").desc))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_max"),
      s"all-desc should plan the max(struct) aggregate:\n$p")
  }

  test("q_bloom_join: native bloom probe on the fact side BEFORE the join, no ScalaUDF") {
    val df = SparkEntry.queries("q_bloom_join")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the probe filter must sit under the join, not above it
    val joinIdx = p.linesIterator.indexWhere(l =>
      l.contains("HashJoin") || l.contains("SortMergeJoin"))
    val filterIdx = p.linesIterator.indexWhere(_.contains("graft_bloom_might_contain"))
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"bloom probe filter should be below the join in the plan tree:\n$p")
    assert(!p.contains("UDF"),
      s"bloom probe must be the codegen'd native expression, not a ScalaUDF:\n$p")
  }

  test("q_gap_fill: spine is explode(sequence), never a cartesian join") {
    val p = plan("q_gap_fill")
    assert(p.contains("Generate explode"), s"expected a Generate node:\n$p")
    assert(!p.contains("CartesianProduct"), s"spine must not plan a cartesian:\n$p")
  }

  test("q_join_interval: binning turns the theta join into a hash/merge join") {
    val p = plan("q_join_interval")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"a bare overlap predicate would nested-loop; binning must prevent that:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"),
      s"expected an equi join on the bin id:\n$p")
  }

  test("q_quality_filter: shuffle-free scan-speed gate (filter, no Exchange)") {
    // count() form so the presentation orderBy (legitimately a range
    // exchange) is optimized away, leaving the gate itself
    val p = SparkEntry.queries("q_quality_filter")(spark, sf)
      .groupBy().count().queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"the quality gate itself must not shuffle:\n$p")
  }

  test("q_sample_weighted: pure narrow filter, no shuffle, no sampling job") {
    val p = SparkEntry.queries("q_sample_weighted")(spark, sf)
      .groupBy().count().queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning") && !p.contains("Sample"),
      s"weighted sampling must be a narrow filter pass:\n$p")
  }

  test("q_decontaminate: eval n-grams broadcast; train side never shuffles full rows") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"eval-side dictionary must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"decontamination must not sort-merge the train side:\n$p")
  }

  test("q_heavy_hitters: candidate INSET filter sits on the scan, before the agg") {
    val p = plan("q_heavy_hitters")
    val aggIdx = p.linesIterator.indexWhere(_.contains("HashAggregate"))
    val insetIdx = p.linesIterator.indexWhere(l =>
      l.contains("INSET") || l.contains(" IN ("))
    assert(aggIdx >= 0 && insetIdx > aggIdx,
      s"exact pass must filter to candidates BELOW the aggregate (map-only):\n$p")
  }

  test("q_write_partitioned: readback scan prunes to the one partition") {
    val df = SparkEntry.queries("q_write_partitioned")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(o_orderpriority"),
      s"partition filter not applied at scan:\n$p")
  }

  test("q_merge_cdc: ONE join, no three-branch union re-scanning the merge") {
    val p = plan("q_merge_cdc")
    assert(p.contains("FullOuter"), s"merge must be a single full-outer join:\n$p")
    assert(!p.contains("Union"),
      s"merge cases must resolve in the join projection, not a union of branches:\n$p")
  }

  test("q_profile: one scan feeds the multi-distinct Expand (no per-column re-scan)") {
    val p = plan("q_profile")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"profiler must read the table once, saw $scans scans:\n$p")
    assert(p.contains("Expand"),
      s"expected the multi-distinct Expand rewrite:\n$p")
  }
}
