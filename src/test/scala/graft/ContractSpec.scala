package graft

/** Driver-contract invariants: every oracle names a real query, the
  * no-oracle set stays exactly the documented allowlist (each member has a
  * dedicated property/equivalence spec — adding a rows-only query without
  * one must fail HERE, loudly), and the flagship smoke query returns rows.
  */
class ContractSpec extends SparkSuite {

  test("every oracleSql key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries (typo?): $orphans")
  }

  test("the no-oracle set is exactly the documented property-spec'd allowlist") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val allowed = Set(
      "q_approx_distinct",    // HLL 3-sigma bound: PropertySpec
      "q_dedup_minhash",      // hash-seeded estimate: DedupSpec
      "q_dedup_simhash",      // hash-seeded blocking: DedupSpec
      "q_similarity_lsh",     // seeded projections: SimilaritySpec recall
      "q_similarity_ivf",     // centroid-seeded: SimilaritySpec full-probe == brute
      "q_multimodal_decode",  // no media codec in DuckDB: MultimodalSpec
      "q_sample_split",       // layout property: SampleOpsSpec
      "q_quantile_sketch",    // sketch error bound: PropertySpec
      "q_chunk_cdc")          // rolling scan not SQL-expressible: CdcChunkSpec
    assert(noOracle == allowed,
      s"no-oracle drift — missing oracle: ${noOracle -- allowed}; " +
        s"stale allowlist: ${allowed -- noOracle}. A new rows-only query " +
        "needs a dedicated spec AND an entry here naming it.")
  }

  test("flagship entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
