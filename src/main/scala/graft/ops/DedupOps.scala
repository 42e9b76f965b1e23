package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines (SURVEY §2.7 north-star):
  * exact, content-hash, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design: exact/hash dedup is one shuffle on the hash key; MinHash
  * signatures and SimHash are per-row expressions (no shuffle); LSH candidate
  * generation shuffles (band_idx, band_hash) — a high-cardinality key that
  * partitions evenly — and never materializes the O(n²) pair space.
  */
object DedupOps {

  // ------------------------------------------------------------- exact
  /** Exact dedup on a column set, deterministic winner per group. */
  def exactDedup(df: DataFrame, cols: Seq[String], tiebreak: Seq[Column]): DataFrame =
    Warehouse.dedupByKey(df, cols, tiebreak)

  /** 256-bit content hash (hex) — dedup key for full-content equality.
    * Hashing first means the wide text column is dropped before the
    * shuffle: at 100 TB you shuffle 32-byte digests, not documents.
    */
  def contentHash(c: Column): Column = sha2(c, 256)

  // ------------------------------------------------------------- shingles
  /** Distinct character n-gram shingles. Strings shorter than n contribute
    * themselves (substring is length-clamped). Native single-pass kernel
    * ([[graft.functions.VectorExpressions.CharShingles]]).
    */
  def shingles(c: Column, n: Int): Column =
    graft.functions.VectorExpressions.charShingles(c, n)

  /** [[shingles]] in binary-sorted order — the required input form for the
    * merge-scan Jaccard kernel
    * ([[graft.functions.VectorExpressions.JaccardSortedGE]]).
    */
  def sortedShingles(c: Column, n: Int): Column =
    graft.functions.VectorExpressions.charShingles(c, n, sorted = true)

  /** Exact n-gram Jaccard similarity of two shingle-set columns:
    * |A ∩ B| / |A ∪ B| as exact int/int double division. Native single-pass
    * hash-set kernel ([[graft.functions.VectorExpressions.JaccardSim]]) —
    * same semantics as `size(array_intersect)/size(array_union)` without
    * materializing either intermediate array.
    */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.jaccardSim(a, b)

  // ------------------------------------------------------------- MinHash
  /** k-permutation MinHash signature over a shingle array — ONE native
    * expression pass with Kirsch–Mitzenmacher double hashing (2 xxhash64
    * calls per shingle, not k). No shuffle.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    graft.functions.VectorExpressions.minhashSig(shingleCol, k)

  /** Estimated Jaccard from two MinHash signatures: fraction of equal
    * components (native kernel; `k` is implied by signature length).
    */
  def minhashEstimate(sigA: Column, sigB: Column, k: Int): Column =
    graft.functions.VectorExpressions.sigEqFrac(sigA, sigB)

  /** LSH banding: hash each of `bands` contiguous `rowsPerBand`-sized slices
    * of the signature. Docs sharing any band hash are candidates.
    */
  def lshBandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      hash(slice(sig, b * rowsPerBand + 1, rowsPerBand), lit(b))): _*)

  /** Per-document MinHash signatures as a persistable (id, sig) relation —
    * compute ONCE at ingest, store next to the corpus, and feed
    * [[minhashLshPairsAgainstSignatures]] on every later batch instead of
    * re-shingling the full corpus text per ingest round. A narrow per-row
    * projection; `n`/`k` must match across every relation later joined.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, k: Int = 64): DataFrame =
    ScanSpread.spread(df.select(col(idCol).as("id"), col(textCol).as("__t")),
        col("id"))
      .select(col("id"), minhashSignature(shingles(col("__t"), n), k).as("sig"))

  /** (id, sig) → (id, sig, band, bhash) band explode — the (band, hash)
    * equi-join key both LSH joins shuffle on.
    */
  private def bandExplode(sigs: DataFrame, k: Int, bands: Int): DataFrame =
    sigs.select(col("id"), col("sig"),
      posexplode(lshBandHashes(col("sig"), bands, k / bands)).as(Seq("band", "bhash")))

  /** MinHash-LSH candidate pairs above an estimated-Jaccard threshold.
    *
    * Plan shape (the part that must survive 100×): per-row signature +
    * band hashes (narrow) → posexplode to (band, hash) → self-equi-join on
    * the band key (shuffle partitions by band hash — uniform) → distinct
    * pair ids → verify with the signature estimate. The quadratic blowup is
    * confined to rows sharing a band hash, i.e. actual near-dup clusters.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, k: Int = 64, bands: Int = 16,
                      threshold: Double = 0.5): DataFrame =
    minhashLshPairsFromSignatures(minhashSignatures(df, idCol, textCol, n, k),
      k, bands, threshold)

  /** INCREMENTAL MinHash-LSH: near-dup pairs BETWEEN an existing corpus
    * and a new batch — the daily-crawl shape. Re-running
    * [[minhashLshPairs]] over corpus ∪ batch re-compares corpus × corpus
    * every day, O(C²) work for pairs already known; this emits only the
    * (corpus, batch) cross pairs, so a full ingest round is
    * `minhashLshPairsAgainst(corpus, batch)` + `minhashLshPairs(batch)`
    * — O(C·B + B²) candidate work, and the corpus side never self-joins.
    * The union equivalence (old ∪ cross ∪ batch-internal = pairs of the
    * union, for disjoint id spaces) is spec-proved.
    *
    * Same discipline as the self-join: band equi-join (corpus bands build
    * one side, batch bands probe), verify the signature estimate BEFORE
    * the distinct so only 24-byte survivors shuffle. At steady state the
    * batch side is small — AQE broadcasts it and the corpus's banded rows
    * never move. This overload recomputes signatures from text on both
    * sides; the production loop persists [[minhashSignatures]] once at
    * ingest and calls [[minhashLshPairsAgainstSignatures]], so the corpus
    * text is never re-shingled. Ids must be disjoint across the inputs.
    */
  def minhashLshPairsAgainst(corpus: DataFrame, batch: DataFrame,
                             idCol: String, textCol: String,
                             n: Int = 3, k: Int = 64, bands: Int = 16,
                             threshold: Double = 0.5): DataFrame =
    minhashLshPairsAgainstSignatures(
      minhashSignatures(corpus, idCol, textCol, n, k),
      minhashSignatures(batch, idCol, textCol, n, k),
      k, bands, threshold)

  /** [[minhashLshPairsAgainst]] over PRECOMPUTED (id, sig) relations
    * ([[minhashSignatures]]) — the steady-state ingest shape: the corpus
    * side reads its persisted signature table (a few hundred bytes per
    * document, no text column ever scanned) and only the new batch pays
    * the shingling pass. Both relations must share the signature
    * parameters (`k`, and the shingle `n` at signature time).
    */
  def minhashLshPairsAgainstSignatures(corpusSigs: DataFrame, batchSigs: DataFrame,
                                       k: Int = 64, bands: Int = 16,
                                       threshold: Double = 0.5): DataFrame = {
    val a = bandExplode(corpusSigs, k, bands).alias("a")
    val b = bandExplode(batchSigs, k, bands).alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        minhashEstimate(col("a.sig"), col("b.sig"), k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "est_jaccard")
  }

  /** [[minhashLshPairs]] over a PRECOMPUTED (id, sig) relation — the
    * batch-internal half of the steady-state ingest round, sharing the
    * batch's one shingling pass with the cross-pairs half.
    */
  def minhashLshPairsFromSignatures(sigs: DataFrame, k: Int = 64, bands: Int = 16,
                                    threshold: Double = 0.5): DataFrame =
    // Verify BEFORE deduplicating: the estimator is a cheap native kernel,
    // so re-evaluating it once per agreeing band costs less than shuffling
    // both 8·k-byte signatures through dropDuplicates. The surviving rows
    // are (long, long, double) — the dedup shuffle moves 24-byte rows.
    // Hot buckets are salted (see bandedCandidatePairs) so no single task
    // owns a boilerplate cluster's C(m,2) enumeration.
    bandedCandidatePairs(bandExplode(sigs, k, bands), Nil, threshold)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "est_jaccard")

  /** The FULL daily ingest round over a persisted signature table, as one
    * call: read the corpus's stored signatures, emit every near-dup pair
    * the new batch introduces (corpus×batch cross pairs ∪ batch-internal
    * pairs — O(C·B + B²) candidate work, the corpus never self-joins or
    * re-shingles), then append the batch's signatures — IDEMPOTENTLY.
    *
    * Replay safety, both halves:
    * - the append is a first-writer-wins keyed upsert
    *   ([[Warehouse.upsertIntoParquet]] on `id`), so re-running a batch
    *   appends ZERO duplicate signatures;
    * - the corpus side excludes the batch's own ids (anti-join) before
    *   pairing, so a replayed batch — whose signatures are already in the
    *   table — produces exactly the original round's pairs, not
    *   self-matches at est 1.0.
    * Ids must be globally unique per document (the signature table's key).
    */
  def incrementalDedupRound(batch: DataFrame, sigTableDir: String,
                            idCol: String, textCol: String,
                            n: Int = 3, k: Int = 64, bands: Int = 16,
                            threshold: Double = 0.5): DataFrame = {
    val spark = batch.sparkSession
    val batchSigs = minhashSignatures(batch, idCol, textCol, n, k)
    val fs = new org.apache.hadoop.fs.Path(sigTableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(sigTableDir))
    val internal = minhashLshPairsFromSignatures(batchSigs, k, bands, threshold)
    val pairs =
      if (!exists) internal
      else {
        val corpusOnly = spark.read.parquet(sigTableDir)
          .join(batchSigs.select("id"), Seq("id"), "left_anti")
        minhashLshPairsAgainstSignatures(corpusOnly, batchSigs, k, bands, threshold)
          .unionByName(internal)
      }
    // signatures are a pure function of the text, so same-id collisions
    // carry identical payloads and any deterministic tiebreak works
    Warehouse.upsertIntoParquet(batchSigs, sigTableDir, Seq("id"),
      Seq(org.apache.spark.sql.functions.hash(col("sig"))))
    pairs
  }

  /** SimHash near-dup pairs via Manku-et-al. block COMBINATIONS: split the
    * 64-bit hash into `nBlocks > maxDistance` slices and key on every
    * (nBlocks − maxDistance)-subset's concatenated values. A pair within
    * `maxDistance` differing bits touches at most `maxDistance` slices, so
    * at least one subset matches on BOTH sides in full — recall guaranteed
    * — while each key carries (nBlocks−d)·(64/nBlocks) bits instead of
    * the single-slice scheme's 64/(d+1): e.g. d=8, B=11 keys on ~17 bits
    * vs 7, shrinking bucket collision quadratics by ~2^10 at the price of
    * a C(B, d) per-row explode. Use [[simhashPairs]] when corpora are
    * small or d ≤ 3; this variant when buckets, not rows, dominate.
    */
  /** Corpus-size cap for [[simhashPairsAuto]]'s single-slice tier: the
    * single-slice scheme's blocking key carries only 64/(d+1) bits, so
    * bucket populations — and the candidate quadratic n²/2^(64/(d+1)) —
    * grow past the combinatorial scheme's explode cost around here
    * (measured: single-slice candidate exponent 1.65/decade at d=8 on
    * the synthetic corpus vs ~1 for Manku blocking).
    */
  val SimhashSingleSliceMaxDocs: Long = 100000L

  /** SimHash near-dup pairs, cost-tiered ([[jaccardPairsGlobal]]
    * discipline): single-slice blocking ([[simhashPairs]]) up to
    * `singleSliceMaxDocs` corpus rows, Manku block-combination keys
    * ([[simhashPairsCombinatorial]], B = d + 3) above. BOTH schemes
    * guarantee full recall by pigeonhole and verify exact Hamming
    * distance, so the tier switch is RESULT-IDENTICAL (spec-pinned) —
    * purely a cost choice: wider keys shrink bucket quadratics at the
    * price of a C(B, B−d) per-row explode. The tier probe is one count()
    * job at construction (SURVEY §2.8).
    */
  def simhashPairsAuto(df: DataFrame, idCol: String, textCol: String,
                       maxDistance: Int = 3,
                       singleSliceMaxDocs: Long = SimhashSingleSliceMaxDocs): DataFrame =
    if (df.count() <= singleSliceMaxDocs)
      simhashPairs(df, idCol, textCol, maxDistance)
    else
      simhashPairsCombinatorial(df, idCol, textCol, maxDistance,
        nBlocks = math.min(64, maxDistance + 3))

  def simhashPairsCombinatorial(df: DataFrame, idCol: String, textCol: String,
                                maxDistance: Int, nBlocks: Int): DataFrame = {
    require(maxDistance >= 0 && nBlocks > maxDistance && nBlocks <= 64,
      s"need maxDistance < nBlocks <= 64, got d=$maxDistance B=$nBlocks")
    simhashBlockedPairs(df, idCol, textCol, maxDistance,
      simhashCombKeys(maxDistance, nBlocks))
  }

  /** The Manku scheme's blocking-key expressions over a simhash column
    * named `sh` — one hash per (nBlocks − maxDistance)-subset of the
    * slice set. Shared by [[simhashPairsCombinatorial]] and the
    * ScaleBench candidate-count instrumentation (which must count the
    * EXACT keys the join would shuffle on).
    */
  private[graft] def simhashCombKeys(maxDistance: Int, nBlocks: Int): Seq[Column] = {
    val slices = hashSlices(nBlocks)
    (0 until nBlocks).combinations(nBlocks - maxDistance)
      .map(ss => hash(ss.map(slices): _*)).toSeq
  }

  /** The single-slice scheme's blocking keys over a simhash column named
    * `sh` — the d+1 contiguous slices [[simhashPairs]] joins on. Exposed
    * for the same ScaleBench instrumentation as [[simhashCombKeys]].
    */
  private[graft] def simhashSingleKeys(maxDistance: Int): Seq[Column] = {
    val slices = hashSlices(maxDistance + 1)
    (0 until maxDistance + 1).map(slices)
  }


  // ------------------------------------------------- prefix-filter join
  /** Slack-conservative ceiling for candidate bounds: t·sz computed in
    * doubles can land one ulp ABOVE the exact rational (e.g. 0.55·100 →
    * 55.000000000000007, ceil → 56), which would over-tighten the filter
    * and drop true pairs whose Jaccard equals the threshold exactly.
    * Subtracting 1e-6 (far above accumulated double error for any
    * realistic set size, far below 1) makes every bound err on the LOOSE
    * side only — a slightly wider candidate set is always safe because
    * final verification is exact.
    */
  private def ceilSafe(c: Column): Column = ceil(c - lit(1e-6))

  /** Collect the (cap-bounded) distinct-token dictionary to the driver and
    * attach per-`keyCols`-group dense-id arrays (`ids`) and packed bitsets
    * (`bits`). `toks` must be a persisted single-column ("tok") DataFrame
    * of the distinct tokens; it is unpersisted after the collect.
    */
  private def attachBitsets(docs: DataFrame, keyCols: Seq[String],
                            toks: DataFrame, universe: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nWords = ((universe + 63) / 64).toInt
    val dictLocal = toks.orderBy("tok").select("tok").as[String]
      .collect().zipWithIndex
    toks.unpersist()
    val dict = spark.createDataFrame(dictLocal.toSeq).toDF("tok", "tid")
    docs.select(keyCols.map(col) :+ explode(col("sh")).as("tok"): _*)
      .join(broadcast(dict), "tok")
      .groupBy(keyCols.map(col): _*)
      .agg(collect_list(col("tid")).as("ids"))
      .withColumn("bits",
        graft.functions.VectorExpressions.idsToBitset(col("ids"), nWords))
  }

  /** GLOBAL exact Jaccard similarity join — every pair with J ≥ threshold
    * across the whole corpus, NO blocking column — via the prefix filter
    * (AllPairs/PPJoin family, public literature).
    *
    * Theorem used: under any canonical total order of the token universe,
    * two sets with J(A,B) ≥ t share at least one token in their first
    * |X| − ⌈t·|X|⌉ + 1 tokens, PROVIDED the size filter
    * t·|A| ≤ |B| ≤ |A|/t holds (pairs outside it cannot reach t). So the
    * candidate set from the prefix-token equi-join is a superset of the
    * answer — exact verification keeps precision, the theorem guarantees
    * recall.
    *
    * Plan shape at scale: tokens ordered RAREST-FIRST by global document
    * frequency (one aggregation; broadcast back), so prefix tokens are the
    * most selective — the candidate join on a rare token touches few docs.
    * Shuffles: df-aggregation, per-doc regroup, candidate equi-join on
    * token, pair distinct, exact verify via the sorted-merge kernel.
    * Never materializes all pairs.
    *
    * Selectivity caveat (measured): pruning power scales with token-universe
    * diversity. The synthetic bench corpus has only ~377 distinct 3-grams,
    * so prefixes prune just ~73% of the pair space; real text (50k+ trigram
    * universe, Zipfian) yields rare prefix tokens that touch a handful of
    * docs each. The positional filter (PPJoin) recovers part of the gap.
    */
  def jaccardPairsGlobal(df: DataFrame, idCol: String, textCol: String,
                         n: Int = 3, threshold: Double = 0.6,
                         bruteMaxDocs: Long = BruteForceMaxDocs,
                         maxBitsetUniverse: Long = MaxBitsetUniverse,
                         candidatePairBudget: Option[Long] = None): DataFrame = {
    val docs = ScanSpread.spread(
        df.select(col(idCol).as("id"), col(textCol).as("__t")), col("id"))
      .select(col("id"), sortedShingles(col("__t"), n).as("sh"))
    // Cost-based tier choice, same spirit as Spark picking broadcast vs
    // shuffle joins from size stats: when the corpus is small enough that
    // N² cheap verifications beat the prefix join's machinery AND the
    // token universe fits a dictionary, brute-force all pairs with bitset
    // popcounts (a 48-byte-per-doc broadcast nested loop). Past either
    // bound, the AllPairs/PPJoin prefix filter is the path that scales.
    val nDocs = docs.count()
    // the prefix tier's input: the raw pipeline, or — when the brute
    // probe ran but the universe overflowed the dictionary — the already
    // materialized small relation (bounded), saving the re-scan
    var prefixInput = docs
    if (nDocs <= bruteMaxDocs) {
      // probe cost is bounded: it only runs on <= bruteMaxDocs corpora.
      // Pin the shingled relation ONCE (bounded: ≤ bruteMaxDocs rows of
      // (id, sh)) — the universe probe and the bitset attachment below
      // would otherwise each re-run the scan + shingle kernel, and at
      // this corpus size the per-pass fixed cost (scan + spread shuffle
      // + kernel) is a measurable fraction of the whole query. The
      // prefix tier never pins: its input is unbounded.
      val small = docs.localCheckpoint()
      val toks = small.select(explode(col("sh")).as("tok")).distinct().persist()
      val universe = toks.count()
      if (universe <= maxBitsetUniverse) {
        // localCheckpoint: a self-join re-executes its subtree per side, so
        // without materialization the explode→dict-join→groupBy pipeline
        // would run twice. The checkpointed relation is 48 B/doc (id, sz,
        // ⌈U/64⌉-word bitset) — bounded by bruteMaxDocs, trivially resident.
        val withBits = attachBitsets(small, Seq("id"), toks, universe)
          .select(col("id"), size(col("ids")).as("sz"), col("bits"))
          .localCheckpoint()
        small.unpersist()
        // size-band ints reject most pairs before any popcount runs
        // (And evaluates left to right). The jac projection + filter below
        // gets optimizer-pushed INTO the join condition
        // (PushPredicateThroughJoin) — the shape we want: a failing pair
        // dies during condition eval, before a join output row ever
        // materializes; only surviving pairs pay a second popcount in the
        // projection. Pinned in DedupSpec so a planner change can't
        // silently regress to materialize-all-pairs-then-filter.
        // The size bound `ceil(sz·t)` is precomputed PER ROW (`lo`): the
        // nested loop evaluates its condition O(n²) times, and
        // `b.sz >= a.lo && a.sz >= b.lo` is two long compares per pair vs
        // two double multiplies + two ceils — same predicate exactly
        // (a.sz >= ceil(b.sz·t) ⇔ a.sz >= b.lo by definition of lo).
        // Measured neutral at sf0.1 (BNLJ row iteration + popcounts
        // dominate there); kept because the arithmetic saved scales with
        // the evaluated-pair count, which grows quadratically.
        val banded = withBits.withColumn("lo",
          ceilSafe(col("sz") * threshold).cast("long"))
        return broadcast(banded.as("a")).join(banded.as("b"),
            col("a.id") < col("b.id") &&
              col("b.sz") >= col("a.lo") &&
              col("a.sz") >= col("b.lo"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            graft.functions.VectorExpressions
              .bitsetJaccard(col("a.bits"), col("b.bits")).as("jac"))
          .filter(col("jac") >= threshold)
      }
      toks.unpersist()
      prefixInput = small
    }
    val docsSz = prefixInput.withColumn("sz", size(col("sh")))
    val tokens = docsSz.select(col("id"), col("sz"), explode(col("sh")).as("tok"))
    // global document frequency (shingles are distinct per doc)
    val tokDf = tokens.groupBy("tok").agg(count(lit(1)).as("tdf"))
    // rarest-first canonical order; prefix length = sz - ceil(t*sz) + 1
    val prefix = tokens.join(broadcast(tokDf), "tok")
      .groupBy("id", "sz")
      .agg(array_sort(collect_list(struct(col("tdf"), col("tok")))).as("ordered"))
      .select(col("id"), col("sz"),
        posexplode(slice(col("ordered"), lit(1),
          (col("sz") - ceilSafe(col("sz") * threshold) + 1).cast("int")))
          .as(Seq("pos", "p")))
      // per-row size bound (see the brute tier): the candidate join re-
      // evaluates its condition once per equi-matching row pair, so the
      // ceil(sz·t) arithmetic moves out of the join into this projection
      .select(col("id"), col("sz"), col("pos"), col("p.tok").as("tok"),
        ceilSafe(col("sz") * threshold).cast("long").as("lo"))
    // PPJoin positional filter: for a true pair, its FIRST shared token in
    // canonical order bounds the overlap by the suffix sizes from the match
    // (0-based pos → suffix incl. match = sz − pos); prune pairs where no
    // match can reach the required ⌈t/(1+t)·(|A|+|B|)⌉. Still a superset —
    // verification is exact.
    val minOverlap = ceilSafe((col("a.sz") + col("b.sz")) * (threshold / (1 + threshold)))
    // DENSITY-ADAPTIVE CANDIDATE BUDGET (opt-in): on adversarially dense
    // corpora — a small token universe, or replication-style mutation
    // where hot prefix tokens mix thousands of docs that are NOT
    // pairwise similar — the prefix join's evaluated-pair count
    // Σ_tok C(prefix-df(tok), 2) is the scale ceiling, not the
    // algorithm. With a budget set, that total is measured from a
    // deterministic doc SAMPLE (xxhash64(id)-bucketed, ≥20k docs; the
    // per-token pair count scales as p², so the sample total / p² is an
    // unbiased estimator — exact when the sample is the whole corpus)
    // against the prefix-token bucket histogram; when it exceeds the
    // budget the candidate GENERATOR escalates from single-token prefix
    // buckets to MinHash-LSH bands: a band key hashes 5 minhashes of the
    // WHOLE set, so dissimilar docs sharing one hot token no longer
    // collide — candidate volume tracks true near-dup density instead
    // of token density. Verification stays EXACT either way (precision
    // 1.0 always).
    //
    // SAMPLED-RECALL CONTRACT when the budget binds (logged + probed —
    // no silent caps): a pair at Jaccard exactly t is found with
    // probability ≥ (1 − (1 − t^5)^12) − 0.0013 (MinHash band-collision
    // theory minus the est-filter's 3σ one-sided tail; ≈0.990 at t=0.8,
    // and higher above t); below-budget corpora are byte-identical to
    // the exact prefix path — both spec-pinned in DedupSpec.
    val cands = {
      val exactCands = () => prefix.as("a").join(prefix.as("b"),
          col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
            col("b.sz") >= col("a.lo") &&
            col("a.sz") >= col("b.lo") &&
            (least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos"))
              >= minOverlap))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      resolveCandidateBudget(df.sparkSession, candidatePairBudget) match {
        case (None, _) => lastCapReport = None; exactCands()
        case (Some(budget), budgetSource) =>
          val spark2 = df.sparkSession
          import spark2.implicits._
          // tier decision from a sample: building the FULL prefix
          // relation (per-doc rarest-first sort) just to count it would
          // cost a large fraction of the exact join itself on the very
          // corpora that need the escape hatch. 5k docs is plenty: the
          // total is dominated by the hot-token buckets, so the summed
          // estimator's relative error is well under 1% at any corpus
          // size that can afford the exact path at all (measured 211.3e9
          // sampled vs 213.6e9 exact at 500k docs, 1-in-100)
          val sampleTarget = 5000L
          val invP = math.max(1L, nDocs / sampleTarget) // sample 1-in-invP
          val samplePrefix =
            if (invP == 1L) prefix
            else prefix.filter(pmod(xxhash64(col("id")), lit(invP)) === 0)
          val hist = samplePrefix.groupBy("tok").agg(count(lit(1)).as("c"))
            .groupBy("c").agg(count(lit(1)).as("m"))
            .as[(Long, Long)].collect()
          val total = (hist.iterator.map { case (c, m) =>
            m * (c * (c - 1) / 2.0) }.sum * invP * invP).toLong
          if (total <= budget) { lastCapReport = None; exactCands() }
          else {
            // 12 bands x 5 rows (k=60): sharper than the classic 16x4 —
            // on densely-similar corpora (every doc at J~0.5-0.7 of every
            // other, the adversarial shape that trips the budget) band
            // collision at sub-threshold J falls as J^r, so r=5 cuts the
            // noise bucket volume ~an order of magnitude while the
            // at-threshold recall bound stays >= 1-(1-t^5)^12 (0.991 at
            // t=0.8). A slack-margined signature-agreement filter INSIDE
            // the join condition (margin 3 sigma below t, sigma =
            // sqrt(t(1-t)/k) — one-sided tail <= 0.0013 at J=t) makes
            // sub-threshold bucket pairs die during condition evaluation
            // instead of materializing into the distinct.
            val (bands, r) = resolveLshShape(spark2, threshold)
            val k = bands * r
            val bandBound = 1.0 - math.pow(1.0 - math.pow(threshold, r), bands)
            val estTail = 0.0013
            val bound = bandBound - estTail
            val margin = math.max(0.0, threshold -
              3.0 * math.sqrt(threshold * (1 - threshold) / k) - 1.0 / k)
            val rep = CapReport(candidatesBefore = total, budget = budget,
              bands = bands, rowsPerBand = r,
              recallBoundAtThreshold = bound, source = budgetSource)
            lastCapReport = Some(rep)
            System.err.println(s"[graft] jaccardPairsGlobal: exact prefix " +
              s"join would evaluate $total candidate pairs (budget " +
              s"$budget from $budgetSource) — escalating the candidate generator to " +
              s"MinHash-LSH ($bands bands x $r rows, est-filter margin " +
              f"$margin%.3f); verification stays exact (precision 1.0), " +
              f"per-pair recall at J=$threshold >= $bound%.6f and higher " +
              "above it")
            // pin RAW text, not shingle arrays (see verifyJaccardRaw):
            // ~10× slimmer scratch and verify-join rows; signatures
            // shingle inline in one pass. DISK_ONLY — dedup scratch
            // must not hold heap (see escalatedLshPairs)
            val raw = df.select(col(idCol).as("id"), col(textCol).as("txt"))
              .localCheckpoint(eager = true,
                org.apache.spark.storage.StorageLevel.DISK_ONLY)
            val sigs = raw.select(col("id"), minhashSignature(
              sortedShingles(col("txt"), n), k).as("sig"))
            val pairs = escalatedLshPairs(sigs, bands, r, margin,
              blockKeyed = false,
              verify = verifyJaccardRaw(raw, n, threshold))
            // chunked mode materialized every verified chunk — the raw
            // pin is consumed; single-chunk mode still needs it
            if (resolveBandChunks(spark2, bands) > 1) raw.unpersist()
            return pairs
          }
      }
    }
    // Distinct BEFORE verification here — the opposite order from the LSH
    // paths, measured both ways: prefix candidates repeat per shared
    // prefix token (~2× here), and a candidate row is only 16 bytes of
    // ids, so deduplicating first halves the (relatively expensive)
    // merge-scan verifications for less than the verify-first variant
    // saves in shuffle. (A bitset-verify variant — dense token ids, pair
    // bitsets carried through the candidate join — was measured 2-3×
    // SLOWER here: when prefixes prune weakly the candidate join's row
    // WIDTH dominates, so skinny 16-byte candidates win; the bitset path
    // lives in jaccardPairsBlocked where rows pass through one block join.)
    verifyJaccard(docs, threshold)(cands)
  }

  /** How the candidate budget bound on the LAST budgeted
    * [[jaccardPairsGlobal]] plan built on this driver — the "no silent
    * caps" probe (specs assert it; the operator also logs one stderr
    * line). None when the budget was absent or did not bind.
    */
  @volatile var lastCapReport: Option[CapReport] = None

  /** `source` names where the binding budget came from — the session conf
    * or the caller's argument — so an escalation in the no-silent-caps
    * probe is attributable without a rebuild-time diff.
    */
  final case class CapReport(candidatesBefore: Long, budget: Long,
                             bands: Int, rowsPerBand: Int,
                             recallBoundAtThreshold: Double,
                             source: String = "arg")

  /** Session conf that overrides the caller's `candidatePairBudget`
    * argument on both Jaccard pair paths — a long, or `none`/`off` to
    * disable the budget entirely. Operators tune the exact↔LSH tradeoff
    * per session instead of rebuilding the jar.
    */
  val CandidateBudgetConf = "spark.graft.dedup.candidatePairBudget"

  /** LSH escalation shape knobs (k = bands × rowsPerBand minhashes).
    * Unset (the default), the shape is THRESHOLD-ADAPTIVE: see
    * [[resolveLshShape]].
    */
  val LshBandsConf = "spark.graft.dedup.lsh.bands"
  val LshRowsConf = "spark.graft.dedup.lsh.rowsPerBand"

  /** Minimum at-threshold recall the adaptive shape must bound
    * (default 0.9): [[resolveLshShape]] picks the sharpest (bands, rows)
    * split of k=60 minhashes whose band-collision bound
    * `1-(1-t^r)^b` minus the est-filter tail clears this.
    */
  val LshTargetRecallConf = "spark.graft.dedup.lsh.targetRecall"

  /** Band-group chunking for the budget-ESCALATED candidate joins:
    * `auto` (default, ~4 bands per chunk) | an int chunk count | `1` to
    * disable. Chunks run SEQUENTIALLY (each materialized before the next
    * starts), so the concurrent working set of the banded self-join +
    * pair distinct divides by the chunk count — the knob that sets the
    * suite's executor-memory floor. Output is byte-identical to
    * unchunked (spec-pinned): a pair colliding in two band groups
    * appears in both chunk outputs and the final dedup restores the
    * exact unchunked pair set.
    */
  val LshBandChunksConf = "spark.graft.dedup.lsh.bandChunks"

  private[graft] def resolveBandChunks(spark: SparkSession, bands: Int): Int = {
    val n = spark.conf.getOption(LshBandChunksConf).map(_.trim)
        .filterNot(v => v.isEmpty || v.equalsIgnoreCase("auto")) match {
      case Some(v) => v.toInt
      case None => (bands + 3) / 4 // ~4 bands per chunk
    }
    require(n >= 1, s"$LshBandChunksConf must be >= 1, got $n")
    math.min(n, bands)
  }

  /** Hot-bucket salt threshold for the banded SELF-joins: a (band,
    * bhash) bucket with more than this many members splits into
    * ~this-many-member sub-groups before the join (see
    * [[bandedCandidatePairs]]). `off`/`0` disables salting. Default
    * 8192: C(8192,2) ≈ 3.4e7 estimator evaluations per join cell, a
    * few seconds of one task — the straggler ceiling. Below the
    * threshold nothing changes shape, so organically-bucketed corpora
    * never pay the histogram broadcast's explode.
    */
  val SaltBucketRowsConf = "spark.graft.dedup.lsh.saltBucketRows"

  private[graft] def resolveSaltBucketRows(spark: SparkSession): Option[Long] =
    spark.conf.getOption(SaltBucketRowsConf).map(_.trim) match {
      case Some(v) if v.equalsIgnoreCase("off") || v == "0" => None
      case Some(v) =>
        val s = v.toLong
        require(s >= 2, s"$SaltBucketRowsConf must be >= 2 (or off/0), got $s")
        Some(s)
      case None => Some(8192L)
    }

  /** Catalyst-stats gate for the hot-bucket probe (bytes): corpora whose
    * banded relation estimates below this never pay the probe's
    * histogram job. Calibrated against the shipped fixtures' optimized
    * stats (sf0.1 ≈ 170 KB, 50k docs ≈ 2 MB, 500k docs ≈ 24 MB): the
    * default 8 MB engages from ~200k docs — below that the naive join's
    * worst case is seconds, above it an unprobed hot bucket is the
    * difference between 258 s and 1165 s (measured, 500k docs). `0`
    * probes always (the spec hook).
    */
  val SaltProbeMinBytesConf = "spark.graft.dedup.lsh.saltProbeMinBytes"

  /** Every unordered candidate pair the banded buckets admit, with the
    * pair's signature estimate, floor-filtered: the single-task-safe
    * replacement for the naive banded self-join
    * `banded.as("a").join(banded.as("b"), keys && a.id < b.id)`.
    *
    * The naive join's weakness at scale is the HOT bucket: every pair of
    * a bucket's m members enumerates inside ONE task (the bucket's key
    * lands in one shuffle partition — AQE's skew split cannot divide a
    * single key group's C(m,2) pair space), so one boilerplate cluster
    * of 10⁵ near-identical docs pins a core for hours while 31 idle.
    * Measured on the 5M-doc decade: a 680 s straggler inside the
    * estimator with the other 31 threads parked.
    *
    * Fix, in three stages so cold corpora pay nothing:
    *  1. GATE — skip everything when the banded relation's Catalyst
    *     size estimate is under [[SaltProbeMinBytesConf]] (suite-scale
    *     corpora keep the exact pre-salting plan, zero overhead).
    *  2. PROBE — one eager histogram job collects the buckets over
    *     [[SaltBucketRowsConf]] members (bounded: ≤ rows/S of them).
    *     Same eager-at-construction discipline as the candidate-budget
    *     probe. No hot buckets → the naive plan again; the probe job
    *     was the only cost.
    *  3. SALT — the driver-built hot list (tiny) broadcast-joins onto
    *     the banded rows (the in-plan histogram alternative would
    *     recompute the full signature pass per join side — measured 3×
    *     on a hot-free corpus). Hot members get a deterministic sub-id
    *     u = hash(id) mod g (g ≈ m/S) and the join runs per sub-group
    *     PAIR — the triangle cover: the left side replicates a member
    *     under cells (p=u, q=u..g−1), the right side under (p=0..u,
    *     q=u), so an unordered pair with sub-ids (u₁ ≤ u₂) meets in
    *     EXACTLY the (u₁, u₂) cell and each cell's ≈S×S pair space is
    *     its own shuffle key. Cold buckets keep g=1 (a single (0,0)
    *     cell — no replication). Pairs are canonicalized
    *     least/greatest since a p<q cell sees them in hash order, and
    *     the per-cell `p==q ⇒ id<id` guard dedups within-cell mirrors.
    *
    * Same admitted pair set, same estimates on every route
    * (spec-pinned salted == unsalted); the estimator floor applies
    * with the early-exit kernel
    * ([[graft.functions.VecKernels.sigEqFracGE]]). Measured at 500k
    * docs, 16×4 banding, t=0.5 (190.5M true pairs): naive 1165 s,
    * salted 258 s — the hot cells spread instead of straggling.
    */
  private[graft] def bandedCandidatePairs(banded: DataFrame,
      extraKeys: Seq[String], estFloor: Double): DataFrame = {
    val spark = banded.sparkSession
    val keyNames = extraKeys ++ Seq("band", "bhash")
    val keys = keyNames.map(col)
    def pairsOf(a: DataFrame, b: DataFrame, cellKeys: Seq[String],
                extraCond: Column): DataFrame =
      a.as("a").join(b.as("b"),
          cellKeys.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) &&
            extraCond)
        .select(least(col("a.id"), col("b.id")).as("id_a"),
          greatest(col("a.id"), col("b.id")).as("id_b"),
          graft.functions.VectorExpressions.sigEqFracGE(
            col("a.sig"), col("b.sig"), estFloor).as("est_jaccard"))
        .filter(col("est_jaccard") >= estFloor)
    // salting off / gated / hot-free: the naive self-join (id order IS
    // the canonical order, so least/greatest in pairsOf is a no-op)
    def naive = pairsOf(banded, banded, keyNames, col("a.id") < col("b.id"))
    resolveSaltBucketRows(spark) match {
      case None => naive
      case Some(s) =>
        val minBytes = spark.conf.getOption(SaltProbeMinBytesConf)
          .map(_.trim.toLong).getOrElse(8L << 20)
        if (banded.queryExecution.optimizedPlan.stats.sizeInBytes < minBytes)
          return naive
        val hotRows = banded.groupBy(keys: _*).count()
          .filter(col("count") > s).collect()
        if (hotRows.isEmpty) return naive
        val gs = hotRows.map(r =>
          math.ceil(r.getLong(keyNames.length).toDouble / s).toInt)
        println(s"[graft] bandedCandidatePairs: salting ${hotRows.length} " +
          s"hot bucket(s) over $s rows (max sub-groups ${gs.max}) — " +
          "triangle-cover cells replace single-task enumeration")
        val keySchema = org.apache.spark.sql.types.StructType(
          banded.select(keys: _*).schema.fields :+
            org.apache.spark.sql.types.StructField("__g",
              org.apache.spark.sql.types.IntegerType, nullable = false))
        val hotLocal = hotRows.toSeq.zip(gs).map { case (r, g) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq.init :+ g)
        }
        import scala.jdk.CollectionConverters._
        val hot = spark.createDataFrame(hotLocal.asJava, keySchema)
        val withU = banded.join(broadcast(hot), keyNames, "left")
          .withColumn("__g", coalesce(col("__g"), lit(1)))
          .withColumn("__u", pmod(xxhash64(col("id")), col("__g")).cast("int"))
        val aSide = withU.withColumn("__p", col("__u"))
          .withColumn("__q", explode(sequence(col("__u"), col("__g") - 1)))
        val bSide = withU.withColumn("__q", col("__u"))
          .withColumn("__p", explode(sequence(lit(0), col("__u"))))
        pairsOf(aSide, bSide, keyNames ++ Seq("__p", "__q"),
          col("a.__p") < col("a.__q") || col("a.id") < col("b.id"))
    }
  }

  /** The exact-verification tail both Jaccard pair paths share: attach
    * each candidate's shingle arrays from `base` (must carry (id, sh)),
    * compute exact Jaccard with the sorted merge-scan kernel, keep
    * `>= threshold`. Precision 1.0 by construction.
    */
  private def verifyJaccard(base: DataFrame, threshold: Double)
                           (cands: DataFrame): DataFrame =
    cands
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorExpressions
          .jaccardSortedGE(col("sh_a"), col("sh_b"), threshold).as("jac"))
      .filter(col("jac") >= threshold)

  /** The escalated tiers' verification tail, from RAW text: `base`
    * carries (id, txt) and the shingle arrays are recomputed INSIDE the
    * verify projection (same deterministic kernel — identical jac).
    * Rationale: per-doc shingle arrays are ~10× the raw text (every
    * n-gram repeats n characters plus array overhead), and the verify
    * joins shuffle base rows per candidate — at the 5M-doc decade the
    * shingle-pinned variant's scratch (pin + two SMJ sorts of wide
    * rows) exhausted local disk, while shingling twice per VERIFIED
    * candidate is codegen-cheap and proportional to the (small)
    * candidate count.
    */
  private def verifyJaccardRaw(base: DataFrame, n: Int, threshold: Double)
                              (cands: DataFrame): DataFrame =
    cands
      .join(base.select(col("id").as("id_a"), col("txt").as("t_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("txt").as("t_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorExpressions.jaccardSortedGE(
          sortedShingles(col("t_a"), n), sortedShingles(col("t_b"), n),
          threshold).as("jac"))
      .filter(col("jac") >= threshold)

  /** Shared escalated tier both budget-escalated paths run: the banded
    * self-join + per-chunk EXACT verification, band-chunked per
    * [[LshBandChunksConf]]. Two measured 100× pathologies motivate the
    * chunking, and both divide by the chunk count:
    *  - the unchunked banded join's per-task working set (hot-band
    *    bucket pairs streaming through the candidate distinct) was the
    *    per-suite MEMORY floor (executor OOM at 20 g);
    *  - the verification join shuffles each candidate's shingle arrays
    *    (~KBs per row), so verifying the full candidate set in one job
    *    was the per-suite DISK floor (spill exhaustion at the
    *    recall-raising 20×3 shape, whose noisier bands admit ~3× the
    *    candidates of 12×5).
    * Each chunk is verified and materialized (eager localCheckpoint =
    * the sequencing point) before the next starts, so the concurrent
    * working set — heap AND spill — is one chunk's; verified pairs are
    * tiny. A pair colliding in two band groups verifies in both chunks
    * (same exact jac) and the final dedup restores exactly the
    * unchunked pair set — spec-pinned in DedupSpec.
    */
  /** Banded explode over minhash signatures for bands [lo, hi): one row
    * per (id, band) with `bhash` = hash of the band's signature slice,
    * seeded by the TRUE band index — so a chunk's (band, bhash) keys are
    * exactly the unchunked keys restricted to its bands. Shared by
    * [[escalatedLshPairs]] and the plan-capture tool
    * (graft.tools.ExplainDedupStages) so committed stage plans are
    * constructed by the same code path that runs in production.
    */
  private[graft] def bandedExplode(src: DataFrame, r: Int, lo: Int, hi: Int,
                                   extraCols: Seq[String] = Nil): DataFrame = {
    val keep = Seq(col("id"), col("sig")) ++ extraCols.map(col)
    src.select(keep :+ posexplode(array((lo until hi).map(bd =>
        hash(slice(col("sig"), bd * r + 1, r), lit(bd))): _*))
      .as(Seq("band", "bhash")): _*)
  }

  private def escalatedLshPairs(sigs: DataFrame, bands: Int, r: Int,
                                margin: Double, blockKeyed: Boolean,
                                verify: DataFrame => DataFrame): DataFrame = {
    val spark = sigs.sparkSession
    val k = bands * r
    val nChunks = resolveBandChunks(spark, bands)
    def bandedOf(src: DataFrame, lo: Int, hi: Int): DataFrame =
      bandedExplode(src, r, lo, hi,
        extraCols = if (blockKeyed) Seq("blk") else Nil)
    // hot-bucket-salted banded self-join (see bandedCandidatePairs): a
    // boilerplate cluster's bucket must not pin one task on C(m,2)
    // estimator evaluations while the rest of the executor idles
    def candsOf(banded: DataFrame): DataFrame =
      bandedCandidatePairs(banded,
          if (blockKeyed) Seq("blk") else Nil, margin)
        .select(col("id_a"), col("id_b"))
        .distinct()
    // DISK_ONLY scratch: the escalated tier runs on exactly the corpora
    // big enough to trip the budget, inside suites whose earlier queries
    // already hold heap — its pinned relations (shingled docs, k-long
    // signatures, candidate ids) must not compete for executor heap with
    // its own sorts. Local-disk reads re-deserialize, a cost the chunk
    // structure amortizes (each pin is read ≤ 2× per chunk).
    val scratch = org.apache.spark.storage.StorageLevel.DISK_ONLY
    if (nChunks <= 1) verify(candsOf(bandedOf(sigs, 0, bands)))
    else {
      // signatures materialized ONCE (narrow: id + k longs); each chunk
      // re-explodes only ITS bands from the pinned relation
      val pinned = sigs.localCheckpoint(eager = true, scratch)
      val bounds = (0 to nChunks).map(i => i * bands / nChunks)
      // every candidate verifies EXACTLY once across chunks: chunk i
      // anti-joins its candidates against all earlier chunks' (a skinny
      // 16-byte-row join) before paying the wide verification — without
      // this a high-J pair colliding in every band would verify once
      // per chunk (measured 14× wall blowup at 100×)
      var seen: DataFrame = null
      val freshPins = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      val out = (0 until nChunks).map { i =>
        val c = candsOf(bandedOf(pinned, bounds(i), bounds(i + 1)))
        val fresh = (if (seen == null) c
                     else c.join(seen, Seq("id_a", "id_b"), "left_anti"))
          .localCheckpoint(eager = true, scratch)
        freshPins += fresh
        seen = if (seen == null) fresh else seen.unionByName(fresh)
        val v = verify(fresh).localCheckpoint(eager = true, scratch)
        // reap chunk i's shuffle files BEFORE chunk i+1 writes its own:
        // the checkpoint above dropped the last references to this
        // chunk's shuffle dependencies, but the ContextCleaner only
        // deletes the files after a driver GC notices — left to the
        // default periodic GC, nChunks × tens-of-GB of dead shuffle
        // accumulates and exhausts local disk at the 5M-doc decade
        System.gc()
        v
      }.reduce(_ unionByName _)
      // fresh sets are disjoint by construction — the union IS the
      // verified pair set of the unchunked run, no final dedup needed.
      // Everything below fed only the (now-materialized) verified
      // chunks: release the scratch blocks eagerly rather than holding
      // disk until the Datasets are GC'd
      freshPins.foreach(_.unpersist())
      pinned.unpersist()
      out
    }
  }

  /** (effective budget, source label): conf beats argument. */
  private[graft] def resolveCandidateBudget(spark: SparkSession,
      arg: Option[Long]): (Option[Long], String) =
    spark.conf.getOption(CandidateBudgetConf) match {
      case Some(v) if v.equalsIgnoreCase("none") || v.equalsIgnoreCase("off") =>
        (None, s"conf:$CandidateBudgetConf=$v")
      case Some(v) => (Some(v.trim.toLong), s"conf:$CandidateBudgetConf")
      case None => (arg, "arg")
    }

  /** The escalated tiers' (bands, rowsPerBand). Explicit confs win;
    * otherwise THRESHOLD-ADAPTIVE: pick the LARGEST r (steepest
    * S-curve — at equal recall, larger r admits strictly fewer
    * sub-threshold collisions) whose minimal band count
    * `b_min = ⌈ln(1−target−tail)/ln(1−t^r)⌉` keeps the signature
    * budget k = r·b ≤ 128 minhashes; bands never drop below the k=60
    * divisor default ⌊60/r⌋, so high thresholds keep their sharper
    * established shapes. Examples at the default target 0.9:
    * t=0.8 → 12×5 (k=60, bound 0.990 — the classic shape, unchanged);
    * t=0.6 → 17×4 (k=68, bound 0.904) — where 12×5 bounds only 0.62
    * and loses a third of true pairs; t=0.5 → 20×3 (k=60, bound
    * 0.930). Sub-threshold noise beyond the bands is held by the
    * in-join est filter, which margins on the FULL k-minhash signature.
    */
  private[graft] def resolveLshShape(spark: SparkSession,
                                     threshold: Double): (Int, Int) = {
    (spark.conf.getOption(LshBandsConf).map(_.trim.toInt),
     spark.conf.getOption(LshRowsConf).map(_.trim.toInt)) match {
      case (Some(bands), Some(r)) =>
        require(bands >= 1 && r >= 1,
          s"$LshBandsConf/$LshRowsConf must be >= 1, got bands=$bands rows=$r")
        (bands, r)
      case (b, ro) =>
        require(b.isEmpty && ro.isEmpty,
          s"$LshBandsConf and $LshRowsConf must be set together (or neither)")
        val target =
          spark.conf.getOption(LshTargetRecallConf).map(_.trim.toDouble)
            .getOrElse(0.9)
        val estTail = 0.0013
        val need = math.min(target + estTail, 0.999999)
        (5 to 1 by -1).iterator.map { r =>
          val tr = math.pow(threshold, r)
          val bMin =
            if (tr >= 1.0) 1
            else math.max(1, math.ceil(
              math.log(1.0 - need) / math.log(1.0 - tr)).toInt)
          (math.max(bMin, 60 / r), r)
        }.find { case (bands, r) => bands * r <= 128 }
          .getOrElse((60, 1)) // r=1 maximizes the bound; take it even short
    }
  }

  /** Token-universe cap for the bitset verification path: ⌈U/64⌉ longs per
    * doc (32768 → 4 KB) — past that, per-doc bitsets cost more to shuffle
    * than they save in verification, and the diverse universe makes string
    * prefixes selective anyway.
    */
  val MaxBitsetUniverse: Long = 32768L

  /** Corpus-size cap for the brute-force tier of [[jaccardPairsGlobal]]:
    * 10k docs → ≤50M size-band checks, mostly rejected before any popcount
    * — cheaper than the prefix join's explode/shuffle/distinct pipeline.
    * Past this, quadratic growth loses to the prefix filter no matter how
    * cheap the per-pair verify is.
    */
  val BruteForceMaxDocs: Long = 10000L

  /** Exact Jaccard pairs WITHIN a blocking column (all pairs per block,
    * verified exactly) — the shape for corpora with a natural partition key
    * (source, shard, near-dup cluster id). Uses the same adaptive
    * verification as [[jaccardPairsGlobal]]: dense-id bitsets when the
    * token universe fits a dictionary, sorted merge-scan otherwise.
    */
  def jaccardPairsBlocked(df: DataFrame, idCol: String, textCol: String,
                          blockCol: String, n: Int = 3,
                          threshold: Double = 0.6,
                          maxBitsetUniverse: Long = MaxBitsetUniverse,
                          candidatePairBudget: Option[Long] = None): DataFrame = {
    val docs = ScanSpread.spread(df.select(col(idCol).as("id"),
        col(blockCol).as("blk"), col(textCol).as("__t")), col("id"))
      .select(col("id"), col("blk"), sortedShingles(col("__t"), n).as("sh"))
    // CANDIDATE BUDGET (opt-in), the blocked twin of the global path's:
    // within-block all-pairs is quadratic in the block size BY SEMANTICS,
    // so on a corpus whose blocks grow with it the evaluated-pair total
    // Σ_blk C(n_blk, 2) is the scale ceiling. Unlike the global prefix
    // path the total here is EXACT and one cheap distributed aggregate
    // (block histogram), no sampling. Over budget, the candidate
    // GENERATOR escalates to MinHash-LSH bands WITHIN blocks (band key =
    // (blk, band, bhash)) with exact verification — precision 1.0, the
    // same logged sampled-recall contract (≥ 1-(1-t^5)^12 − est tail at
    // J = t), no silent caps.
    val (overBudget, smallPin) = resolveCandidateBudget(df.sparkSession,
        candidatePairBudget) match {
      case (None, _) => lastCapReport = None; (false, None)
      case (Some(budget), budgetSource) =>
        // null-keyed rows never join (`a.blk === b.blk` skips nulls), so
        // the histogram must not count their pseudo-block toward the
        // exact-tier cost — it would force a recall-losing escalation on
        // a corpus whose REAL evaluated-pair total is under budget
        val row = docs.filter(col("blk").isNotNull)
          .groupBy("blk").agg(count(lit(1)).as("c"))
          .agg(sum((col("c") * (col("c") - lit(1)) / 2).cast("long")).as("t"),
            sum(col("c")).as("nd"))
          .first()
        val total = if (row.isNullAt(0)) 0L else row.getLong(0)
        if (total <= budget) {
          lastCapReport = None
          // bounded corpus under budget: pin the shingled joinable rows
          // ONCE — the universe probes and the bitset attachment below
          // would each re-run the scan + shingle kernel otherwise, and at
          // this size the per-pass fixed cost is a measurable fraction of
          // the query. Dropping null-block rows here is exact: they can
          // never satisfy `a.blk === b.blk`. Unbounded corpora never pin.
          val nd = if (row.isNullAt(1)) 0L else row.getLong(1)
          val pin = if (nd <= BruteForceMaxDocs)
            Some(docs.filter(col("blk").isNotNull).localCheckpoint())
          else None
          (false, pin)
        }
        else {
          val (bands, r) = resolveLshShape(df.sparkSession, threshold)
          val k = bands * r
          val bound = 1.0 - math.pow(1.0 - math.pow(threshold, r), bands) - 0.0013
          lastCapReport = Some(CapReport(candidatesBefore = total,
            budget = budget, bands = bands, rowsPerBand = r,
            recallBoundAtThreshold = bound, source = budgetSource))
          System.err.println(s"[graft] jaccardPairsBlocked: per-block " +
            s"all-pairs would evaluate $total candidate pairs (budget " +
            s"$budget from $budgetSource) — escalating the candidate " +
            s"generator to within-block MinHash-LSH ($bands bands x $r " +
            f"rows); verification stays exact (precision 1.0), per-pair " +
            f"recall at J=$threshold >= $bound%.6f and higher above it")
          (true, None)
        }
    }
    if (overBudget) {
      val (bands, r) = resolveLshShape(df.sparkSession, threshold)
      val k = bands * r
      val margin = math.max(0.0, threshold -
        3.0 * math.sqrt(threshold * (1 - threshold) / k) - 1.0 / k)
      // one execution per side, like the bitset tier: the signature pass
      // and BOTH verification joins would otherwise re-run the full
      // corpus source scan — two extra passes on precisely the corpora
      // big enough to trip the budget. RAW text, DISK_ONLY: see
      // verifyJaccardRaw / escalatedLshPairs
      val raw = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
          col(textCol).as("txt"))
        .localCheckpoint(eager = true,
          org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val sigs = raw.select(col("id"), col("blk"), minhashSignature(
        sortedShingles(col("txt"), n), k).as("sig"))
      val pairs = escalatedLshPairs(sigs, bands, r, margin, blockKeyed = true,
        verify = verifyJaccardRaw(raw, n, threshold))
      if (resolveBandChunks(df.sparkSession, bands) > 1) raw.unpersist()
      return pairs
    }
    // size-band rejection shared by both exact tiers: |A∩B| ≤ min sizes,
    // so J ≥ t needs b.sz ≥ ⌈a.sz·t⌉ (and symmetrically) — two long
    // compares per evaluated pair, precomputed per ROW as `lo` (the join
    // condition runs O(block²) times; see the global brute tier)
    val sizeBand = col("b.sz") >= col("a.lo") && col("a.sz") >= col("b.lo")
    val pairsOf: (DataFrame, Column) => DataFrame = (sides, jac) => {
      val banded = sides.withColumn("lo",
        ceilSafe(col("sz") * threshold).cast("long"))
      banded.as("a").join(banded.as("b"),
          col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
            sizeBand)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"), jac.as("jac"))
        .filter(col("jac") >= threshold)
    }
    // Sampled lower-bound pre-probe: a token universe is never smaller
    // than a 1000-doc sample's, so when even the sample overflows the cap
    // the full-corpus distinct aggregation (a whole extra pass at 100 TB)
    // is skipped and the merge-scan path starts immediately.
    val exactIn = smallPin.getOrElse(docs)
    val sampleUniverse = exactIn.limit(1000)
      .select(explode(col("sh")).as("tok")).distinct().count()
    if (sampleUniverse <= maxBitsetUniverse) {
      val toks = exactIn.select(explode(col("sh")).as("tok")).distinct().persist()
      val universe = toks.count()
      if (universe <= maxBitsetUniverse) {
        // dictionary collected once (bounded by the cap); block rows carry
        // ⌈U/64⌉-word bitsets instead of full shingle arrays, and the
        // per-pair verify is popcounts — see jaccardPairsGlobal.
        // localCheckpoint: the block self-join would otherwise execute the
        // explode→dict-join→groupBy pipeline once per side.
        val withBits = attachBitsets(exactIn, Seq("id", "blk"), toks, universe)
          .select(col("id"), col("blk"), size(col("ids")).as("sz"), col("bits"))
          .localCheckpoint()
        smallPin.foreach(_.unpersist())
        return pairsOf(withBits,
          graft.functions.VectorExpressions.bitsetJaccard(col("a.bits"), col("b.bits")))
      }
      toks.unpersist()
    }
    pairsOf(exactIn.withColumn("sz", size(col("sh"))),
      graft.functions.VectorExpressions
        .jaccardSortedGE(col("a.sh"), col("b.sh"), threshold))
  }

  // ------------------------------------------------------------- SimHash
  /** 64-bit SimHash over a token array: per-token xxhash64 (seed 42, same
    * as Spark's builtin), per-bit ±1 votes, sign → bit — one native
    * expression pass ([[graft.functions.VectorExpressions.SimHash64]]).
    */
  def simhash(tokensCol: Column): Column =
    graft.functions.VectorExpressions.simhash64(tokensCol)

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on `maxDistance + 1` contiguous bit
    * slices of the 64-bit hash — a pair differing in ≤ `maxDistance` bits
    * can touch at most `maxDistance` slices, so at least one slice matches
    * exactly (pigeonhole), guaranteeing full recall. Then verify exact
    * Hamming distance. Same shuffle discipline as MinHash-LSH.
    *
    * Scale note: slice width is 64/(d+1) bits, so the blocking key has
    * ~2^(64/(d+1)) distinct values — for large d on a billion-doc corpus
    * the buckets grow quadratic-costly, and the Manku-et-al. scheme
    * (block on (B−d)-subsets of B>d+1 slices) trades explode factor
    * C(B,d) for narrower buckets. At d ≤ 8 single-slice blocking holds.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDistance: Int = 3): DataFrame = {
    require(maxDistance >= 0 && maxDistance < 32,
      s"maxDistance must be in [0, 32), got $maxDistance")
    val slices = hashSlices(maxDistance + 1)
    simhashBlockedPairs(df, idCol, textCol, maxDistance,
      (0 until maxDistance + 1).map(slices))
  }

  /** `nBlocks` contiguous bit slices of the `sh` column, widths balanced
    * (the first 64 % nBlocks slices one bit wider).
    */
  private def hashSlices(nBlocks: Int): Int => Column = {
    val widths = Array.tabulate(nBlocks)(i => 64 / nBlocks + (if (i < 64 % nBlocks) 1 else 0))
    val starts = widths.scanLeft(0)(_ + _)
    // JVM shifts mask the count mod 64, so a full-width slice (d=0 →
    // one 64-bit block) needs an explicit all-ones mask: (1L<<64)-1 is 0
    def sliceMask(w: Int): Long = if (w == 64) -1L else (1L << w) - 1
    q => shiftrightunsigned(col("sh"), starts(q))
      .bitwiseAND(lit(sliceMask(widths(q))))
  }

  /** Shared candidate-generation tail for both simhash blocking schemes:
    * per-row `keys` explode → self-equi-join on (key index, key value) →
    * exact hamming verify BEFORE dedup (same shuffle discipline as
    * minhashLshPairs: only surviving 20-byte rows reach dropDuplicates).
    */
  private def simhashBlockedPairs(df: DataFrame, idCol: String, textCol: String,
                                  maxDistance: Int, keys: Seq[Column]): DataFrame = {
    val withHash = ScanSpread.spread(
        df.select(col(idCol).as("id"), col(textCol).as("__t")), col("id"))
      .select(col("id"), simhash(TextOps.tokens(col("__t"))).as("sh"))
    val blocked = withHash.select(col("id"), col("sh"),
      posexplode(array(keys: _*)).as(Seq("q", "block")))
    blocked.as("a").join(blocked.as("b"),
        col("a.q") === col("b.q") && col("a.block") === col("b.block") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.sh"), col("b.sh")).as("hamming"))
      .filter(col("hamming") <= maxDistance)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "hamming")
  }

  // ------------------------------------------------------------- edit distance
  /** EXACT edit-distance ≤ 1 similarity self-join via FastSS deletion
    * neighborhoods (Bocek et al., 2007): each string's blocking keys are
    * itself plus every 1-deletion variant. Any pair within Levenshtein 1
    * provably shares a key (substitution at i → both i-deletions match;
    * insertion/deletion → the longer's variant equals the shorter itself;
    * equality → the identity key), so recall is total and the builtin
    * `levenshtein` verify only ever REMOVES false candidates.
    *
    * Why not PassJoin-style segment blocking: with a shared long prefix
    * (id-like strings — the common dedup case) the prefix segment puts
    * EVERY row in one bucket and the join degenerates quadratic. Deletion
    * variants stay discriminative: a bucket holds only strings one edit
    * from a specific 17-char core. Explode factor is len+1 keys per row;
    * join shuffles 16-byte (id, key-hash) pairs.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val s = col(strCol)
    // Key on each deletion variant's 64-bit hash, not the variant string:
    // the explode+join then moves fixed 8-byte keys instead of len-char
    // strings (which for long inputs would re-materialize ~len²/2 bytes
    // per row). A hash collision only ADDS a false candidate, and the
    // exact levenshtein verify removes it — recall is untouched. The seed
    // is constant so a length-L string's i-th variant and a length-(L−1)
    // string's identity variant still collide when equal.
    // i = 0..len: delete char at position i+1; i = len yields the identity
    val src = ScanSpread.spread(df.select(col(idCol), col(strCol)), col(idCol))
    val keyed = src.select(col(idCol).as("id"), s.as("s"),
      explode(array_distinct(expr(
        s"transform(sequence(0, length($strCol)), i -> " +
          s"xxhash64(concat(substring($strCol, 1, i), substring($strCol, i + 2, length($strCol)))))")))
        .as("k"))
    // verify BEFORE dedup (simhashBlockedPairs discipline): only surviving
    // (id, id, dist) triples reach the dropDuplicates shuffle, not strings.
    // The verify is the specialized O(len) greedy `graft_edit_dist_le1`
    // (exact at distance ≤ 1, allocation-free), not the banded levenshtein
    // DP — the verify runs once per candidate pair, and on ~1M candidates
    // the DP was the measured dominant cost (2.3 s of a 5.8 s query at
    // sf0.1; the greedy cuts it ~10×). Differentially spec'd against
    // Spark's levenshtein in DedupSpec.
    keyed.as("a").join(keyed.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.functions.VectorExpressions.editDistLe1(col("a.s"), col("b.s")).as("dist"))
      .filter(col("dist") >= 0)
      .dropDuplicates("id_a", "id_b")
  }
}
