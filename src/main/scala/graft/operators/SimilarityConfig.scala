package graft.operators

/** Per-deployment tuning for the near-duplicate / similarity suite.
  *
  * Round-1 thresholds were chosen against the synthetic corpus's
  * similarity distribution (SURVEY.md §7b); a real deployment tunes
  * them per corpus. The `Default` instance IS the round-1 geometry —
  * every SQL oracle twin is written against it, so registered queries
  * must keep using `Default` (custom configs are for library users and
  * are spec-tested against operator invariants instead).
  *
  * Band geometry is the candidate-admission knob (for correlated short
  * documents the Hamming/Jaccard distributions compress, so WIDER bands,
  * not tighter thresholds, control the candidate volume — measured in
  * SURVEY.md §7a); the taus are the final verification gates.
  */
final case class SimilarityConfig(
    /** MinHash signature length (= bands * rows). */
    minhashK: Int = 16,
    /** LSH bands over the MinHash signature. */
    minhashBands: Int = 4,
    /** Hashes per band. P(candidate) = 1-(1-J^rows)^bands. */
    minhashRows: Int = 4,
    /** Exact-Jaccard verification threshold after MinHash blocking. */
    minhashTau: Double = 0.5,
    /** Word-shingle width feeding MinHash. */
    shingleWidth: Int = 3,
    /** SimHash bands (bands * bandBits <= 48 signature bits). */
    simhashBands: Int = 3,
    /** Bits per SimHash band. */
    simhashBandBits: Int = 16,
    /** Max Hamming distance admitted as a near-dup. */
    simhashMaxHamming: Int = 3,
    /** Character-shingle width for n-gram Jaccard. */
    ngramWidth: Int = 4,
    /** MinHash permutations for standalone char-level blocking. UNUSED
      * by the registered queries since round 2: few-perm char blocking
      * admitted ~26% of all pairs on same-vocab corpora (measured —
      * see Dedup.dedupNgramJaccard), so n-gram verification now rides
      * the word-LSH band blocking. Kept for library users who need a
      * purely character-level pipeline.
      */
    ngramPerms: Int = 2,
    /** n-gram Jaccard verification threshold. */
    ngramTau: Double = 0.8,
    /** Embedding-cosine near-dup threshold. */
    embeddingTau: Double = 0.4,
    /** Band-bucket density cap for the embedding-cosine candidate join
      * (pairs-per-bucket discipline, the winnowing df-cap's twin): a
      * (band_id, band_key) bucket holding more than this many vectors
      * stops generating all-pairs candidates and degrades to exact
      * FULL-signature matching inside the bucket — candidate mass stays
      * <= cap * 8N + clone-pair mass instead of Sum(bucket^2), which is
      * quadratic in corpus density at the fixed 8-bit bucket universe
      * (2,036 live buckets measured; see Dedup.dedupEmbeddingCosine).
      * Semantic near-dups in corpora dense enough to saturate every
      * bucket belong to dedup_semantic's centroid blocking instead.
      */
    embBucketCap: Int = 256,
    /** Containment (|A∩B| / min set size) admission threshold. */
    containTau: Double = 0.5,
    /** Max Levenshtein distance relative to the longer text. */
    editRelTau: Double = 0.1,
    /** IVF coarse-centroid count (corpus-independent). */
    ivfK: Int = 16,
    /** Exact-integer Lloyd refinement iterations. */
    ivfIters: Int = 2,
    /** Inverted lists probed per query. */
    ivfProbe: Int = 2) {
  require(minhashK == minhashBands * minhashRows,
    s"minhashK ($minhashK) must equal bands*rows " +
      s"(${minhashBands}*${minhashRows})")
  require(simhashBands * simhashBandBits <= 48,
    "SimHash band geometry exceeds the 48-bit signature")
  require(ivfK >= 1 && ivfIters >= 0 && ivfProbe >= 1 && ivfProbe <= ivfK,
    "IVF geometry invalid (need K >= 1, iters >= 0, 1 <= probe <= K)")
  require(embBucketCap >= 1, "embBucketCap must be >= 1")
}

object SimilarityConfig {
  /** The oracle-verified round-1 geometry. */
  val Default: SimilarityConfig = SimilarityConfig()
}
