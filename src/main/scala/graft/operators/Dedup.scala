package graft.operators

import graft.Q
import graft.functions.Text._
import graft.functions.Vectors._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite for LLM-training-data curation over `documents` /
  * `embeddings` — exact hash dedup, MinHash+LSH, SimHash, char-n-gram
  * Jaccard, and embedding-cosine near-dup.
  *
  * Scale shape (100 TB, SURVEY.md §6): every method is
  *   per-row signature (map-only, codegen'd array exprs)
  *   -> equi-shuffle-join on compact bucket keys (AQE splits skewed
  *      buckets)
  *   -> per-pair verification (map-side arithmetic on exact ints).
  * Nothing touches the driver; candidate cardinality is controlled by
  * band/row parameters, not data size. All hashes are md5-over-string so
  * results are engine-portable and re-run-stable (SURVEY.md §5).
  */
object Dedup {

  /** Exact content dedup: group by md5(text), survivor = min(doc_id).
    * The md5 group key (not raw text) keeps shuffle rows narrow — at
    * 100 TB you shuffle 32-byte keys, never document bodies.
    */
  def dedupExactHash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .groupBy("h")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("h")

  val dedupExactHashSql: String =
    """SELECT md5(text) AS h, min(doc_id) AS keep_id, COUNT(*) AS n_copies
       FROM documents GROUP BY 1 ORDER BY h"""

  /** Token-sort exact dedup — [[dedupExactHash]] on the SORTED token
    * multiset instead of the byte stream: catches duplicates whose
    * sentences or list items were reordered by a template engine
    * (byte-identical content in a different order — zero edit overlap
    * for the exact hash, trivially caught here) while staying exactly
    * as cheap: one per-row sort+join+md5 projection (all codegen
    * built-ins — no shingling, no pair join), one hash-keyed
    * aggregate with min-id survivor. The ordering the two engines
    * share is binary/lexicographic on ASCII tokens — the same
    * contract every md5 string key here already rides. Scale:
    * identical to dedup_exact_hash — map-side projection, one
    * shuffle on the 32-hex key. (round 9)
    */
  def dedupTokenSort(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(array_join(array_sort(toks(col("text"))), " ")).as("h"))
      .groupBy("h")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("h")

  val dedupTokenSortSql: String =
    s"""SELECT md5(array_to_string(list_sort(${sqlToks("text")}), ' ')) AS h,
              min(doc_id) AS keep_id, COUNT(*) AS n_copies
       FROM documents GROUP BY 1 ORDER BY h"""

  /** Winnowing parameters (Schleimer, Wilkerson & Aiken, SIGMOD'03 —
    * the MOSS fingerprinting scheme): word-k-gram width, window size w
    * (any shared run of ≥ w + k − 1 tokens is GUARANTEED to share a
    * fingerprint — the winnowing coverage theorem), the document-
    * frequency cap that drops boilerplate fingerprints before the
    * pair join, and the shared-fingerprint floor for reporting a pair.
    */
  val WinnowK = 3
  val WinnowW = 4
  val WinnowMaxDf = 8
  val WinnowMinShared = 2

  /** The per-doc winnowing fingerprint set: md5 k-gram hashes, the
    * minimum of every w-window kept, consecutive duplicates collapsed
    * by DISTINCT (position is irrelevant once the SET is the output —
    * with md5 hashes ties are negligible and the selected VALUES are
    * convention-free, which is what keeps the two engines identical).
    * Docs shorter than one window keep their global minimum (the
    * clamped pos-0 window). Per-doc windows partition by doc_id —
    * document-length-bounded, never corpus-bounded.
    */
  private def winnowFingerprints(s: SparkSession, dir: String): DataFrame =
    winnowFrom(Tables.documents(s, dir))

  /** Core over any (doc_id, text) frame (spec hand-checks coverage).
    *
    * Window selection is ARRAY-SIDE (round 15, guide §2.4 — was
    * posexplode + two doc_id-partitioned windows, which shuffled and
    * sorted the full k-gram hash stream just to regroup rows that
    * STARTED in one row per document): the per-doc hash sequence
    * stays an array, each kept position p (p ≤ n−w, plus the clamped
    * pos-0 window of a short doc) takes array_min over its w-slice —
    * the same clamped minima the rowsBetween window computed — and
    * array_distinct collapses the selected set before the single
    * explode. The whole fingerprint derivation is now one map-side
    * projection: zero exchanges before the pair stage (the old form
    * paid one corpus-stream exchange + sort + a distinct exchange).
    * Same md5 prefixes, same min over the same windows, same distinct
    * set per doc — bit-identical fingerprints.
    */
  private[graft] def winnowFrom(docs: DataFrame): DataFrame = {
    val hs = transform(wordShingles(toks(col("text")), WinnowK),
      sh => substring(md5(sh), 1, 16))
    docs
      .select(col("doc_id"), hs.as("hs"))
      .select(col("doc_id"),
        explode(array_distinct(transform(
          filter(sequence(lit(0), size(col("hs")) - 1),
            p => p <= size(col("hs")) - WinnowW || p === 0),
          p => array_min(slice(col("hs"), p + 1, lit(WinnowW))))))
          .as("fp"))
  }

  /** DuckDB twin of [[winnowFingerprints]] as WITH-clause CTEs ending
    * in `fp(doc_id, fp)`. */
  private val sqlWinnowCtes: String = {
    val (k, w) = (WinnowK, WinnowW)
    s"""kg AS (SELECT doc_id, i - 1 AS pos,
                      substr(md5(array_to_string(tk[i:i+${k - 1}], ' ')),
                             1, 16) AS h,
                      greatest(len(tk) - ${k - 1}, 1) AS np
               FROM (SELECT doc_id, tk,
                       unnest(generate_series(1,
                         greatest(len(tk) - ${k - 1}, 1))) AS i
                     FROM (SELECT doc_id, ${sqlToks("text")} AS tk
                           FROM documents))),
       wm AS (SELECT doc_id, pos, np,
                     MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING)
                       AS wmin
              FROM kg),
       fp AS (SELECT DISTINCT doc_id, wmin AS fp
              FROM wm WHERE pos <= np - $w OR pos = 0)"""
  }

  /** Per-document winnowing fingerprint profile — the MOSS scheme's
    * selection statistics (expected density 2/(w+1): a doc whose
    * density is far off is pathological text, and the fingerprint
    * count is the unit of work [[dedupWinnowing]] joins on). One
    * per-row k-gram projection, doc-partitioned window minima, one
    * doc-cardinality aggregate. (round 7)
    */
  def fingerprintWinnowing(s: SparkSession, dir: String): DataFrame = {
    val nk = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(wordShingles(toks(col("text")), WinnowK)).cast("long")
          .as("n_kgrams"))
    val nf = winnowFingerprints(s, dir)
      .groupBy("doc_id").agg(count(lit(1)).as("n_fingerprints"))
    nk.join(nf, Seq("doc_id")) // every doc yields ≥ 1 k-gram and ≥ 1 fp
      .select(col("doc_id"), col("n_kgrams"), col("n_fingerprints"),
        (col("n_fingerprints").cast("double")
          / col("n_kgrams").cast("double")).as("density"))
      .orderBy("doc_id")
  }

  val fingerprintWinnowingSql: String =
    s"""WITH $sqlWinnowCtes,
       nk AS (SELECT doc_id,
                     CAST(greatest(len(${sqlToks("text")}) - ${WinnowK - 1},
                                   1) AS BIGINT) AS n_kgrams
              FROM documents),
       nf AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fingerprints
              FROM fp GROUP BY 1)
       SELECT k.doc_id, k.n_kgrams, f.n_fingerprints,
              CAST(f.n_fingerprints AS DOUBLE)
                / CAST(k.n_kgrams AS DOUBLE) AS density
       FROM nk k JOIN nf f ON k.doc_id = f.doc_id
       ORDER BY k.doc_id"""

  /** Winnowing-based near-dup candidate pairs — MOSS's second half:
    * docs sharing ≥ [[WinnowMinShared]] selected fingerprints, via an
    * equi-join on the fingerprint hash. Fingerprints with document
    * frequency > [[WinnowMaxDf]] are dropped FIRST (boilerplate
    * k-grams — the same rarest-first discipline as
    * [[dedupPrefixFilter]]'s prefixes), so no fingerprint ever fans
    * out more than C(maxDf, 2) pairs and the join is blocking-bounded,
    * never corpus². The coverage theorem makes this a guarantee-backed
    * blocking scheme: two docs sharing a run of ≥ w + k − 1 tokens
    * share a fingerprint and WILL meet in the join (only the
    * df-capped boilerplate escape hatch can suppress a pair, the
    * documented trade). (round 7)
    */
  def dedupWinnowing(s: SparkSession, dir: String): DataFrame =
    dedupWinnowingFrom(winnowFingerprints(s, dir))

  /** Pair stage over any (doc_id, fp) fingerprint frame.
    *
    * Grouped-bucket pair generation (round 15 — the
    * [[dedupMinhashLsh]] cand precedent applied here, guide §2.4):
    * one fp-keyed aggregate collects each fingerprint's doc list, the
    * df ∈ [2, maxDf] gate is a size filter on that list, and the i<j
    * pairs expand MAP-SIDE from the sorted array — replacing the old
    * df-aggregate + semi-join + fp-keyed self-join (three shuffles of
    * the fingerprint stream and a double-sided join recompute) with a
    * single shuffle. The list is bounded by [[WinnowMaxDf]] BEFORE
    * expansion, so no bucket ever materializes more than
    * C(maxDf, 2) = 28 pairs — the same blocking bound the join form
    * had. sort_array on doc_ids makes i<j ⇔ doc_a < doc_b; counts are
    * exact integers — bit-identical results.
    */
  private[graft] def dedupWinnowingFrom(fps: DataFrame): DataFrame = {
    val buckets = fps.groupBy("fp")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, WinnowMaxDf))
    buckets
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids"))))
          .as("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowMinShared)
      .orderBy("a", "b")
  }

  val dedupWinnowingSql: String =
    s"""WITH $sqlWinnowCtes,
       rare AS (SELECT fp FROM (SELECT fp, COUNT(*) AS df FROM fp
                                GROUP BY 1)
                WHERE df BETWEEN 2 AND $WinnowMaxDf),
       f2 AS (SELECT f.doc_id, f.fp FROM fp f JOIN rare r ON f.fp = r.fp)
       SELECT x.doc_id AS a, y.doc_id AS b,
              CAST(COUNT(*) AS BIGINT) AS n_shared
       FROM f2 x JOIN f2 y ON x.fp = y.fp AND x.doc_id < y.doc_id
       GROUP BY 1, 2
       HAVING COUNT(*) >= $WinnowMinShared
       ORDER BY a, b"""

  // MinHash/LSH default parameters (SimilarityConfig.Default): 16 hashes
  // as 4 bands x 4 rows targets J >= ~0.5 candidates
  // (P(fire) = 1-(1-J^4)^4); verification keeps jac >= 0.5. Word-3-gram
  // shingles. The SQL oracles are written against Default.
  private val D = SimilarityConfig.Default

  /** MinHash -> banded LSH -> candidate pairs -> exact-Jaccard verify.
    *
    * The signature is computed as k `min(md5(salt:shingle))` AGGREGATE
    * columns over exploded (doc, shingle) rows rather than nested
    * higher-order array functions: HOFs run interpreted, while this
    * shape keeps md5 + min inside whole-stage codegen with map-side
    * partial aggregation — one narrow shuffle of (doc_id, k hashes).
    * Then one (band_id, band_hash) bucket join and the verification agg.
    *
    * Rides-output evidence (measured round 15, the simhash precedent —
    * VERDICT r14 item 4): on the gate corpus at sf1.0f32 → sf3.0f32
    * the banded blocking admitted candidates 248,606 → 2,384,416
    * (×9.59) and the verified output was IDENTICAL at both SFs —
    * 1:1 candidate selectivity, zero wasted verify work on this
    * corpus's replica-family near-dups. The in-suite wall e(1→3) ≈
    * 1.5–1.6 therefore sits UNDER its own output growth
    * (e = log(9.59)/log(3) ≈ 2.06): the superlinearity is the pair
    * output itself, not the operator (tools/ProfileMinhash reproduces
    * the measurement; SPARK_GRAFT_PROFILE_ROUNDS=1 for one pass).
    */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    dedupMinhashLsh(s, dir, D)

  def dedupMinhashLsh(s: SparkSession, dir: String,
      cfg: SimilarityConfig): DataFrame = {
    val b = minhashBlocks(s, dir, cfg)
    verifyJaccard(b.cand, b.shr, b.cnt, cfg.minhashTau)
  }

  /** The shared MinHash->banded-LSH blocking stage: per-doc distinct
    * shingle rows, per-doc shingle counts, and the distinct candidate
    * pair set. [[dedupMinhashLsh]], [[dedupContainment]] and
    * [[dedupEditDistance]] all verify these same candidates with their
    * own (Jaccard / containment / Levenshtein) metric — blocking cost is
    * identical no matter which verification runs.
    */
  private final case class MinhashBlocks(
      shr: DataFrame, cnt: DataFrame, cand: DataFrame)

  private def minhashBlocks(s: SparkSession, dir: String,
      cfg: SimilarityConfig): MinhashBlocks = {
    val shr = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(
          wordShingles(toks(col("text")), cfg.shingleWidth))).as("sh"))
    // NOTE (measured): localCheckpoint(shr) — to stop verify re-deriving
    // the shingle rows — regressed every best-of-3 percentile by
    // ~0.4-0.5 s at sf0.1 (JIT noise is ~±0.3 s, the shift was
    // consistent): shr is a pre-shuffle exploded stream, cheap to
    // recompute inside codegen but expensive to materialize and re-read
    // 3x. The checkpoint pattern pays off only for compact
    // POST-aggregation frames (see Stats.tfidfTopTerms); recompute wins
    // for wide streaming passes (same lesson as SURVEY §7a's
    // persist()/semi-filter rejections).
    // k minhashes from k/4 md5 evaluations: each salted md5's 32 hex
    // chars split into four disjoint 8-char (32-bit) lanes; hex strings
    // compare lexicographically as unsigned integers, so min-per-lane
    // is a valid MinHash. md5 is the expensive op — 4x fewer calls;
    // codegen's subexpression elimination shares each salt's digest
    // across its four lanes.
    val mhCols = (0 until cfg.minhashK).map { i =>
      min(substring(md5(concat(lit(s"${i / 4}:"), col("sh"))),
        (i % 4) * 8 + 1, 8)).as(s"mh$i")
    } :+ count(lit(1)).as("n") // shingle-set size rides the same agg
    val mh = shr.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
    val bandRows = bandRowsOf(mh, cfg)
    // Candidate pairs from grouped bucket membership rather than a
    // self-join: one signature pass instead of two (Spark recomputes
    // both branches of a self-join) and one less shuffle. Bucket list
    // size is bounded by band selectivity (a band match implies 4 equal
    // minhashes, i.e. J^4-likely similarity) — for adversarially skewed
    // corpora swap back to the equi-join form and let AQE split buckets.
    val cand = bandRows.groupBy("band_id", "band_hash")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "doc_a")))
      .select(col("doc_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids"))))
          .as("doc_b"))
      .distinct()
    MinhashBlocks(shr, mh.select(col("doc_id"), col("n")), cand)
  }

  /** (doc_id, band_id, band_hash) rows from a minhash-signature frame —
    * shared by the blocking stage and [[lshBucketStats]]. */
  private def bandRowsOf(mh: DataFrame, cfg: SimilarityConfig): DataFrame =
    mh.select(col("doc_id"),
      explode(array((0 until cfg.minhashBands).map(b =>
        struct(lit(b).as("band_id"),
          md5(concat_ws(",",
            (0 until cfg.minhashRows)
              .map(r => col(s"mh${b * cfg.minhashRows + r}")): _*))
            .as("band_hash"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band_id").as("band_id"),
        col("bb.band_hash").as("band_hash"))

  /** Shared DuckDB CTE block producing `shr` (distinct doc/shingle
    * rows) and `cand` (blocked candidate pairs) — the SQL twin of
    * [[minhashBlocks]]. Splice as the head of a WITH clause.
    */
  private val sqlMinhashBlockCtes: String =
    s"""shr AS (${sqlShingleRows(D.shingleWidth)}),
       mh AS (SELECT doc_id, i,
                     min(substr(md5(CAST(i // 4 AS VARCHAR) || ':' || sh),
                                (i % 4) * 8 + 1, 8)) AS h
              FROM shr, (SELECT unnest(generate_series(0, ${D.minhashK - 1})) AS i) AS salts
              GROUP BY doc_id, i),
       bands AS (SELECT doc_id, i // ${D.minhashRows} AS band_id,
                        md5(string_agg(h, ',' ORDER BY i)) AS band_hash
                 FROM mh GROUP BY doc_id, i // ${D.minhashRows}),
       cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id)"""

  val dedupMinhashLshSql: String =
    s"""WITH $sqlMinhashBlockCtes,
       ${sqlVerifyJaccard(D.minhashTau)}"""

  // SimHash: 48-bit signature (bit j = weighted parity of a hex char of
  // the token's salted md5); default geometry 3 bands x 16 bits,
  // Hamming <= 3. Short correlated docs (shared vocab) compress the
  // random-pair Hamming distribution, so bands must be wide: 16-bit
  // bands admit ~2% of pairs as candidates where 8-bit bands admitted
  // ~50%.
  private val ShBits = 48

  /** SimHash near-dup: per-token md5 drives 48 signed bit votes weighted
    * by term frequency; banded 16-bit buckets generate candidates;
    * verify by Hamming distance. The 48 bit-sums are agg columns over
    * (doc, token) — no 48x row blow-up, all inside codegen. Bit j's
    * source parity comes packed in ONE BIGINT via the codegen'd
    * [[graft.plans.HexParityBits]] (one byte loop instead of 48
    * substring/ascii slices per row); the vote is then an integer
    * `(packed >> j) & 1`.
    */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    dedupSimhash(s, dir, D)

  def dedupSimhash(s: SparkSession, dir: String,
      cfg: SimilarityConfig): DataFrame = {
    // Per-OCCURRENCE votes: summing one ±1 vote per token occurrence
    // equals the frequency-weighted sum over distinct tokens, so the
    // (doc, token) count shuffle disappears — md5+parity run map-side
    // and the single exchange carries (doc_id, 48 partial sums), never
    // token rows.
    //
    // Bucket-density audit (round 14, prompted by the x8.34 1->3
    // shuffle-write ratio the resource gate flagged): unlike the
    // embedding tier's fixed 8-bit bucket universe, the 16-bit bands
    // (65,536 buckets/band) keep hash-coincidence mass negligible —
    // measured on the gate data, candidates grew x9.39 (25.8M -> 242M)
    // while ACCEPTED pairs grew x9.59 (1.44M -> 13.8M): a constant
    // 18:1 candidate:output ratio at both SFs. The growth IS the true
    // clone-pair output (pairwise output is quadratic in clone-cluster
    // size by definition) — the same rides-output shape as
    // dedup_minhash_lsh; no uncapped-collision pathology, no cap
    // needed.
    val pb = call_function(graft.plans.HexParityBits.FnName,
      md5(col("tok")), md5(concat(lit("#:"), col("tok"))))
    val tokRows = Tables.documents(s, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .select(col("doc_id"), pb.as("pb"))
    val bitCols = (0 until ShBits).map(j =>
      sum(shiftright(col("pb"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$j"))
    val bitSums = tokRows.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    val sig = bitSums.select(col("doc_id"),
      (0 until ShBits)
        .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).as("sig"))
    val bandRows = sig.select(col("doc_id"), col("sig"),
      explode(array((0 until cfg.simhashBands).map(b =>
        struct(lit(b).as("band"),
          (shiftright(col("sig"), b * cfg.simhashBandBits) %
            (1 << cfg.simhashBandBits)).as("byte"))): _*)).as("bb"))
      .select(col("doc_id"), col("sig"),
        col("bb.band").as("band"), col("bb.byte").as("byte"))
    // grouped-bucket pair generation (see dedupMinhashLsh): one
    // signature pass, no self-join recompute
    bandRows.groupBy("band", "byte")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig"))))
        .as("xs"))
      .filter(size(col("xs")) > 1)
      .select(col("xs"), posexplode(col("xs")).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(col("xs"), col("i") + lit(2), size(col("xs"))))
          .as("b"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sig_a ^ sig_b)").cast("int").as("hamming"))
      .filter(col("hamming") <= cfg.simhashMaxHamming)
      .orderBy("doc_a", "doc_b")
  }

  val dedupSimhashSql: String = {
    def sqlBitChar(j: Int) =
      if (j < 32) s"substr(h1, ${j + 1}, 1)" else s"substr(h2, ${j - 31}, 1)"
    val bitSums = (0 until ShBits).map(j =>
      s"SUM(cnt * (ascii(${sqlBitChar(j)}) % 2 * 2 - 1)) AS b$j")
      .mkString(", ")
    val sigExpr = (0 until ShBits)
      .map(j => s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH tc AS (SELECT doc_id, tok, COUNT(*) AS cnt,
                           md5(tok) AS h1, md5('#:' || tok) AS h2
                    FROM (SELECT doc_id, unnest(${sqlToks("text")}) AS tok
                          FROM documents) GROUP BY doc_id, tok, 4, 5),
       bits AS (SELECT doc_id, $bitSums FROM tc GROUP BY doc_id),
       sig AS (SELECT doc_id, CAST($sigExpr AS BIGINT) AS sig FROM bits),
       bands AS (SELECT doc_id, sig, band,
                        (sig >> (band * ${D.simhashBandBits})) % ${1 << D.simhashBandBits} AS byte
                 FROM sig, (SELECT unnest(generate_series(0, ${D.simhashBands - 1})) AS band) AS bs),
       cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       a.sig AS sig_a, b.sig AS sig_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.byte = b.byte
                 AND a.doc_id < b.doc_id)
       SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
       FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= ${D.simhashMaxHamming}
       ORDER BY doc_a, doc_b"""
  }

  // n-gram Jaccard defaults: char-4-gram sets verified at J >= 0.8 on
  // the word-LSH band-blocked candidates.

  /** Char-n-gram Jaccard near-dup: the word-shingle banded-LSH blocking
    * ([[minhashBlocks]] — shared with the Jaccard/containment/edit
    * verifiers) generates candidates; exact char-4-gram Jaccard
    * verifies. MEASURED scale lesson (round 2): the original 2-perm
    * char-minhash blocking admitted ~26% of ALL pairs on this corpus
    * (same-vocab documents are char-level similar, so few permutations
    * cannot separate them) — candidate count grew quadratically and the
    * query took ~140 s at sf0.1 where this form takes ~2 s. Character
    * evidence still decides admission; only the blocking rides the
    * word-level signature.
    */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    dedupNgramJaccard(s, dir, D)

  def dedupNgramJaccard(s: SparkSession, dir: String,
      cfg: SimilarityConfig): DataFrame = {
    val sh = Tables.documents(s, dir)
      .select(col("doc_id"),
        array_distinct(charShingles(col("text"), cfg.ngramWidth)).as("shs"))
    verifyJaccard(minhashBlocks(s, dir, cfg).cand,
      sh.select(col("doc_id"), explode(col("shs")).as("sh")),
      sh.select(col("doc_id"), size(col("shs")).cast("long").as("n")),
      cfg.ngramTau)
  }

  val dedupNgramJaccardSql: String =
    s"""WITH $sqlMinhashBlockCtes,
       chs AS (${sqlCharShingleRows(D.ngramWidth)}),
       cnt AS (SELECT doc_id, COUNT(*) AS n FROM chs GROUP BY doc_id),
       inter AS (SELECT doc_a, doc_b, COUNT(*) AS n_inter
                 FROM cand JOIN chs sa ON doc_a = sa.doc_id
                           JOIN chs sb ON doc_b = sb.doc_id AND sa.sh = sb.sh
                 GROUP BY doc_a, doc_b)
       SELECT doc_a, doc_b, n_inter, ca.n AS na, cb.n AS nb,
              CAST(n_inter AS DOUBLE) / CAST(ca.n + cb.n - n_inter AS DOUBLE) AS jac
       FROM inter JOIN cnt ca ON doc_a = ca.doc_id
                  JOIN cnt cb ON doc_b = cb.doc_id
       WHERE CAST(n_inter AS DOUBLE) / CAST(ca.n + cb.n - n_inter AS DOUBLE) >= ${D.ngramTau}
       ORDER BY doc_a, doc_b"""

  // Default embedding near-dup threshold, chosen for the synthetic
  // distribution (global max cosine ~= 0.51): tau = 0.4.

  /** Banded sign-LSH geometry for the embedding near-dup candidate
    * join: 8 bands x 8 hyperplane sign bits (64 deterministic
    * md5-parity planes, [[Similarity.planeVec]]). Candidates = pairs
    * sharing any (band_id, band_key) — an EQUI-join on a key whose
    * cardinality grows with the corpus, the same shuffle shape as
    * [[dedupMinhashLsh]]'s minhash bands. On the near-uniform synthetic
    * corpus this admits ~3.6% of all pairs with recall ~0.22 at
    * tau=0.4 and ~6x lift over random admission
    * ([[dedupEmbeddingRecall]] measures it; the ann_topk_pq precedent —
    * real corpora dedup at cosine >= 0.9 where sign-band collision
    * concentrates sharply on true pairs).
    */
  val EmbBands = 8
  val EmbBandBits = 8

  private def quantizedVecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .select(col("vec_id"), col("qv"), dotQ(col("qv"), col("qv")).as("nn"))

  private val sqlQuantVecs =
    s"""q AS (SELECT vec_id, ${sqlQuantize("embedding")} AS qv FROM embeddings),
       n AS (SELECT vec_id, qv, ${sqlDotQ("qv", "qv", 64)} AS nn FROM q)"""

  /** Embedding-cosine near-dup at corpus scale: banded sign-LSH
    * blocking (map-side band keys via codegen'd LongDot projections
    * against literal planes — zero shuffles to hash) feeding the exact
    * quantized-cosine verification (integer dot products —
    * bit-identical across engines and partitionings). The all-pairs
    * exact form survives as this key's recall gate
    * ([[dedupEmbeddingRecall]]), hard-capped like every other
    * ground-truth monitor.
    *
    * Bucket-density cap (round 14 — the winnowing tier's df-cap
    * discipline applied here): the 8-bit band keys give a FIXED bucket
    * universe (2,036 live buckets on the synthetic corpus), so raw
    * all-pairs-within-bucket candidate mass is Sum(bucket^2) —
    * quadratic in corpus density, MEASURED at the sf1.0->sf3.0 gate as
    * x47.6 shuffle-write growth and 75 GB of spill while true-pair
    * output grew only ~x9. Buckets above [[SimilarityConfig.embBucketCap]]
    * therefore degrade to exact FULL-64-bit-signature matching (the
    * two-level blocking the semantic tier uses: a dense bucket's
    * members pair only when they collide on every plane), which keeps
    * hot-bucket candidates output-bound — clone clusters (the cause of
    * genuine over-density in a crawl) share the whole signature and
    * stay fully connected, while hash-coincidence neighbors stop
    * paying Sum(bucket^2). Measured on the gate data (DuckDB, cap 256):
    * sf1.0 candidates 7.21M -> 7.02M (cap barely binds; the ids<200
    * recall monitor keeps its hits), sf3.0 65.0M -> 15.0M with the
    * 1->3 candidate growth falling from x9.0 to x2.1 — below data
    * growth. Corpora whose SEMANTIC near-dups saturate every bucket
    * belong to [[Similarity.dedupSemantic]]'s centroid blocking; this
    * cap is the overload valve, not a recall substitute. The bucket
    * frequency table is <= bands * 2^bits rows (2,048 at the default
    * geometry) and broadcasts, so the cap adds no shuffle over the
    * band rows.
    */
  def dedupEmbeddingCosine(s: SparkSession, dir: String): DataFrame =
    dedupEmbeddingCosine(s, dir, D)

  def dedupEmbeddingCosine(s: SparkSession, dir: String,
      cfg: SimilarityConfig): DataFrame = {
    val qn = quantizedVecs(s, dir)
    val bandCols = (0 until EmbBands).map { l =>
      (0 until EmbBandBits).map { i =>
        when(dotQ(col("qv"), lit(Similarity.planeVec(l * EmbBandBits + i))) > 0,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    // NOTE (measured at sf0.1): localCheckpoint() on this frame REGRESSED
    // 1.75 -> 1.9-2.0 s — the 64 plane projections are cheap codegen'd
    // map work, so recomputing both self-join sides beats materializing
    // 8 rows/vector (the §7a rule: checkpoints pay for expensive-to-
    // recompute compact frames, and the plane dots are not expensive).
    // full 64-bit signature as a portable string key (band 0..7 keys
    // joined by ':') — the fine blocking key dense buckets fall back
    // to. Both sig and the explode derive from ONE named array column:
    // expressed directly over bandCols, Catalyst placed the sig
    // projection ABOVE the Generate and re-ran all 64 plane dots per
    // EXPLODED row (9x the map work — measured 1.67 -> 3.1 s at
    // sf0.1); referencing the array makes the post-explode sig a cheap
    // 8-element string join.
    val bands = qn
      .select(col("vec_id"), array(bandCols: _*).as("arr"))
      .select(col("vec_id"),
        concat_ws(":", (0 until EmbBands)
          .map(i => element_at(col("arr"), i + 1).cast("string")): _*)
          .as("sig"),
        posexplode(col("arr")))
      .toDF("vec_id", "sig", "band_id", "band_key")
    // ONE self-join whose key carries a conditional fine component: a
    // bucket's density is a bucket property, so every row of a sparse
    // bucket gets jk='' (pairs match coarse — all-pairs, as before the
    // cap) and every row of a dense one gets jk=sig (pairs match only
    // on the full signature: the join KEY is finer, so hot buckets
    // never enumerate Sum(bucket^2) pairs, not even as a post-filter).
    // The bucket count comes from a WINDOW inside each join side — not
    // a third lineage over the vectors (a bcnt aggregate side, plain
    // or checkpointed, and a grouped-bucket collect_list rewrite all
    // measured 0.8-2.0 s slower at sf0.1): the window's exchange
    // carries the already-projected 8-rows-per-vector band rows, so
    // the expensive plane projections still run exactly twice. The
    // post-window projection keeps only (vec_id, band, key, jk) so the
    // join's second exchange moves narrow rows — with it, the capped
    // form measures ~1.8 s at sf0.1 vs 1.67 s uncapped (the ~8% is the
    // window sort; the sf3 payoff is the end of the x47.6 byte blowup).
    val bs = bands.withColumn("cnt",
      sum(lit(1L)).over(Window.partitionBy("band_id", "band_key")))
      .select(col("vec_id"), col("band_id"), col("band_key"),
        when(col("cnt") > cfg.embBucketCap, col("sig")).otherwise(lit(""))
          .as("jk"))
    val cand = bs.as("a")
      .join(bs.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.jk") === col("b.jk") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(qn.as("qa"), col("vec_a") === col("qa.vec_id"))
      .join(qn.as("qb"), col("vec_b") === col("qb.vec_id"))
      .select(col("vec_a"), col("vec_b"),
        cosineQ(dotQ(col("qa.qv"), col("qb.qv")), col("qa.nn"), col("qb.nn"))
          .as("cos_sim"))
      .filter(col("cos_sim") >= cfg.embeddingTau)
      .orderBy("vec_a", "vec_b")
  }

  /** The banded-key CTE chain shared by the registered query and its
    * recall gate: same md5-parity plane formula as
    * [[Similarity]]'s sqlPlanes, `j` spanning all bands x bits.
    */
  private val sqlEmbBandCtes =
    s"""$sqlQuantVecs,
       planes AS (SELECT j, d,
            CASE WHEN ascii(substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 1)) % 2 = 0
                 THEN 1 ELSE -1 END AS w
          FROM (SELECT unnest(generate_series(0, ${EmbBands * EmbBandBits - 1})) AS j) AS js,
               (SELECT unnest(generate_series(0, 63)) AS d) AS ds),
       qrows AS (SELECT vec_id, unnest(qv) AS x,
                        unnest(generate_series(0, 63)) AS d
                 FROM q),
       bits AS (SELECT vec_id, j, SUM(w * x) AS dot
                FROM qrows JOIN planes USING (d) GROUP BY vec_id, j),
       bands AS (SELECT vec_id, j // $EmbBandBits AS band_id,
                   CAST(SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << (j % $EmbBandBits))
                            ELSE 0 END) AS BIGINT) AS band_key
                 FROM bits GROUP BY vec_id, j // $EmbBandBits),
       bcnt AS (SELECT band_id, band_key, COUNT(*) AS cnt
                FROM bands GROUP BY band_id, band_key),
       esigs AS (SELECT vec_id,
                   string_agg(CAST(band_key AS VARCHAR), ':' ORDER BY band_id) AS sig
                 FROM bands GROUP BY vec_id),
       bsd AS (SELECT b.vec_id, b.band_id, b.band_key,
                      CASE WHEN c.cnt > ${D.embBucketCap} THEN s.sig
                           ELSE '' END AS jk
               FROM bands b
               JOIN bcnt c ON b.band_id = c.band_id AND b.band_key = c.band_key
               JOIN esigs s ON b.vec_id = s.vec_id),
       ecand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                 FROM bsd a JOIN bsd b
                   ON a.band_id = b.band_id AND a.band_key = b.band_key
                  AND a.jk = b.jk AND a.vec_id < b.vec_id),
       everi AS (SELECT vec_a, vec_b,
                   ${sqlCosineQ(sqlDotQ("qa.qv", "qb.qv", 64), "qa.nn", "qb.nn")} AS cos_sim
                 FROM ecand JOIN n qa ON vec_a = qa.vec_id
                            JOIN n qb ON vec_b = qb.vec_id)"""

  val dedupEmbeddingCosineSql: String =
    s"""WITH $sqlEmbBandCtes
       SELECT vec_a, vec_b, cos_sim FROM everi
       WHERE cos_sim >= ${D.embeddingTau} ORDER BY vec_a, vec_b"""

  /** Recall of the banded sign-LSH blocking against the exact all-pairs
    * cosine ground truth on a HARD-CAPPED vector subset (ids <
    * [[EmbRecallCap]] — O(Cap²) pairs, corpus-size-independent): the
    * embedding tier's twin of [[dedupLshRecall]]. Verification is exact
    * cosine on both sides, so precision is 1 by construction and recall
    * isolates exactly the band-collision misses — the metric that sizes
    * [[EmbBands]]/[[EmbBandBits]] against the corpus's similarity
    * distribution. One report row.
    */
  val EmbRecallCap = 200L

  def dedupEmbeddingRecall(s: SparkSession, dir: String): DataFrame = {
    val qn = quantizedVecs(s, dir).filter(col("vec_id") < EmbRecallCap)
    val truth = qn.as("a").join(qn.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosineQ(dotQ(col("a.qv"), col("b.qv")), col("a.nn"), col("b.nn"))
          .as("cos_sim"))
      .filter(col("cos_sim") >= D.embeddingTau)
      .select(col("vec_a"), col("vec_b"))
    val found = dedupEmbeddingCosine(s, dir)
      .filter(col("vec_a") < EmbRecallCap && col("vec_b") < EmbRecallCap)
      .select(col("vec_a"), col("vec_b"))
    val tn = truth.agg(count(lit(1)).as("n_true"))
    val hit = truth.join(found, Seq("vec_a", "vec_b"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    tn.crossJoin(hit)
      .select(col("n_true"), col("n_hit"),
        when(col("n_true") === 0, lit(null).cast("double"))
          .otherwise(col("n_hit").cast("double") / col("n_true").cast("double"))
          .as("recall"))
  }

  val dedupEmbeddingRecallSql: String =
    s"""WITH $sqlEmbBandCtes,
       found AS (SELECT vec_a, vec_b FROM everi
                 WHERE cos_sim >= ${D.embeddingTau}
                   AND vec_a < $EmbRecallCap AND vec_b < $EmbRecallCap),
       capn AS (SELECT * FROM n WHERE vec_id < $EmbRecallCap),
       truth AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
                 FROM capn a JOIN capn b ON a.vec_id < b.vec_id
                 WHERE ${sqlCosineQ(sqlDotQ("a.qv", "b.qv", 64), "a.nn", "b.nn")}
                       >= ${D.embeddingTau}),
       tn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM truth),
       hit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
               FROM truth t JOIN found f
                 ON t.vec_a = f.vec_a AND t.vec_b = f.vec_b)
       SELECT n_true, n_hit,
              CASE WHEN n_true = 0 THEN NULL
                   ELSE CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE)
              END AS recall
       FROM tn, hit"""

  /** Duplicate CLUSTERS from the verified near-dup pairs: connected
    * components via min-label propagation, survivor = min doc_id per
    * component. This is the step that turns pairwise similarity into an
    * actual dedup decision (pairs alone over-delete: a~b, b~c must keep
    * ONE of {a,b,c}, not two survivors).
    *
    * Shape: iterative (join + min-aggregate) rounds, converging in
    * O(component diameter) supersteps — near-dup components are tiny by
    * construction, so 2-4 rounds in practice. Each round
    * `localCheckpoint`s to cut the growing lineage (the standard Spark
    * iterative-algorithm pattern); the per-round `count` is the
    * convergence test, not a data collect.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = dedupMinhashLsh(s, dir).select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("l"))
      .localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      val prop = edges.join(labels, edges("src") === labels("v"))
        .select(col("dst").as("v"), col("l"))
      val next = labels.union(prop)
        .groupBy("v").agg(min(col("l")).as("l"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("l", "l0"), "v")
        .filter(col("l") =!= col("l0")).count()
      labels = next
    }
    labels.select(col("v").as("doc_id"), col("l").as("cluster_id"),
      (col("v") === col("l")).as("is_survivor"))
      .orderBy("doc_id")
  }

  val dedupClustersSql: String =
    s"""WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ($dedupMinhashLshSql)),
       verts AS (SELECT doc_a AS v FROM pairs UNION SELECT doc_b FROM pairs),
       edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                 UNION SELECT doc_b, doc_a FROM pairs),
       reach(v, l) AS (
         SELECT v, v FROM verts
         UNION
         SELECT e.b, r.l FROM reach r JOIN edges e ON r.v = e.a)
       SELECT v AS doc_id, min(l) AS cluster_id,
              (v = min(l)) AS is_survivor
       FROM reach GROUP BY v ORDER BY doc_id"""

  /** Survivor selection — the DECISION step that detection exists for:
    * within each near-dup cluster keep the HIGHEST-QUALITY member
    * ([[TextAnalysis.textQualityScore]]'s oracled score; ties to the
    * smaller id), emit every member with its verdict and the kept
    * representative it maps to. This is the dedup policy a training
    * pipeline actually executes (drop list + remap table in one
    * frame), replacing [[dedupClusters]]' structural min-id survivor
    * with a content-aware one. Cost on top of the cluster build: one
    * doc-cardinality join and two cluster-partitioned windows —
    * nothing corpus-shaped is new, and the windows partition per
    * cluster (bounded groups, never global). (round 4)
    */
  def dedupKeepPolicy(s: SparkSession, dir: String): DataFrame = {
    val clusters = dedupClusters(s, dir).select("doc_id", "cluster_id")
    val q = TextAnalysis.textQualityScore(s, dir)
      .select(col("doc_id"), col("quality"), col("n_tokens"),
        // the tier is categorical — rank it explicitly (never sort the
        // label strings: 'ok' > 'good' lexicographically)
        when(col("quality") === "good", 2)
          .when(col("quality") === "ok", 1).otherwise(0).as("q_rank"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("q_rank").desc, col("n_tokens").desc, col("doc_id"))
    clusters.join(q, "doc_id")
      .withColumn("rn", row_number().over(w))
      .withColumn("keep", col("rn") === 1)
      .withColumn("kept_doc",
        max(when(col("keep"), col("doc_id")))
          .over(Window.partitionBy("cluster_id")))
      .select(col("doc_id"), col("cluster_id"), col("quality"),
        col("keep"), col("kept_doc"))
      .orderBy("doc_id")
  }

  lazy val dedupKeepPolicySql: String =
    s"""WITH clusters AS (SELECT doc_id, cluster_id
             FROM ($dedupClustersSql)),
       q AS (SELECT doc_id, quality, n_tokens,
               CASE quality WHEN 'good' THEN 2 WHEN 'ok' THEN 1
                    ELSE 0 END AS q_rank
             FROM (${TextAnalysis.textQualityScoreSql})),
       ranked AS (SELECT c.doc_id, c.cluster_id, q.quality,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                 ORDER BY q.q_rank DESC, q.n_tokens DESC, c.doc_id) AS rn
             FROM clusters c JOIN q USING (doc_id))
       SELECT doc_id, cluster_id, quality, (rn = 1) AS keep,
              MAX(CASE WHEN rn = 1 THEN doc_id END)
                OVER (PARTITION BY cluster_id) AS kept_doc
       FROM ranked ORDER BY doc_id"""

  /** Incremental dedup against a fingerprint STORE — the arrival-time
    * form of the batch suite, and the operation
    * [[TextAnalysis.docFingerprint]]'s compact (fp_a, fp_b) rows exist
    * to serve: a new batch is checked by joining its fingerprints
    * against the accumulated store (here: the corpus split at the
    * id-range midpoint into store/batch halves — a deterministic cut
    * both engines compute), never by re-shingling history. Matches
    * resolve to the SMALLEST store id (stable attribution). At 100 TB
    * the store is a parquet table of ~70-byte rows regardless of
    * document sizes, the join is fingerprint-vs-fingerprint, and
    * text is read only for the incoming batch. (round 4)
    */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir)
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi")).head
    val cut =
      if (ids.isNullAt(0)) 0L else (ids.getLong(0) + ids.getLong(1)) / 2L
    val fp = TextAnalysis.docFingerprint(s, dir)
      .select("doc_id", "fp_a", "fp_b")
    val store = fp.filter(col("doc_id") < cut)
      .withColumnRenamed("doc_id", "store_doc")
    val batch = fp.filter(col("doc_id") >= cut)
    batch.join(store, Seq("fp_a", "fp_b"), "left")
      .groupBy(col("doc_id"))
      .agg(min(col("store_doc")).as("dup_of"))
      .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"),
        col("dup_of"))
      .orderBy("doc_id")
  }

  lazy val dedupIncrementalSql: String =
    s"""WITH fp AS (SELECT doc_id, fp_a, fp_b
             FROM (${TextAnalysis.docFingerprintSql})),
       cut AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS c
               FROM documents),
       store AS (SELECT doc_id AS store_doc, fp_a, fp_b FROM fp
                 WHERE doc_id < (SELECT c FROM cut)),
       batch AS (SELECT * FROM fp WHERE doc_id >= (SELECT c FROM cut))
       SELECT b.doc_id, (MIN(s.store_doc) IS NOT NULL) AS is_dup,
              MIN(s.store_doc) AS dup_of
       FROM batch b LEFT JOIN store s
         ON b.fp_a = s.fp_a AND b.fp_b = s.fp_b
       GROUP BY b.doc_id ORDER BY b.doc_id"""

  /** Containment near-dup: |A∩B| / min(|A|,|B|) over word-shingle sets
    * on the LSH-blocked candidates. Containment is the asymmetric twin
    * of Jaccard — it fires when a short document is embedded in a longer
    * one (quote inclusion, boilerplate wrapping), where Jaccard's
    * union-normalization dilutes the overlap below tau. Same blocking,
    * same integer intersection counts, one different final division.
    */
  def dedupContainment(s: SparkSession, dir: String): DataFrame =
    dedupContainment(s, dir, D)

  def dedupContainment(s: SparkSession, dir: String,
      cfg: SimilarityConfig): DataFrame = {
    val b = minhashBlocks(s, dir, cfg)
    val inter = b.cand
      .join(b.shr.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(b.shr.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(b.cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(b.cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        col("ca.n").as("na"), col("cb.n").as("nb"),
        (col("n_inter").cast("double") /
          least(col("ca.n"), col("cb.n")).cast("double")).as("containment"))
      .filter(col("containment") >= cfg.containTau)
      .orderBy("doc_a", "doc_b")
  }

  val dedupContainmentSql: String =
    s"""WITH $sqlMinhashBlockCtes,
       cnt AS (SELECT doc_id, COUNT(*) AS n FROM shr GROUP BY doc_id),
       inter AS (SELECT doc_a, doc_b, COUNT(*) AS n_inter
                 FROM cand JOIN shr sa ON doc_a = sa.doc_id
                           JOIN shr sb ON doc_b = sb.doc_id AND sa.sh = sb.sh
                 GROUP BY doc_a, doc_b)
       SELECT doc_a, doc_b, n_inter, ca.n AS na, cb.n AS nb,
              CAST(n_inter AS DOUBLE) / CAST(least(ca.n, cb.n) AS DOUBLE) AS containment
       FROM inter JOIN cnt ca ON doc_a = ca.doc_id
                  JOIN cnt cb ON doc_b = cb.doc_id
       WHERE CAST(n_inter AS DOUBLE) / CAST(least(ca.n, cb.n) AS DOUBLE)
             >= ${D.containTau}
       ORDER BY doc_a, doc_b"""

  /** Edit-distance near-dup: exact Levenshtein verification of the
    * LSH-blocked candidates, admitted when the distance relative to the
    * longer text is <= tau. Character-level edit distance is the
    * strictest verifier (order-sensitive where shingle metrics are
    * bag-like) and is O(len^2) per pair — affordable ONLY because the
    * banded blocking bounds the candidate set; running it all-pairs at
    * corpus scale would be O(N^2 * len^2). Texts join in per-pair AFTER
    * blocking, so bodies never shuffle during candidate generation.
    */
  def dedupEditDistance(s: SparkSession, dir: String): DataFrame =
    dedupEditDistance(s, dir, D)

  def dedupEditDistance(s: SparkSession, dir: String,
      cfg: SimilarityConfig): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    minhashBlocks(s, dir, cfg).cand
      .join(docs.as("da"), col("doc_a") === col("da.doc_id"))
      .join(docs.as("db"), col("doc_b") === col("db.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("da.text"), col("db.text")).as("dist"),
        greatest(length(col("da.text")), length(col("db.text"))).as("mx"))
      .select(col("doc_a"), col("doc_b"), col("dist"),
        (col("dist").cast("double") / col("mx").cast("double"))
          .as("rel_dist"))
      .filter(col("rel_dist") <= cfg.editRelTau)
      .orderBy("doc_a", "doc_b")
  }

  val dedupEditDistanceSql: String =
    s"""WITH $sqlMinhashBlockCtes,
       d AS (SELECT doc_a, doc_b,
               CAST(levenshtein(da.text, db.text) AS INT) AS dist,
               greatest(length(da.text), length(db.text)) AS mx
             FROM cand JOIN documents da ON doc_a = da.doc_id
                       JOIN documents db ON doc_b = db.doc_id)
       SELECT doc_a, doc_b, dist,
              CAST(dist AS DOUBLE) / CAST(mx AS DOUBLE) AS rel_dist
       FROM d
       WHERE CAST(dist AS DOUBLE) / CAST(mx AS DOUBLE) <= ${D.editRelTau}
       ORDER BY doc_a, doc_b"""

  /** INCREMENTAL near-dup detection — the operational form at 100 TB:
    * a daily batch must dedup against the whole historical corpus
    * without re-shingling it. The per-doc MinHash signature + band
    * hashes are persisted once per document ([[signatureStore]]); each
    * new batch computes signatures for ITS documents only, bucket-joins
    * its band rows against the store (historical bodies are never
    * touched — the store is (doc_id, band_id, band_hash, n) plus the
    * signature columns for verification), and appends its own rows to
    * the store. Cost per batch: O(batch) signature work + one
    * equi-join against band-partitioned history.
    *
    * Verification uses signature-estimated Jaccard (matching minhash
    * lanes / k) rather than exact shingle intersection — exact verify
    * would need historical shingles, i.e. the bodies this path exists
    * to avoid re-reading. At k=16 lanes the estimator's std-err is
    * ~0.1; production tunes k via [[SimilarityConfig]].
    */
  def signatureStore(docs: DataFrame, cfg: SimilarityConfig = D): DataFrame = {
    val shr = docs.select(col("doc_id"),
      explode(array_distinct(
        wordShingles(toks(col("text")), cfg.shingleWidth))).as("sh"))
    val mhCols = (0 until cfg.minhashK).map { i =>
      min(substring(md5(concat(lit(s"${i / 4}:"), col("sh"))),
        (i % 4) * 8 + 1, 8)).as(s"mh$i")
    } :+ count(lit(1)).as("n")
    shr.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
      .select(col("doc_id") +: col("n") +:
        (0 until cfg.minhashBands).map(b =>
          md5(concat_ws(",",
            (0 until cfg.minhashRows)
              .map(r => col(s"mh${b * cfg.minhashRows + r}")): _*))
            .as(s"band$b")) ++:
        (0 until cfg.minhashK).map(i => col(s"mh$i")): _*)
  }

  /** Signature-level Jaccard estimate between two signature rows
    * (fraction of matching minhash lanes).
    */
  private def estJaccard(cfg: SimilarityConfig): org.apache.spark.sql.Column =
    (0 until cfg.minhashK)
      .map(i => when(col(s"a.mh$i") === col(s"b.mh$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / cfg.minhashK.toDouble

  /** Near-dup pairs between `newSigs` and `storeSigs` (both
    * [[signatureStore]]-shaped): banded bucket join generates
    * candidates (new x (store ∪ new)), signature-estimated Jaccard
    * admits pairs at `tau`. `newSigs` doc_ids must be disjoint from the
    * store's; pairs within the new batch are included (doc_a < doc_b).
    */
  def dedupIncremental(newSigs: DataFrame, storeSigs: DataFrame,
      cfg: SimilarityConfig = D, tau: Double = 0.5): DataFrame = {
    def bandRows(sigs: DataFrame) = sigs.select(col("doc_id") +:
      (0 until cfg.minhashBands).map(b => col(s"band$b")): _*)
      .select(col("doc_id"), explode(array((0 until cfg.minhashBands).map(
        b => struct(lit(b).as("band_id"), col(s"band$b").as("band_hash"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("bb.band_id").as("band_id"),
        col("bb.band_hash").as("band_hash"))
    val cand = bandRows(newSigs).as("nb")
      .join(bandRows(storeSigs.unionByName(newSigs)).as("ab"),
        col("nb.band_id") === col("ab.band_id") &&
          col("nb.band_hash") === col("ab.band_hash") &&
          col("nb.doc_id") < col("ab.doc_id"))
      .select(col("nb.doc_id").as("doc_a"), col("ab.doc_id").as("doc_b"))
      .union(bandRows(newSigs).as("nb")
        .join(bandRows(storeSigs).as("ab"),
          col("nb.band_id") === col("ab.band_id") &&
            col("nb.band_hash") === col("ab.band_hash") &&
            col("nb.doc_id") > col("ab.doc_id"))
        .select(col("ab.doc_id").as("doc_a"), col("nb.doc_id").as("doc_b")))
      .distinct()
    val all = storeSigs.unionByName(newSigs)
    cand
      .join(all.as("a"), col("doc_a") === col("a.doc_id"))
      .join(all.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"), estJaccard(cfg).as("est_jac"))
      .filter(col("est_jac") >= tau)
      .orderBy("doc_a", "doc_b")
  }

  /** Shared verification tail: exact Jaccard of candidate pairs from
    * (doc_id, sh) rows. CONTRACT: callers pass per-doc DISTINCT shingle
    * rows (array_distinct before explode) and supply `cnt` = (doc_id,
    * n) themselves — the signature aggregate / the array length yields
    * it for free, so verification adds no dedup shuffle and no extra
    * corpus pass. Intersection counts are an equi-join on (doc pair,
    * shingle); all arithmetic is integer until the final IEEE division
    * — deterministic under any partitioning.
    */
  private def verifyJaccard(cand: DataFrame, shr: DataFrame,
      cnt: DataFrame, tau: Double): DataFrame = {
    // NOTE (measured): semi-filtering shr to candidate docs behind an
    // explicit exchange — to share one materialization across sa/sb —
    // REGRESSED minhash 1.35s -> 2.0s at sf0.1: deriving the
    // candidate-doc set re-executes the candidate chain before
    // verification can start, and the extra exchange serializes
    // stages. Two independent streaming passes over the (narrow)
    // shingle projection win; see SURVEY §7a's persist() lesson.
    val inter = cand
      .join(shr.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shr.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        col("ca.n").as("na"), col("cb.n").as("nb"),
        (col("n_inter").cast("double") /
          (col("ca.n") + col("cb.n") - col("n_inter")).cast("double"))
          .as("jac"))
      .filter(col("jac") >= tau)
      .orderBy("doc_a", "doc_b")
  }

  /** SQL tail matching [[verifyJaccard]]; expects CTEs `shr` and `cand`
    * to be in scope and emits the final SELECT (starts with a CTE name,
    * so splice after a trailing comma).
    */
  private def sqlVerifyJaccard(tau: Double): String =
    s"""cnt AS (SELECT doc_id, COUNT(*) AS n FROM shr GROUP BY doc_id),
       inter AS (SELECT doc_a, doc_b, COUNT(*) AS n_inter
                 FROM cand JOIN shr sa ON doc_a = sa.doc_id
                           JOIN shr sb ON doc_b = sb.doc_id AND sa.sh = sb.sh
                 GROUP BY doc_a, doc_b)
       SELECT doc_a, doc_b, n_inter, ca.n AS na, cb.n AS nb,
              CAST(n_inter AS DOUBLE) / CAST(ca.n + cb.n - n_inter AS DOUBLE) AS jac
       FROM inter JOIN cnt ca ON doc_a = ca.doc_id
                  JOIN cnt cb ON doc_b = cb.doc_id
       WHERE CAST(n_inter AS DOUBLE) / CAST(ca.n + cb.n - n_inter AS DOUBLE) >= $tau
       ORDER BY doc_a, doc_b"""

  /** Near-duplication provenance matrix — which SOURCES duplicate each
    * other: the verified near-dup pairs joined to each side's source
    * (scan pruned to (doc_id, source)), counted per unordered source
    * pair. The ops report behind every dedup run: a hot (src_i, src_j)
    * cell means two scrapes cover the same underlying content, a hot
    * diagonal means a source re-publishes itself. Pair-cardinality
    * work on top of the existing pipeline. (round 4)
    */
  def dedupSourceMatrix(s: SparkSession, dir: String): DataFrame = {
    val pairs = dedupMinhashLsh(s, dir).select(col("doc_a"), col("doc_b"))
    val srcs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    pairs
      .join(srcs.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        Seq("doc_a"))
      .join(srcs.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("source_lo"),
        greatest(col("sa"), col("sb")).as("source_hi"))
      .groupBy("source_lo", "source_hi")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("source_lo"), col("source_hi"))
  }

  val dedupSourceMatrixSql: String =
    s"""WITH prs AS (SELECT doc_a, doc_b FROM ($dedupMinhashLshSql)),
       j AS (SELECT LEAST(da.source, db.source) AS source_lo,
               GREATEST(da.source, db.source) AS source_hi
             FROM prs
             JOIN documents da ON prs.doc_a = da.doc_id
             JOIN documents db ON prs.doc_b = db.doc_id)
       SELECT source_lo, source_hi, COUNT(*) AS n_pairs
       FROM j GROUP BY source_lo, source_hi
       ORDER BY n_pairs DESC, source_lo, source_hi"""

  /** EXACT set-similarity self-join via PREFIX FILTERING (Chaudhuri et
    * al. 2006 / ppjoin) — the zero-false-negative alternative to LSH
    * blocking for word-shingle Jaccard >= tau: order each doc's
    * shingles rarest-first by global document frequency, keep only the
    * first |S| - ceil(tau*|S|) + 1 as its prefix, and generate
    * candidates from prefix-shingle equality. THEOREM: two sets with
    * J >= tau must share a prefix element under any consistent total
    * order, so unlike banded MinHash nothing true is ever missed —
    * this query IS the ground truth [[dedupLshRecall]] measures
    * against, at corpus scale (no hard cap needed). Rare-first
    * ordering makes prefixes maximally selective: a df=1 shingle
    * admits no candidate at all. Verification reuses the exact
    * Jaccard machinery, so precision is 1 by construction.
    *
    * Scale: the frequency table is shingle-universe-sized (Zipf: far
    * smaller than the (doc, shingle) stream); the prefix join's
    * per-shingle fan-out is bounded by that shingle's df — AQE splits
    * the few hot ones. Candidates ~= true pairs + rare-shingle
    * coincidences, vs LSH's band-collision superset.
    */
  def dedupPrefixFilter(s: SparkSession, dir: String,
      cfg: SimilarityConfig = D): DataFrame =
    dedupPrefixFilterOn(
      Tables.documents(s, dir).select(col("doc_id"), col("text")), cfg)

  /** Plan-time rational LOWER bound p/q <= tau for the ppjoin integer
    * predicates: all bounds derived from p/q are then valid (possibly
    * looser) for the actual verification threshold tau, so the
    * zero-false-negative contract holds for ANY configured tau — not
    * just the 1/2 the round-4 form hardcoded. Denominator 720720
    * (lcm 1..16) makes every simple fraction exact; floor keeps the
    * bound one-sided when tau's double isn't exactly rational.
    */
  private[operators] def tauRational(tau: Double): (Long, Long) = {
    require(tau > 0.0 && tau <= 1.0, s"ppjoin needs tau in (0,1], got $tau")
    val Q = 720720L
    val p = math.floor(tau * Q).toLong max 1L
    val g = BigInt(p).gcd(BigInt(Q)).toLong
    (p / g, Q / g)
  }

  /** [[dedupPrefixFilter]] over any (doc_id, text) frame — split out so
    * the zero-false-negative guarantee is property-testable on
    * generated corpora, not just the oracle corpus.
    */
  def dedupPrefixFilterOn(docs: DataFrame,
      cfg: SimilarityConfig): DataFrame = {
    val (p, q) = tauRational(cfg.minhashTau)
    val shr = docs
      .select(col("doc_id"),
        explode(array_distinct(
          wordShingles(toks(col("text")), cfg.shingleWidth))).as("sh"))
    val freq = shr.groupBy("sh").agg(count(lit(1)).as("df"))
    val wRank = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
    val wSz = Window.partitionBy(col("doc_id"))
    val prefix = shr.join(freq, Seq("sh"))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("sz", count(lit(1)).over(wSz))
      // prefix length |S| - ceil(tau'*|S|) + 1 with tau' = p/q:
      // ceil(p*sz/q) = (p*sz + q - 1) div q, all integer arithmetic
      // (for the default tau = 1/2 this is exactly (sz+1) div 2)
      .filter(col("rn") <=
        col("sz") - expr(s"(sz * $p + ${q - 1}) div $q") + 1)
      .select(col("doc_id"), col("sh"), col("rn"), col("sz"))
      // §7a checkpoint rule: prefix is a compact POST-window frame
      // (~half the shingle stream) consumed by BOTH sides of the
      // candidate self-join — without the cut, Spark re-runs the
      // freq-join + per-doc rank window (the expensive shuffles of
      // this plan) once per side
      .localCheckpoint()
    // ppjoin-style EXACT pruning at candidate generation (measured:
    // 409k -> 125k pairs at sf0.1, and verify cost is linear in
    // pairs), both bounds derived from the SAME p/q rational as the
    // prefix: the LENGTH filter (J >= p/q forces q*min(|A|,|B|) >=
    // p*max), and the POSITIONAL filter (a match at prefix position rn
    // leaves at most min(szA-rnA, szB-rnB)+1 common elements, which
    // must reach the required overlap ceil(p*(szA+szB)/(p+q))). Both
    // are per-row integer predicates on the equi-join — no false
    // negatives by the ppjoin bounds.
    val pb = prefix.select(col("doc_id").as("doc_id_b"),
      col("sh").as("sh_b"), col("rn").as("rn_b"), col("sz").as("sz_b"))
    val cand = prefix.join(pb,
        col("sh") === col("sh_b") && col("doc_id") < col("doc_id_b") &&
          lit(q) * least(col("sz"), col("sz_b")) >=
            lit(p) * greatest(col("sz"), col("sz_b")) &&
          lit(1) + least(col("sz") - col("rn"), col("sz_b") - col("rn_b"))
            >= expr(s"((sz + sz_b) * $p + ${p + q - 1}) div ${p + q}"))
      .select(col("doc_id").as("doc_a"), col("doc_id_b").as("doc_b"))
      .distinct()
    // NOTE (measured twice at sf0.1): verifying on whole shingle
    // ARRAYS (join doc arrays to pairs + array_intersect) looked like
    // it should win at this pair cardinality (~125k pairs vs the LSH
    // tiers' hundreds) but ran 8.9-11.7 s vs 5.6 s for the exploded
    // verify — the §7a array-verify revert holds in the large-pair
    // regime too. Exploded verifyJaccard stays.
    // Set sizes ride the checkpointed prefix frame (every doc has >= 1
    // prefix row and sz is constant per doc) — one less corpus
    // shingling+agg pass than deriving counts from shr.
    val cnt = prefix.select(col("doc_id"), col("sz").as("n")).distinct()
    verifyJaccard(cand, shr, cnt, cfg.minhashTau)
  }

  val dedupPrefixFilterSql: String = {
    // same plan-time p/q rational as the engine side — the two stay in
    // lockstep for any configured default tau
    val (p, q) = tauRational(D.minhashTau)
    s"""WITH shr AS (${sqlShingleRows(D.shingleWidth)}),
       freq AS (SELECT sh, COUNT(*) AS df FROM shr GROUP BY sh),
       ranked AS (SELECT s.doc_id, s.sh,
                    ROW_NUMBER() OVER (PARTITION BY s.doc_id
                                       ORDER BY f.df, s.sh) AS rn,
                    COUNT(*) OVER (PARTITION BY s.doc_id) AS sz
                  FROM shr s JOIN freq f ON s.sh = f.sh),
       pre AS (SELECT doc_id, sh, rn, sz FROM ranked
               WHERE rn <= sz - ((sz * $p + ${q - 1}) // $q) + 1),
       cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM pre a JOIN pre b
                  ON a.sh = b.sh AND a.doc_id < b.doc_id
                 AND $q * LEAST(a.sz, b.sz) >= $p * GREATEST(a.sz, b.sz)
                 AND 1 + LEAST(a.sz - a.rn, b.sz - b.rn)
                     >= ((a.sz + b.sz) * $p + ${p + q - 1}) // ${p + q}),
       ${sqlVerifyJaccard(D.minhashTau)}"""
  }

  /** Recall of the banded-MinHash blocking against exact ground truth
    * — the dedup tier's twin of [[Similarity.annRecallLsh]] (an index
    * you can't measure, you can't trust). Ground truth is the
    * all-pairs exact word-shingle Jaccard over a HARD-CAPPED doc
    * subset (ids < [[RecallCap]] — O(Cap²) pairs via a shingle
    * equi-join, corpus-size-independent); found = the registered LSH
    * pipeline's verified pairs inside that subset. Verification is
    * exact, so precision is 1 by construction and recall isolates
    * exactly the banding misses. One report row.
    */
  val RecallCap = 200L

  def dedupLshRecall(s: SparkSession, dir: String): DataFrame = {
    val shr = Tables.documents(s, dir)
      .filter(col("doc_id") < RecallCap)
      .select(col("doc_id"),
        explode(array_distinct(
          wordShingles(toks(col("text")), D.shingleWidth))).as("sh"))
    val cnt = shr.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = shr.as("a")
      .join(shr.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    val truth = inter
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .filter(col("n_inter").cast("double") /
        (col("ca.n") + col("cb.n") - col("n_inter")).cast("double")
        >= D.minhashTau)
      .select(col("doc_a"), col("doc_b"))
    val found = dedupMinhashLsh(s, dir)
      .filter(col("doc_a") < RecallCap && col("doc_b") < RecallCap)
      .select(col("doc_a"), col("doc_b"))
    val tn = truth.agg(count(lit(1)).as("n_true"))
    val hit = truth.join(found, Seq("doc_a", "doc_b"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    tn.crossJoin(hit)
      .select(col("n_true"), col("n_hit"),
        when(col("n_true") === 0, lit(null).cast("double"))
          .otherwise(col("n_hit").cast("double") /
            col("n_true").cast("double"))
          .as("recall"))
  }

  val dedupLshRecallSql: String =
    s"""WITH found AS (SELECT doc_a, doc_b FROM ($dedupMinhashLshSql)
                       WHERE doc_a < $RecallCap AND doc_b < $RecallCap),
       capshr AS (SELECT * FROM (${graft.functions.Text.sqlShingleRows(
      SimilarityConfig.Default.shingleWidth)})
                  WHERE doc_id < $RecallCap),
       capcnt AS (SELECT doc_id, COUNT(*) AS n FROM capshr GROUP BY 1),
       capint AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    COUNT(*) AS n_inter
                  FROM capshr a JOIN capshr b
                    ON a.sh = b.sh AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
       truth AS (SELECT doc_a, doc_b
                 FROM capint JOIN capcnt ca ON doc_a = ca.doc_id
                             JOIN capcnt cb ON doc_b = cb.doc_id
                 WHERE CAST(n_inter AS DOUBLE)
                   / CAST(ca.n + cb.n - n_inter AS DOUBLE)
                   >= ${SimilarityConfig.Default.minhashTau}),
       tn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM truth),
       hit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
               FROM truth t JOIN found f
                 ON t.doc_a = f.doc_a AND t.doc_b = f.doc_b)
       SELECT n_true, n_hit,
              CASE WHEN n_true = 0 THEN NULL
                   ELSE CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE)
              END AS recall
       FROM tn, hit"""

  /** Repeated-span width for [[dedupSubstringSpans]] (tokens). */
  private val SpanTokens = 8

  /** Exact repeated-substring detection — the substring-level dedup of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better", arXiv:2107.06499), which removes verbatim spans
    * (boilerplate, licenses, templated text) that document-level
    * near-dup misses. The paper builds a suffix array; the
    * Spark-idiomatic equivalent for a fixed span width is a
    * shingle-hash GROUP: every L-token span, grouped, kept when it
    * recurs in >= 2 distinct docs. Output is span-level evidence
    * (span, n_docs, n_occ, first_doc) — the frame a removal pass
    * anti-joins against — NOT the occurrence pair list, whose size is
    * quadratic in a span's document frequency (a license block in 1M
    * docs would explode pairwise; the group row is one line).
    *
    * Scale shape: the (doc, span) explode is token-proportional
    * (linear, the same blow-up every shingle operator here pays); the
    * group shuffles narrow (span-key, partial-count) rows with
    * map-side combine; docs shorter than L are excluded rather than
    * clamped — a whole short doc is document-level dedup's job
    * ([[dedupExactHash]]), not a span. (round 5)
    */
  def dedupSubstringSpans(s: SparkSession, dir: String): DataFrame =
    dedupSubstringSpansOn(
      Tables.documents(s, dir).select(col("doc_id"), col("text")),
      SpanTokens)

  /** [[dedupSubstringSpans]] over an arbitrary (doc_id, text) frame
    * with a caller-chosen span width — the library entry point and the
    * generated-corpus spec hook.
    */
  def dedupSubstringSpansOn(docs: DataFrame, spanTokens: Int): DataFrame =
    docs
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .filter(size(col("tk")) >= spanTokens)
      .select(col("doc_id"),
        explode(wordShingles(col("tk"), spanTokens)).as("span"))
      .groupBy("span")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("span"))

  val dedupSubstringSpansSql: String =
    s"""WITH tk AS (SELECT doc_id, ${sqlToks("text")} AS tk FROM documents),
       sp AS (SELECT doc_id,
                     array_to_string(tk[i:i+${SpanTokens - 1}], ' ') AS span
              FROM (SELECT doc_id, tk,
                      unnest(generate_series(1, len(tk) - ${SpanTokens - 1}))
                        AS i
                    FROM tk WHERE len(tk) >= $SpanTokens))
       SELECT span, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
              CAST(COUNT(*) AS BIGINT) AS n_occ,
              CAST(MIN(doc_id) AS BIGINT) AS first_doc
       FROM sp GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
       ORDER BY n_docs DESC, n_occ DESC, span"""

  /** The REMOVAL pass over [[dedupSubstringSpans]]'s evidence — Lee et
    * al.'s actual edit: excise every occurrence of every cross-doc
    * repeated span from every document, keeping the surrounding text.
    * Occurrences land as (doc, start, end) token intervals; each doc
    * then drops exactly the tokens covered by at least one interval —
    * coverage is a per-row array `exists` over the doc's own interval
    * list (overlapping spans compose correctly without an interval
    * merge: coverage is a union either way). Output keeps every doc
    * (n_removed = 0 when untouched) with the rebuilt text joined by
    * single spaces (tokenizer-normalized, like [[Chunking]]'s rebuilt
    * docs).
    *
    * Scale shape: span grouping and the occurrence join are the same
    * narrow token-linear streams as the evidence query; the interval
    * list aggregates per doc (bounded by the doc's own occurrence
    * count, never corpus-sized), and the excision is pure per-row
    * codegen'd array work — no window, no range join. (round 5)
    */
  def stripRepeatedSpans(s: SparkSession, dir: String): DataFrame =
    stripRepeatedSpansOn(
      Tables.documents(s, dir).select(col("doc_id"), col("text")),
      SpanTokens)

  /** [[stripRepeatedSpans]] over an arbitrary (doc_id, text) frame with
    * a caller-chosen span width — the library entry point and the
    * generated-corpus spec hook.
    */
  def stripRepeatedSpansOn(docsRaw: DataFrame, spanTokens: Int): DataFrame = {
    val docs = docsRaw.select(col("doc_id"), toks(col("text")).as("tk"))
    val sp = docs.filter(size(col("tk")) >= spanTokens)
      .select(col("doc_id"),
        posexplode(wordShingles(col("tk"), spanTokens))
          .as(Seq("p0", "span")))
    val bad = sp.groupBy("span")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select("span")
    val ivs = sp.join(bad, "span")
      .select(col("doc_id"), (col("p0") + 1).as("s"),
        (col("p0") + lit(spanTokens)).as("e"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("ivs"))
    docs.join(ivs, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
        when(col("ivs").isNull, col("tk"))
          .otherwise(filter(col("tk"), (_, i) =>
            !exists(col("ivs"), v =>
              v.getField("s") <= i + 1 && i + 1 <= v.getField("e"))))
          .as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("kept_text"))
      .orderBy("doc_id")
  }

  val stripRepeatedSpansSql: String =
    s"""WITH tk AS (SELECT doc_id, ${sqlToks("text")} AS tk FROM documents),
       sp AS (SELECT doc_id, i AS s, i + ${SpanTokens - 1} AS e,
                     array_to_string(tk[i:i+${SpanTokens - 1}], ' ') AS span
              FROM (SELECT doc_id, tk,
                      unnest(generate_series(1, len(tk) - ${SpanTokens - 1}))
                        AS i
                    FROM tk WHERE len(tk) >= $SpanTokens)),
       bad AS (SELECT span FROM sp GROUP BY span
               HAVING COUNT(DISTINCT doc_id) >= 2),
       occ AS (SELECT doc_id, s, e FROM sp JOIN bad USING (span)),
       iv AS (SELECT doc_id, list({'s': s, 'e': e}) AS ivs
              FROM occ GROUP BY doc_id),
       k AS (SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
               CASE WHEN i.ivs IS NULL THEN t.tk
                    ELSE list_filter(list_transform(
                           generate_series(1, len(t.tk)),
                           p -> CASE WHEN len(list_filter(i.ivs,
                                    v -> v.s <= p AND p <= v.e)) > 0
                                THEN NULL ELSE t.tk[p] END),
                           x -> x IS NOT NULL) END AS kept
             FROM tk t LEFT JOIN iv i USING (doc_id))
       SELECT doc_id, n_tokens,
              CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
              COALESCE(array_to_string(kept, ' '), '') AS kept_text
       FROM k ORDER BY doc_id"""

  /** LSH bucket-health monitor — the ops dashboard for the MinHash
    * blocking stage ("are my bands actually blocking"): per band, the
    * bucket count, singleton share, largest bucket, and the candidate-
    * pair mass Σ C(sz,2) the band contributes, with the collision rate
    * against all C(N,2) pairs. A band whose max bucket explodes (hot
    * boilerplate shingle) or whose collision rate rivals N² is
    * mis-tuned — this is the evidence that picks SimilarityConfig's
    * band geometry, graded data not guesswork. Pair mass accumulates
    * in DECIMAL(38,0)/HUGEINT (a degenerate single-bucket band is
    * C(N,2) ~ N²/2, past BIGINT at ~4e9 docs). Scale: the signature
    * pass is the dedup_minhash_lsh map-side chain; everything after is
    * bucket-cardinality aggregates. (round 6)
    */
  def lshBucketStats(s: SparkSession, dir: String): DataFrame = {
    val cfg = D
    // the signature chain mirrors minhashBlocks (shingle -> salted md5
    // lanes); duplicated here because the blocking stage fuses its
    // shingle-count column into the same agg
    val shr = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(
          wordShingles(toks(col("text")), cfg.shingleWidth))).as("sh"))
    val mhCols = (0 until cfg.minhashK).map { i =>
      min(substring(md5(concat(lit(s"${i / 4}:"), col("sh"))),
        (i % 4) * 8 + 1, 8)).as(s"mh$i")
    }
    val mh = shr.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
    val buckets = bandRowsOf(mh, cfg)
      .groupBy("band_id", "band_hash")
      .agg(count(lit(1)).as("sz"))
    buckets.groupBy("band_id")
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("sz")).as("n_docs"),
        sum(when(col("sz") === 1, 1L).otherwise(0L)).as("n_singleton"),
        max(col("sz")).as("max_bucket"),
        sum(expr(
          "cast((cast(sz as decimal(38,0)) * (sz - 1)) / 2 as decimal(38,0))"))
          .cast("decimal(38,0)").as("cp"))
      // cand_pairs surfaces as DOUBLE: the decimal pair mass passes
      // BIGINT at ~4e9 docs, so a long cast would reintroduce the very
      // overflow the decimal accumulator exists to avoid (ANSI Spark
      // would throw, DuckDB's CAST errors); collision_rate is gated on
      // n_docs > 1 (a band of singletons has no pair capacity — 0/0)
      .select(col("band_id").cast("long").as("band_id"), col("n_buckets"),
        col("n_docs"), col("n_singleton"), col("max_bucket"),
        col("cp").cast("double").as("cand_pairs"),
        when(col("n_docs") > 1,
          col("cp").cast("double")
            / ((col("n_docs").cast("decimal(38,0)") * (col("n_docs") - 1)) / 2)
              .cast("double")).as("collision_rate"))
      .orderBy("band_id")
  }

  val lshBucketStatsSql: String =
    s"""WITH $sqlMinhashBlockCtes,
       b AS (SELECT band_id, band_hash, CAST(COUNT(*) AS BIGINT) AS sz
             FROM bands GROUP BY 1, 2)
       SELECT CAST(band_id AS BIGINT) AS band_id,
              CAST(COUNT(*) AS BIGINT) AS n_buckets,
              CAST(SUM(sz) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_singleton,
              CAST(MAX(sz) AS BIGINT) AS max_bucket,
              CAST(CAST(SUM((CAST(sz AS HUGEINT) * (sz - 1)) // 2)
                        AS VARCHAR) AS DOUBLE) AS cand_pairs,
              CASE WHEN SUM(sz) > 1 THEN
                CAST(CAST(SUM((CAST(sz AS HUGEINT) * (sz - 1)) // 2)
                          AS VARCHAR) AS DOUBLE)
                  / CAST(CAST((CAST(SUM(sz) AS HUGEINT) * (SUM(sz) - 1)) // 2
                              AS VARCHAR) AS DOUBLE) END AS collision_rate
       FROM b GROUP BY band_id ORDER BY band_id"""

  /** Near-dup cluster size distribution — the summary a dedup run is
    * judged by ("how much of the corpus is duplicated, in what clump
    * sizes"): cluster sizes from [[dedupClusters]]' connected
    * components, histogrammed, with each size's corpus share. Every
    * cluster has ≥ 2 members by construction (vertices exist only via
    * pairs). Cost on top of the cluster build: two cluster-cardinality
    * aggregates and one 1-row broadcast — nothing corpus-shaped is
    * new. (round 6)
    */
  def dedupClusterStats(s: SparkSession, dir: String): DataFrame = {
    val sizes = dedupClusters(s, dir)
      .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    val tot = Tables.documents(s, dir).agg(count(lit(1)).as("n_corpus"))
    sizes.groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"))
      .crossJoin(broadcast(tot))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        (col("n_docs").cast("double") / col("n_corpus").cast("double"))
          .as("corpus_share"))
      .orderBy("cluster_size")
  }

  val dedupClusterStatsSql: String =
    s"""WITH cs AS (SELECT cluster_id,
                          CAST(COUNT(*) AS BIGINT) AS cluster_size
                   FROM ($dedupClustersSql) GROUP BY 1),
       tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM documents)
       SELECT cs.cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
              CAST(SUM(cs.cluster_size) AS BIGINT) AS n_docs,
              CAST(SUM(cs.cluster_size) AS DOUBLE)
                / CAST(t.n_corpus AS DOUBLE) AS corpus_share
       FROM cs CROSS JOIN tot t
       GROUP BY cs.cluster_size, t.n_corpus
       ORDER BY cs.cluster_size"""

  def queries: Seq[Q] = Seq(
    Q("dedup_cluster_stats", Some(dedupClusterStatsSql))(dedupClusterStats),
    Q("lsh_bucket_stats", Some(lshBucketStatsSql))(lshBucketStats),
    Q("dedup_exact_hash", Some(dedupExactHashSql))(dedupExactHash),
    Q("dedup_token_sort", Some(dedupTokenSortSql))(dedupTokenSort),
    Q("fingerprint_winnowing", Some(fingerprintWinnowingSql))(
      fingerprintWinnowing),
    Q("dedup_winnowing", Some(dedupWinnowingSql), bench = true)(
      dedupWinnowing),
    Q("dedup_substring_spans", Some(dedupSubstringSpansSql), bench = true)(
      dedupSubstringSpans),
    Q("strip_repeated_spans", Some(stripRepeatedSpansSql))(
      stripRepeatedSpans),
    Q("dedup_lsh_recall", Some(dedupLshRecallSql))(dedupLshRecall),
    Q("dedup_source_matrix", Some(dedupSourceMatrixSql))(dedupSourceMatrix),
    Q("dedup_prefix_filter", Some(dedupPrefixFilterSql), bench = true,
      auditTier = true)(dedupPrefixFilter(_, _, D)),
    Q("dedup_minhash_lsh", Some(dedupMinhashLshSql), bench = true)(dedupMinhashLsh),
    Q("dedup_simhash", Some(dedupSimhashSql), bench = true)(dedupSimhash),
    Q("dedup_ngram_jaccard", Some(dedupNgramJaccardSql))(dedupNgramJaccard),
    Q("dedup_clusters", Some(dedupClustersSql))(dedupClusters),
    Q("dedup_keep_policy", Some(dedupKeepPolicySql))(dedupKeepPolicy),
    Q("dedup_incremental", Some(dedupIncrementalSql))(dedupIncremental),
    Q("dedup_containment", Some(dedupContainmentSql))(dedupContainment),
    Q("dedup_editdist", Some(dedupEditDistanceSql))(dedupEditDistance),
    Q("dedup_embedding_cosine", Some(dedupEmbeddingCosineSql), bench = true)(dedupEmbeddingCosine),
    Q("dedup_embedding_recall", Some(dedupEmbeddingRecallSql))(dedupEmbeddingRecall))
}
