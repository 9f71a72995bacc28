package graft.operators

import graft.Q
import graft.functions.Text._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis suite for training-data curation over `documents`:
  * language ID, quality scoring, token counting, fingerprinting, plus the
  * reference's dashboard-style term analytics (top terms, co-occurrence).
  *
  * Everything is projection + one aggregation shuffle; the (doc, token)
  * explosion always happens after projecting to (id, tokens) only
  * (SURVEY.md §6). Ratios divide exact integers at the very end, so
  * doubles are bit-identical to the oracle.
  */
object TextAnalysis {

  /** Top-k terms across the corpus (word count, the dashboard classic). */
  def topTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(toks(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)

  val topTokensSql: String =
    s"""SELECT token, COUNT(*) AS n
       FROM (SELECT unnest(${sqlToks("text")}) AS token FROM documents)
       GROUP BY token ORDER BY n DESC, token LIMIT 50"""

  /** Sketched top-k terms via the SpaceSaving heavy-hitters aggregate
    * ([[graft.plans.SpaceSavingTopK]]): bounded per-partition state and
    * a single-row merge instead of shuffling the full term dictionary —
    * the 100 TB form of [[topTokens]]. Rows-only check (the sketch is
    * approximate by design; its guarantees are spec-tested).
    */
  def topTokensSketch(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(toks(col("text"))).as("token"))
      .agg(expr("graft_topk_sketch(token, 20, 256)").as("top"))
      .select(posexplode(col("top")).as(Seq("i", "e")))
      .select((col("i") + 1).as("rank"), col("e.term").as("term"),
        col("e.cnt").as("cnt"), col("e.err").as("err"))

  /** Corpus bigram frequencies (top-50): the n-gram LM statistics
    * layer above [[topTokens]] — bigram tables feed next-token LM
    * quality scoring, contamination heuristics, and collocation
    * mining. Rides the codegen'd [[graft.functions.Text.wordShingles]]
    * (per-row array work; the (doc, bigram) blow-up happens only in
    * the exploded agg input, projected to the bigram string alone).
    * Docs under 2 tokens are excluded — the shingle helper's clamp
    * would emit a fake 1-token "bigram" for them.
    */
  def topBigrams(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(toks(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(explode(wordShingles(col("tk"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(50)

  val topBigramsSql: String =
    s"""SELECT bigram, COUNT(*) AS n FROM (
         SELECT array_to_string(list_slice(tk, i, i + 1), ' ') AS bigram
         FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
               FROM (SELECT ${sqlToks("text")} AS tk FROM documents)
               WHERE len(tk) >= 2))
       GROUP BY 1 ORDER BY n DESC, bigram LIMIT 50"""

  /** RAKE stopword set for this corpus's vocabulary — the phrase
    * delimiters. RAKE segments each document into candidate phrases at
    * stopword boundaries; real deployments plug in a full stopword
    * list, the algorithm is delimiter-set-agnostic.
    */
  val RakeStopwords: Seq[String] = Seq("a", "the")

  /** RAKE keyword extraction (Rapid Automatic Keyword Extraction,
    * Rose et al. 2010): candidate phrases are maximal stopword-free
    * token runs; each word scores degree/frequency where freq counts
    * its occurrences and degree sums the lengths of the phrases
    * containing it (a word's co-occurrence mass). Top-50 by the exact
    * integer-scaled ratio `degree*1e6 div freq` — no doubles anywhere,
    * so the ranking is hash-portable.
    *
    * Shape at scale: one (doc, token) posexplode projected to three
    * narrow columns, a per-DOC running-sum window (phrase ids — always
    * partitioned, never global), one doc-local equi-join attaching
    * phrase lengths, and one token-keyed agg. Everything between scan
    * and the final word agg partitions by doc_id; the word agg is the
    * same shuffle as [[topTokens]]. Mirrors the reference's keyword
    * mining role (/root/reference/spark_pipeline/skillner.py's
    * phrase-candidate pass) as a corpus-level statistic.
    */
  def keywordRake(s: SparkSession, dir: String): DataFrame =
    keywordRakeOn(Tables.documents(s, dir))

  /** [[keywordRake]] over a caller-supplied (doc_id, text) frame — the
    * library entry point and the constructed-corpus spec hook.
    */
  def keywordRakeOn(docs: DataFrame): DataFrame = {
    val tk = docs
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "token")))
      .withColumn("is_stop",
        col("token").isInCollection(RakeStopwords).cast("long"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val phrased = tk
      .withColumn("phrase_id", sum(col("is_stop")).over(wDoc))
      .filter(col("is_stop") === 0)
      .select(col("doc_id"), col("phrase_id"), col("token"))
    val plen = phrased.groupBy("doc_id", "phrase_id")
      .agg(count(lit(1)).as("plen"))
    phrased.join(plen, Seq("doc_id", "phrase_id"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
      .select(col("token").as("word"), col("freq"), col("degree"),
        expr("(degree * 1000000) div freq").as("score_scaled"))
      .orderBy(col("score_scaled").desc, col("word"))
      .limit(50)
  }

  val keywordRakeSql: String = {
    val stops = RakeStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH tk AS (SELECT doc_id, unnest(tks) AS token,
               CAST(generate_subscripts(tks, 1) AS INT) AS pos
             FROM (SELECT doc_id, ${sqlToks("text")} AS tks FROM documents)),
       m AS (SELECT doc_id, token, pos,
               CASE WHEN token IN ($stops) THEN 1 ELSE 0 END AS is_stop
             FROM tk),
       ph AS (SELECT doc_id, token, is_stop,
               CAST(SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos)
                 AS BIGINT) AS phrase_id
             FROM m),
       nst AS (SELECT doc_id, token, phrase_id FROM ph WHERE is_stop = 0),
       pl AS (SELECT doc_id, phrase_id, CAST(COUNT(*) AS BIGINT) AS plen
              FROM nst GROUP BY 1, 2),
       wd AS (SELECT n.token AS word, CAST(COUNT(*) AS BIGINT) AS freq,
                CAST(SUM(p.plen) AS BIGINT) AS degree
              FROM nst n JOIN pl p USING (doc_id, phrase_id)
              GROUP BY 1)
       SELECT word, freq, degree,
              CAST((degree * 1000000) // freq AS BIGINT) AS score_scaled
       FROM wd ORDER BY score_scaled DESC, word LIMIT 50"""
  }

  /** Tokenizer-style vocabulary build + corpus re-encoding — the
    * training-prep step every LM pipeline runs: assign each distinct
    * token a dense id by (count DESC, token ASC) and rewrite every
    * document as its space-joined id sequence. The id assignment is
    * [[graft.functions.Keys.denseIds]] on (-count, token) — the
    * two-phase per-bucket rank + broadcast offsets, so a
    * billion-token vocabulary numbers itself without a global window.
    * Re-encoding is a token-keyed equi-join (vocab-sized, AQE splits
    * head tokens) and a per-doc ordered reassembly via
    * array_sort-on-(pos,id) inside the agg — order is carried by data,
    * not by partitioning, so the encoded string is partition-count-
    * independent. Final schema is scalar-only (joined string).
    */
  def vocabEncodeDocs(s: SparkSession, dir: String): DataFrame =
    vocabEncodeDocsOn(Tables.documents(s, dir))

  /** [[vocabEncodeDocs]] over a caller-supplied (doc_id, text) frame. */
  def vocabEncodeDocsOn(docs: DataFrame): DataFrame = {
    val tk = docs
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "token")))
    val counts = tk.groupBy("token").agg(count(lit(1)).as("cnt"))
    val vocab = graft.functions.Keys.denseIds(
      counts.select(col("token"), (-col("cnt")).as("negcnt")),
      Nil, Seq("negcnt", "token"), "tok_id")
      .select(col("token"), col("tok_id"))
    tk.join(vocab, "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok_id")))),
            x => x.getField("tok_id").cast("string")), " ").as("encoded"))
      .orderBy(col("doc_id"))
  }

  val vocabEncodeDocsSql: String =
    s"""WITH tk AS (SELECT doc_id, unnest(tks) AS token,
               CAST(generate_subscripts(tks, 1) AS INT) AS pos
             FROM (SELECT doc_id, ${sqlToks("text")} AS tks FROM documents)),
       c AS (SELECT token, COUNT(*) AS cnt FROM tk GROUP BY 1),
       v AS (SELECT token, CAST(ROW_NUMBER() OVER
               (ORDER BY cnt DESC, token) AS INT) AS tok_id FROM c)
       SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
              string_agg(CAST(v.tok_id AS VARCHAR), ' ' ORDER BY t.pos) AS encoded
       FROM tk t JOIN v USING (token)
       GROUP BY t.doc_id ORDER BY t.doc_id"""

  /** Skill co-occurrence pairs (the reference's skill-graph dashboard):
    * per-doc skill matches self-joined with id_a < id_b. The join is on
    * doc_id — narrow after the phrase-match dedup.
    */
  /** [[skillCooccurrence]] WITHOUT its presentation sort — the frame
    * every graph consumer (PageRank, BFS, LPA, modularity, link
    * prediction, …) checkpoints before re-aggregating. The declared
    * query's ORDER BY is a range exchange plus its sampling pass, paid
    * INSIDE each consumer's eager checkpoint for rows whose order the
    * consumer destroys on its first shuffle — consumers take the
    * unsorted pairs, the registered query keeps its sort (round 15,
    * guide §2.4: an orderBy used only to make output deterministic is
    * a removable exchange when nothing downstream needs it).
    */
  private[operators] def skillCoocPairs(s: SparkSession,
      dir: String): DataFrame = {
    // Basket form (round 15, guide §2.3/§2.4 — was a doc_id-keyed
    // self-join of the extract output, which shuffled the match frame
    // twice, sort-merge-joined it, AND recomputed the corpus extract
    // chain once per side): collect each document's skill set ONCE
    // (collect_set dedups exactly like the extract's distinct — the
    // per-doc set is vocabulary-bounded, never corpus-bounded, so the
    // agg state is a bounded basket, the market-basket shape), then
    // expand the i<j pairs MAP-SIDE from the skill_id-sorted array.
    // One corpus pass, one (doc_id) shuffle of ~|docs| basket rows,
    // one brands²-bounded pair aggregate — vs two corpus passes, a
    // distinct exchange, two join exchanges and two sorts. Pair
    // ordering is skill_id (the struct sort key), identical to the
    // old a.skill_id < b.skill_id join predicate; counts are exact
    // integers, so results are bit-identical. The basket agg consumes
    // the PRE-dedup match stream — collect_set dedups exactly like the
    // extract's distinct did, so that exchange disappears too and the
    // one remaining shuffle carries one ≤|vocab|-element set per
    // (document, map partition), not occurrence rows.
    val m = SkillExtract.phraseMatchStream(s, dir)
      .select(col("doc_id"), col("skill"), col("skill_id"))
    val baskets = m.groupBy("doc_id")
      .agg(sort_array(collect_set(struct(col("skill_id"), col("skill"))))
        .as("bs"))
    baskets
      .select(explode(flatten(transform(col("bs"), (x, i) =>
        transform(slice(col("bs"), i + lit(2), size(col("bs"))),
          y => struct(x.getField("skill").as("skill_a"),
            y.getField("skill").as("skill_b")))))).as("p"))
      .groupBy(col("p.skill_a").as("skill_a"), col("p.skill_b").as("skill_b"))
      .agg(count(lit(1)).as("n"))
  }

  def skillCooccurrence(s: SparkSession, dir: String): DataFrame =
    skillCoocPairs(s, dir)
      .orderBy(col("n").desc, col("skill_a"), col("skill_b"))

  val skillCooccurrenceSql: String =
    s"""WITH m AS (SELECT * FROM (${SkillExtract.skillExtractPhraseSql}))
       SELECT a.skill AS skill_a, b.skill AS skill_b, COUNT(*) AS n
       FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.skill_id < b.skill_id
       GROUP BY 1, 2 ORDER BY n DESC, skill_a, skill_b"""

  /** Top skills per sector — the reference's flagship dashboard shape
    * (sector drill-down into its dominant skills) as one composed
    * pipeline: keyword sector classification joined to the
    * phrase-extracted skills, counted, top-3 per sector by a
    * partitioned rank window. Catalyst rewrites the rank filter into a
    * WindowGroupLimit (per-partition top-k pushdown), so only k rows
    * per sector survive each partial — the window never materializes
    * the full (sector, skill) ranking.
    */
  def topSkillsPerSector(s: SparkSession, dir: String): DataFrame = {
    val sectors = Tables.documents(s, dir)
      .select(col("doc_id"),
        when(col("text").contains("spark"), "Data")
          .when(col("text").contains("stream"), "Streaming")
          .when(col("text").contains("customer"), "CRM")
          .when(col("text").contains("vector"), "ML")
          .otherwise("Autre").as("secteur"))
    val w = Window.partitionBy(col("secteur"))
      .orderBy(col("n").desc, col("skill"))
    SkillExtract.skillExtractPhrase(s, dir)
      .join(sectors, "doc_id")
      .groupBy("secteur", "skill")
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy("secteur", "rk")
  }

  val topSkillsPerSectorSql: String =
    s"""WITH m AS (SELECT * FROM (${SkillExtract.skillExtractPhraseSql})),
       sec AS (SELECT doc_id, CASE
                 WHEN contains(text, 'spark') THEN 'Data'
                 WHEN contains(text, 'stream') THEN 'Streaming'
                 WHEN contains(text, 'customer') THEN 'CRM'
                 WHEN contains(text, 'vector') THEN 'ML'
                 ELSE 'Autre' END AS secteur
               FROM documents),
       cnt AS (SELECT secteur, skill, COUNT(*) AS n
               FROM m JOIN sec USING (doc_id)
               GROUP BY secteur, skill),
       r AS (SELECT secteur, skill, n,
               ROW_NUMBER() OVER (PARTITION BY secteur
                 ORDER BY n DESC, skill) AS rk
             FROM cnt)
       SELECT secteur, skill, n, CAST(rk AS INT) AS rk
       FROM r WHERE rk <= 3 ORDER BY secteur, rk"""

  // Stopword marker lists per language for the n-gram/stopword-hit
  // language-ID heuristic. Priority order en > fr > de > es on ties.
  // Shared with Curation's quality gate.
  private[operators] val Stop: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "in", "to"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une"),
    "de" -> Seq("der", "die", "das", "und", "ein"),
    "es" -> Seq("el", "los", "las", "y", "como"))

  private def hitCount(tk: Column, words: Seq[String]): Column =
    size(filter(array_distinct(tk),
      t => array_contains(array(words.map(lit): _*), t)))

  private def sqlHitCount(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(list_distinct(tk), t -> list_contains($arr, t)))"
  }

  /** The priority-ordered argmax over the four `*_hits` columns —
    * shared by [[langIdNgram]]'s confusion matrix and [[cohenKappa]]'s
    * agreement scalar so the two keys can never disagree on what the
    * classifier predicted. */
  private def predLangCase: Column =
    when(col("en_hits") >= greatest(col("fr_hits"), col("de_hits"),
      col("es_hits")) && col("en_hits") > 0, "en")
      .when(col("fr_hits") >= greatest(col("de_hits"), col("es_hits")) &&
        col("fr_hits") > 0, "fr")
      .when(col("de_hits") >= col("es_hits") && col("de_hits") > 0, "de")
      .when(col("es_hits") > 0, "es")
      .otherwise("und")

  /** Language-ID heuristic: distinct stopword hits per language,
    * priority-ordered argmax, confusion summary against the labeled
    * `lang` column.
    */
  def langIdNgram(s: SparkSession, dir: String): DataFrame = {
    val tk = toks(col("text"))
    val hits = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        hitCount(tk, Stop(0)._2).as("en_hits"),
        hitCount(tk, Stop(1)._2).as("fr_hits"),
        hitCount(tk, Stop(2)._2).as("de_hits"),
        hitCount(tk, Stop(3)._2).as("es_hits"))
    hits.select(col("lang"), col("en_hits"), col("fr_hits"),
        col("de_hits"), col("es_hits"), predLangCase.as("pred_lang"))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("en_hits")).as("sum_en_hits"))
      .orderBy("lang", "pred_lang")
  }

  val langIdNgramSql: String =
    s"""WITH hits AS (
         SELECT doc_id, lang,
           ${sqlHitCount(Stop(0)._2)} AS en_hits,
           ${sqlHitCount(Stop(1)._2)} AS fr_hits,
           ${sqlHitCount(Stop(2)._2)} AS de_hits,
           ${sqlHitCount(Stop(3)._2)} AS es_hits
         FROM (SELECT doc_id, lang, ${sqlToks("text")} AS tk FROM documents)),
       pred AS (
         SELECT lang, en_hits, fr_hits, de_hits, es_hits,
           CASE WHEN en_hits >= greatest(fr_hits, de_hits, es_hits) AND en_hits > 0 THEN 'en'
                WHEN fr_hits >= greatest(de_hits, es_hits) AND fr_hits > 0 THEN 'fr'
                WHEN de_hits >= es_hits AND de_hits > 0 THEN 'de'
                WHEN es_hits > 0 THEN 'es'
                ELSE 'und' END AS pred_lang
         FROM hits)
       SELECT lang, pred_lang, COUNT(*) AS n_docs,
              CAST(SUM(en_hits) AS BIGINT) AS sum_en_hits
       FROM pred GROUP BY lang, pred_lang ORDER BY lang, pred_lang"""

  /** The shared hits→prediction CTE pair for the DuckDB twins of
    * [[langIdNgram]] and [[cohenKappa]]. */
  private def sqlLangPredCtes: String =
    s"""hits AS (
         SELECT doc_id, lang,
           ${sqlHitCount(Stop(0)._2)} AS en_hits,
           ${sqlHitCount(Stop(1)._2)} AS fr_hits,
           ${sqlHitCount(Stop(2)._2)} AS de_hits,
           ${sqlHitCount(Stop(3)._2)} AS es_hits
         FROM (SELECT doc_id, lang, ${sqlToks("text")} AS tk FROM documents)),
       pred AS (
         SELECT lang,
           CASE WHEN en_hits >= greatest(fr_hits, de_hits, es_hits) AND en_hits > 0 THEN 'en'
                WHEN fr_hits >= greatest(de_hits, es_hits) AND fr_hits > 0 THEN 'fr'
                WHEN de_hits >= es_hits AND de_hits > 0 THEN 'de'
                WHEN es_hits > 0 THEN 'es'
                ELSE 'und' END AS pred_lang
         FROM hits)"""

  /** Cohen's kappa of the [[langIdNgram]] classifier against the
    * labeled `lang` column — chance-corrected agreement, the one-number
    * answer "is this classifier better than marginal guessing" that
    * raw accuracy cannot give under class imbalance (a corpus that is
    * 90% English hands any constant-'en' rule 90% accuracy and kappa
    * 0). κ = (N·D − E) / (N² − E) with D the diagonal count and
    * E = Σ_c row_c·col_c, all exact BIGINT/DECIMAL(38,0) (N² and the
    * marginal products pass BIGINT near N ~ 3e9 docs), one double
    * division at the surface; a degenerate table with all mass in one
    * agreeing cell has pe = 1 and no chance correction — NULL kappa
    * (the §7b zero-division rule; ConstantCorpusSpec exercises exactly
    * that corpus). Scale: rides the same one-scan hit projection as
    * lang_id; everything after the (lang, pred) cell aggregate is
    * classes²-cardinality. (round 7)
    */
  def cohenKappa(s: SparkSession, dir: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val tk = toks(col("text"))
    val cells = Tables.documents(s, dir)
      .select(col("lang"),
        hitCount(tk, Stop(0)._2).as("en_hits"),
        hitCount(tk, Stop(1)._2).as("fr_hits"),
        hitCount(tk, Stop(2)._2).as("de_hits"),
        hitCount(tk, Stop(3)._2).as("es_hits"))
      .select(col("lang"), predLangCase.as("pred_lang"))
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      .localCheckpoint() // classes²-row frame feeds four branches
    val rowsM = cells.groupBy(col("lang").as("cls"))
      .agg(sum(col("n")).as("rn"))
    val colsM = cells.groupBy(col("pred_lang").as("cls"))
      .agg(sum(col("n")).as("cn"))
    val e = rowsM.join(colsM, Seq("cls"), "full_outer")
      .agg(sum(dec(coalesce(col("rn"), lit(0L)))
        * coalesce(col("cn"), lit(0L))).cast("decimal(38,0)").as("e"))
    val d = cells.filter(col("lang") === col("pred_lang"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("d"))
    val t = cells.agg(sum(col("n")).as("nn"))
    t.crossJoin(d).crossJoin(e)
      .select(col("nn").as("n_docs"), col("d").as("n_agree"),
        (col("d").cast("double") / col("nn").cast("double")).as("po"),
        (col("e").cast("double")
          / (dec(col("nn")) * col("nn")).cast("double")).as("pe"),
        when(dec(col("nn")) * col("nn") - col("e") > 0,
          (dec(col("nn")) * col("d") - col("e")).cast("double")
            / (dec(col("nn")) * col("nn") - col("e")).cast("double"))
          .as("kappa"))
  }

  val cohenKappaSql: String =
    s"""WITH $sqlLangPredCtes,
       cells AS (SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
                 FROM pred GROUP BY 1, 2),
       rs AS (SELECT lang AS cls, CAST(SUM(n) AS BIGINT) AS rn
              FROM cells GROUP BY 1),
       cs AS (SELECT pred_lang AS cls, CAST(SUM(n) AS BIGINT) AS cn
              FROM cells GROUP BY 1),
       e AS (SELECT SUM(CAST(COALESCE(rn, 0) AS HUGEINT)
                        * COALESCE(cn, 0)) AS e
             FROM rs FULL OUTER JOIN cs USING (cls)),
       d AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS d
             FROM cells WHERE lang = pred_lang),
       t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells)
       SELECT t.nn AS n_docs, d.d AS n_agree,
              CAST(d.d AS DOUBLE) / CAST(t.nn AS DOUBLE) AS po,
              CAST(CAST(e.e AS VARCHAR) AS DOUBLE)
                / CAST(CAST(CAST(t.nn AS HUGEINT) * t.nn AS VARCHAR)
                       AS DOUBLE) AS pe,
              CASE WHEN CAST(t.nn AS HUGEINT) * t.nn - e.e > 0 THEN
                CAST(CAST(CAST(t.nn AS HUGEINT) * d.d - e.e AS VARCHAR)
                     AS DOUBLE)
                  / CAST(CAST(CAST(t.nn AS HUGEINT) * t.nn - e.e AS VARCHAR)
                         AS DOUBLE) END AS kappa
       FROM t CROSS JOIN d CROSS JOIN e"""

  /** Word-k-gram width for [[ngramNovelty]]. */
  val NoveltyWidth = 3

  /** Support floor / output cap for [[collocationLift]]. */
  val CollocMinCount = 5
  val CollocTopK = 50

  /** Collocation mining by LIFT — PMI's log-free monotone twin
    * (log is transcendental and engine-unportable; lift = P(ab) /
    * P(a)P(b) ranks identically since log is monotone): which adjacent
    * word pairs co-occur far above chance — the multi-word-expression
    * detector next to [[topBigrams]]' raw counts (raw counts surface
    * "of the"; lift surfaces genuine collocations) and
    * [[skillAssociation]]'s doc-level lift. Exact arithmetic: lift =
    * cb·N_uni² / (N_bi·c_a·c_b) in DECIMAL(38,0)/HUGEINT (N_uni² passes
    * BIGINT near 3e9 tokens), one division; support floor ≥
    * [[CollocMinCount]], deterministic top-[[CollocTopK]] by (lift
    * desc, pair) — identical doubles make the cut identical. Scale:
    * two token-cardinality aggregates, joins on the vocab frames,
    * top-k planned as TakeOrderedAndProject. (round 7)
    */
  def collocationLift(s: SparkSession, dir: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val docs = Tables.documents(s, dir)
    val uni = docs.select(explode(toks(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cu"))
      .localCheckpoint() // feeds the total AND both pair-side joins
    val nu = uni.agg(sum(col("cu")).as("nu"))
    val biAll = docs
      .select(explode(wordShingles(toks(col("text")), 2)).as("sh"))
      .filter(instr(col("sh"), " ") > 0) // 1-token docs yield no pair
      .groupBy("sh").agg(count(lit(1)).as("cb"))
      .localCheckpoint() // feeds the total AND the supported slice
    val nb = biAll.agg(sum(col("cb")).as("nb"))
    biAll.filter(col("cb") >= CollocMinCount)
      .select(substring_index(col("sh"), " ", 1).as("a"),
        substring_index(col("sh"), " ", -1).as("b"), col("cb"))
      .join(uni.select(col("tok").as("a"), col("cu").as("ca")), Seq("a"))
      .join(uni.select(col("tok").as("b"), col("cu").as("cbt")), Seq("b"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("a"), col("b"), col("cb").as("n_pair"),
        col("ca"), col("cbt").as("cb_tok"),
        ((dec(col("cb")) * col("nu") * col("nu")).cast("double")
          / (dec(col("nb")) * col("ca") * col("cbt")).cast("double"))
          .as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(CollocTopK)
  }

  val collocationLiftSql: String =
    s"""WITH uni AS MATERIALIZED (
         SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu
         FROM (SELECT unnest(${sqlToks("text")}) AS tok FROM documents)
         GROUP BY 1),
       nu AS (SELECT CAST(SUM(cu) AS BIGINT) AS nu FROM uni),
       biall AS MATERIALIZED (
         SELECT sh, CAST(COUNT(*) AS BIGINT) AS cb
         FROM (SELECT array_to_string(tk[i:i+1], ' ') AS sh
               FROM (SELECT tk,
                       unnest(generate_series(1, greatest(len(tk) - 1, 1)))
                         AS i
                     FROM (SELECT ${sqlToks("text")} AS tk FROM documents)))
         WHERE position(' ' IN sh) > 0
         GROUP BY 1),
       nb AS (SELECT CAST(SUM(cb) AS BIGINT) AS nb FROM biall)
       SELECT split_part(sh, ' ', 1) AS a, split_part(sh, ' ', 2) AS b,
              s.cb AS n_pair, ua.cu AS ca, ub.cu AS cb_tok,
              CAST(CAST(CAST(s.cb AS HUGEINT) * n.nu * n.nu AS VARCHAR)
                   AS DOUBLE)
                / CAST(CAST(CAST(t.nb AS HUGEINT) * ua.cu * ub.cu
                            AS VARCHAR) AS DOUBLE) AS lift
       FROM biall s
         JOIN uni ua ON split_part(s.sh, ' ', 1) = ua.tok
         JOIN uni ub ON split_part(s.sh, ' ', 2) = ub.tok
         CROSS JOIN nu n CROSS JOIN nb t
       WHERE s.cb >= $CollocMinCount
       ORDER BY lift DESC, a, b LIMIT $CollocTopK"""

  /** N-gram novelty per source — how much of each source's k-gram mass
    * is seen there FIRST (corpus-order first occurrence by doc_id):
    * the diversity-vs-redundancy signal a data mixer reads next to
    * [[vocabGrowthCurve]] (vocab growth counts first occurrences of
    * single tokens corpus-wide; this attributes first occurrences of
    * phrases to the source that contributed them — a source whose
    * docs mostly re-state earlier phrasing scores low and earns a
    * smaller mixing weight). Per distinct (doc, k-gram): novel iff
    * doc_id = min doc_id over the k-gram; exact BIGINT counts, one
    * double division per source. Scale: one corpus scan explodes to
    * the distinct (doc, k-gram) frame; the first-doc frame is
    * vocabulary-cardinality; output is source-cardinality. (round 7)
    */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        explode(array_distinct(
          wordShingles(toks(col("text")), NoveltyWidth))).as("sh"))
    val first = sh.groupBy("sh").agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, Seq("sh"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("source"), col("n_ngrams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_ngrams").cast("double"))
          .as("novelty_rate"))
      .orderBy("source")
  }

  val ngramNoveltySql: String = {
    val k = NoveltyWidth
    s"""WITH sh AS (
         SELECT DISTINCT doc_id, source,
                array_to_string(tk[i:i+${k - 1}], ' ') AS sh
         FROM (SELECT doc_id, source, tk,
                 unnest(generate_series(1, greatest(len(tk) - ${k - 1}, 1)))
                   AS i
               FROM (SELECT doc_id, source, ${sqlToks("text")} AS tk
                     FROM documents))),
       fst AS (SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
       SELECT s.source, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
              CAST(SUM(CASE WHEN s.doc_id = f.first_doc THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_novel,
              CAST(SUM(CASE WHEN s.doc_id = f.first_doc THEN 1 ELSE 0 END)
                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty_rate
       FROM sh s JOIN fst f ON s.sh = f.sh
       GROUP BY s.source ORDER BY s.source"""
  }

  /** Per-document quality scoring: token count, stopword ratio, mean
    * token length, bucket label. Integer counts; ratios divided once at
    * the end (IEEE-deterministic).
    */
  def textQualityScore(s: SparkSession, dir: String): DataFrame = {
    val tk = toks(col("text"))
    val en = Stop(0)._2
    Tables.documents(s, dir)
      .select(col("doc_id"), length(col("text")).as("len"),
        size(tk).as("n_tokens"),
        size(filter(tk, t => array_contains(array(en.map(lit): _*), t)))
          .as("stop_cnt"))
      .select(col("doc_id"), col("len"), col("n_tokens"), col("stop_cnt"),
        ((col("len") - (col("n_tokens") - 1)).cast("double") /
          col("n_tokens").cast("double")).as("mean_tok_len"),
        (col("stop_cnt").cast("double") / col("n_tokens").cast("double"))
          .as("stop_ratio"))
      .withColumn("quality",
        when(col("n_tokens") >= 40 && col("stop_ratio") < 0.2, "good")
          .when(col("n_tokens") >= 15, "ok")
          .otherwise("low"))
      .orderBy("doc_id")
  }

  val textQualityScoreSql: String = {
    val arr = Stop(0)._2.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH f AS (
         SELECT doc_id, length(text) AS len, len(tk) AS n_tokens,
                len(list_filter(tk, t -> list_contains($arr, t))) AS stop_cnt
         FROM (SELECT doc_id, text, ${sqlToks("text")} AS tk FROM documents)),
       r AS (
         SELECT doc_id, len, n_tokens, stop_cnt,
           CAST(len - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_tok_len,
           CAST(stop_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio
         FROM f)
       SELECT doc_id, len, n_tokens, stop_cnt, mean_tok_len, stop_ratio,
         CASE WHEN n_tokens >= 40 AND stop_ratio < 0.2 THEN 'good'
              WHEN n_tokens >= 15 THEN 'ok' ELSE 'low' END AS quality
       FROM r ORDER BY doc_id"""
  }

  // Repetition flag thresholds: the corpus p90 of each signal (a doc in
  // the top decile of either is flagged).
  private val RepTopTokTau = 0.14
  private val RepDupBigramTau = 0.065

  /** Repetition-based quality signals (the Gopher-style filters): the
    * most frequent token's share of the document and the fraction of
    * word bigrams that are repeats of an earlier bigram. Boilerplate,
    * keyword stuffing and template spam all light these up while
    * length/stopword scores stay normal.
    *
    * Shape: two narrow (doc_id, gram) explosions aggregated
    * independently (map-side partial agg, one shuffle each) joined on
    * doc_id; ratios divide exact BIGINTs once at the end. The bigram
    * duplicate count is total - distinct, both riding the same agg.
    */
  def qualityRepetition(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tokStats = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum(col("n")).as("n_tokens"), max(col("n")).as("top_tok_cnt"))
    val biStats = docs
      .select(col("doc_id"),
        explode(wordShingles(toks(col("text")), 2)).as("bg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("bg")).as("n_uniq_bigrams"))
    tokStats.join(biStats, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("top_tok_cnt"),
        (col("top_tok_cnt").cast("double") / col("n_tokens").cast("double"))
          .as("top_tok_frac"),
        ((col("n_bigrams") - col("n_uniq_bigrams")).cast("double") /
          col("n_bigrams").cast("double")).as("dup_bigram_frac"))
      .withColumn("repetitive",
        col("top_tok_frac") > RepTopTokTau ||
          col("dup_bigram_frac") > RepDupBigramTau)
      .orderBy("doc_id")
  }

  val qualityRepetitionSql: String =
    s"""WITH t AS (SELECT doc_id, ${sqlToks("text")} AS tk FROM documents),
       tc AS (SELECT doc_id, tok, COUNT(*) AS n
              FROM (SELECT doc_id, unnest(tk) AS tok FROM t)
              GROUP BY doc_id, tok),
       ts AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
                     CAST(MAX(n) AS BIGINT) AS top_tok_cnt
              FROM tc GROUP BY doc_id),
       bg AS (SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS bg
              FROM (SELECT doc_id, tk,
                      unnest(generate_series(1, greatest(len(tk) - 1, 1))) AS i
                    FROM t)),
       bs AS (SELECT doc_id, COUNT(*) AS n_bigrams,
                     COUNT(DISTINCT bg) AS n_uniq_bigrams
              FROM bg GROUP BY doc_id)
       SELECT doc_id, n_tokens, top_tok_cnt,
              CAST(top_tok_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                AS top_tok_frac,
              CAST(n_bigrams - n_uniq_bigrams AS DOUBLE)
                / CAST(n_bigrams AS DOUBLE) AS dup_bigram_frac,
              (CAST(top_tok_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                 > $RepTopTokTau
               OR CAST(n_bigrams - n_uniq_bigrams AS DOUBLE)
                 / CAST(n_bigrams AS DOUBLE) > $RepDupBigramTau)
                AS repetitive
       FROM ts JOIN bs USING (doc_id) ORDER BY doc_id"""

  /** Token counting per source: whitespace tokens vs regex tokens (a
    * BPE-ish `[a-z0-9]+` word/number segmentation).
    */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), size(toks(col("text"))).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("re_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("sum_ws_tokens"),
        sum(col("re_tokens")).as("sum_re_tokens"))
      .orderBy("source")

  val tokenCountSql: String =
    s"""SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(${sqlToks("text")})) AS BIGINT) AS sum_ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT) AS sum_re_tokens
       FROM documents GROUP BY source ORDER BY source"""

  /** Document fingerprint: 2-perm MinHash signature over word-3-gram
    * shingles (winnowing-style content signature) + shingle cardinality.
    */
  def docFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        array_distinct(wordShingles(toks(col("text")), 3)).as("shs"))
      .select(col("doc_id"),
        element_at(minhash(col("shs"), 2), 1).as("fp_a"),
        element_at(minhash(col("shs"), 2), 2).as("fp_b"),
        size(col("shs")).as("n_shingles"))
      .orderBy("doc_id")

  val docFingerprintSql: String =
    s"""WITH shr AS (${sqlShingleRows(3)})
       SELECT doc_id, min(md5('0:' || sh)) AS fp_a, min(md5('1:' || sh)) AS fp_b,
              CAST(COUNT(*) AS INT) AS n_shingles
       FROM shr GROUP BY doc_id ORDER BY doc_id"""

  /** Unigram language-model commonness score — the deterministic core
    * of perplexity-style quality filtering (CCNet-style: score each doc
    * by how typical its tokens are of the corpus). The corpus IS the
    * model: freq(tok) = exact BIGINT occurrence count; a doc's score is
    * mean corpus frequency of its token occurrences. Rare-token-heavy
    * docs (gibberish, mojibake) score low; pure-boilerplate docs score
    * high — both tails are filter candidates. No logarithms: libm logs
    * aren't correctly rounded so a log-space score could not be
    * oracle-gated; the mean is one IEEE division over exact integers.
    *
    * Scale: tokens pre-aggregate to (doc_id, tok, c) BEFORE touching
    * the frequency table — per-doc repeats collapse map-side and the
    * hot-token join skew drops by the repeat factor; the weighted sum
    * c*freq then needs no per-occurrence rows. freq table is
    * |vocab|-sized (Zipf: ~10^7 rows at 100 TB — a shuffle join on
    * tok, AQE handles the head-token skew).
    */
  def qualityUnigramLm(s: SparkSession, dir: String): DataFrame = {
    val pd = Tables.documents(s, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("c"))
    val fr = pd.groupBy("tok").agg(sum(col("c")).as("freq"))
    pd.join(fr, "tok")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tok"),
        sum(col("c") * col("freq")).as("freq_sum"))
      .select(col("doc_id"), col("n_tok"), col("freq_sum"),
        (col("freq_sum").cast("double") / col("n_tok").cast("double"))
          .as("commonness"))
      .orderBy("doc_id")
  }

  val qualityUnigramLmSql: String =
    s"""WITH tk AS (SELECT doc_id, unnest(${sqlToks("text")}) AS tok
                    FROM documents),
       pd AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
              FROM tk GROUP BY 1, 2),
       fr AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS freq FROM pd GROUP BY 1),
       ag AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
                CAST(SUM(c * freq) AS BIGINT) AS freq_sum
              FROM pd JOIN fr USING (tok) GROUP BY 1)
       SELECT doc_id, n_tok, freq_sum,
              CAST(freq_sum AS DOUBLE) / CAST(n_tok AS DOUBLE) AS commonness
       FROM ag ORDER BY doc_id"""

  /** A doc compressing below this fraction of its raw size is flagged
    * as heavy redundancy (boilerplate/repetition); prose sits well
    * above it.
    */
  private val CompressLowTau = 0.35
  /** Minimum size before the ratio is meaningful (zlib's fixed header
    * + block overhead dominates tiny inputs).
    */
  private val CompressMinBytes = 64

  /** Compression-ratio quality signal ([[graft.plans.DeflateLen]]) —
    * the corpus-curation filter that catches what n-gram repetition
    * scores miss: DEFLATE's LZ77 window sees long-range and
    * approximate redundancy (templated pages, keyword stuffing, list
    * spam), and a ratio near 1 marks binary junk that only LOOKS like
    * text. Pure projection — one linear pass per doc, no shuffle, no
    * joins; at 100 TB this runs at scan speed next to the other
    * map-side quality columns. No DuckDB zlib exists, so the key is
    * rows-only; ordering/determinism are spec-pinned. (round 4)
    */
  def qualityCompressionRatio(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), octet_length(col("text")).as("raw_len"),
        expr(s"${graft.plans.DeflateLen.FnName}(text)").as("z_len"))
      .withColumn("ratio",
        col("z_len").cast("double") / col("raw_len").cast("double"))
      .withColumn("flag_repetitive",
        col("raw_len") >= CompressMinBytes && col("ratio") < CompressLowTau)
      .orderBy("doc_id")

  /** Association scores over skill co-occurrence — the
    * recommendation-engine layer above raw pair counts: per pair,
    * cosine similarity n_ab / sqrt(n_a * n_b) and lift
    * (n_ab * N) / (n_a * n_b), where n_x is the count of documents
    * mentioning skill x and N the corpus size. Both scores are
    * BIT-portable where PMI would not be: sqrt and division are
    * correctly-rounded IEEE operations in every engine, while PMI's
    * log is libm-dependent (SURVEY §5) — so the standard association
    * suite is oracled and the log-scaled variant is a display
    * transform the caller applies. Frames: the doc-skill incidence
    * (corpus-selective), its per-skill counts (vocab-sized), the pair
    * list (vocab²-bounded); the per-skill count join broadcasts.
    * (round 4)
    */
  def skillAssociation(s: SparkSession, dir: String): DataFrame = {
    val m = SkillExtract.skillExtractPhrase(s, dir)
      .select(col("doc_id"), col("skill"), col("skill_id"))
    val perSkill = m.groupBy(col("skill")).agg(count(lit(1)).as("n_doc"))
    val nDocs = Tables.documents(s, dir).count()
    skillCoocPairs(s, dir)
      .join(broadcast(perSkill.withColumnRenamed("skill", "skill_a")
        .withColumnRenamed("n_doc", "n_a")), "skill_a")
      .join(broadcast(perSkill.withColumnRenamed("skill", "skill_b")
        .withColumnRenamed("n_doc", "n_b")), "skill_b")
      .select(col("skill_a"), col("skill_b"), col("n"),
        col("n_a"), col("n_b"),
        (col("n").cast("double") /
          sqrt(col("n_a").cast("double") * col("n_b").cast("double")))
          .as("cosine"),
        ((col("n").cast("double") * lit(nDocs.toDouble)) /
          (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift"))
      .orderBy(col("cosine").desc, col("skill_a"), col("skill_b"))
  }

  lazy val skillAssociationSql: String =
    s"""WITH m AS (SELECT doc_id, skill, skill_id
             FROM (${SkillExtract.skillExtractPhraseSql})),
       per_skill AS (SELECT skill, CAST(COUNT(*) AS BIGINT) AS n_doc
             FROM m GROUP BY skill),
       cooc AS (SELECT skill_a, skill_b, n FROM ($skillCooccurrenceSql)),
       nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
       SELECT c.skill_a, c.skill_b, c.n, a.n_doc AS n_a, b.n_doc AS n_b,
              CAST(c.n AS DOUBLE)
                / sqrt(CAST(a.n_doc AS DOUBLE) * CAST(b.n_doc AS DOUBLE))
                AS cosine,
              (CAST(c.n AS DOUBLE) * (SELECT n_docs FROM nd))
                / (CAST(a.n_doc AS DOUBLE) * CAST(b.n_doc AS DOUBLE))
                AS lift
       FROM cooc c JOIN per_skill a ON c.skill_a = a.skill
                   JOIN per_skill b ON c.skill_b = b.skill
       ORDER BY cosine DESC, c.skill_a, c.skill_b"""

  /** ONE-PASS fused per-doc signal extraction — the plan shape a 100 TB
    * curation pipeline actually runs: language-ID hits + prediction,
    * length/token/stopword quality signals, regex token count, and the
    * MinHash content fingerprint computed in a SINGLE scan of
    * `documents` with ZERO joins and ZERO aggregations (the only
    * exchange is the output sort). Running [[langIdNgram]],
    * [[textQualityScore]], [[tokenCount]] and [[docFingerprint]]
    * separately reads the corpus four times; fused costs one read —
    * at 100 TB the difference IS the job. All signal expressions are
    * codegen'd projections (WordShingles + md5 + HOFs), so the whole
    * row pipeline stays inside one WholeStageCodegen span
    * (PlanQualitySpec pins: no Join/Aggregate in the plan, one scan).
    * The oracle composes the individual signals' CTEs by doc_id join —
    * the SPEC of the answer, not the plan; single-pass is the Spark
    * side's claim. (round 5)
    */
  def docSignalsFused(s: SparkSession, dir: String): DataFrame = {
    val en = Stop(0)._2
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        toks(col("text")).as("tk"))
      .select(col("doc_id"), col("lang"),
        length(col("text")).as("len"),
        size(col("tk")).as("n_tokens"),
        size(filter(col("tk"), t => array_contains(array(en.map(lit): _*), t)))
          .as("stop_cnt"),
        hitCount(col("tk"), Stop(0)._2).as("en_hits"),
        hitCount(col("tk"), Stop(1)._2).as("fr_hits"),
        hitCount(col("tk"), Stop(2)._2).as("de_hits"),
        hitCount(col("tk"), Stop(3)._2).as("es_hits"),
        size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("re_tokens"),
        array_distinct(wordShingles(col("tk"), 3)).as("shs"))
      .select(col("doc_id"), col("lang"), col("len"), col("n_tokens"),
        col("stop_cnt"), col("en_hits"), col("fr_hits"), col("de_hits"),
        col("es_hits"), col("re_tokens"),
        when(col("en_hits") >= greatest(col("fr_hits"), col("de_hits"),
          col("es_hits")) && col("en_hits") > 0, "en")
          .when(col("fr_hits") >= greatest(col("de_hits"), col("es_hits")) &&
            col("fr_hits") > 0, "fr")
          .when(col("de_hits") >= col("es_hits") && col("de_hits") > 0, "de")
          .when(col("es_hits") > 0, "es")
          .otherwise("und").as("pred_lang"),
        ((col("len") - (col("n_tokens") - 1)).cast("double") /
          col("n_tokens").cast("double")).as("mean_tok_len"),
        (col("stop_cnt").cast("double") / col("n_tokens").cast("double"))
          .as("stop_ratio"),
        element_at(minhash(col("shs"), 2), 1).as("fp_a"),
        element_at(minhash(col("shs"), 2), 2).as("fp_b"),
        size(col("shs")).as("n_shingles"))
      .withColumn("quality",
        when(col("n_tokens") >= 40 && col("stop_ratio") < 0.2, "good")
          .when(col("n_tokens") >= 15, "ok")
          .otherwise("low"))
      .orderBy("doc_id")
  }

  val docSignalsFusedSql: String = {
    val arr = Stop(0)._2.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, lang, text, ${sqlToks("text")} AS tk
                   FROM documents),
       f AS (SELECT doc_id, lang, length(text) AS len, len(tk) AS n_tokens,
               len(list_filter(tk, t -> list_contains($arr, t))) AS stop_cnt,
               ${sqlHitCount(Stop(0)._2)} AS en_hits,
               ${sqlHitCount(Stop(1)._2)} AS fr_hits,
               ${sqlHitCount(Stop(2)._2)} AS de_hits,
               ${sqlHitCount(Stop(3)._2)} AS es_hits,
               len(regexp_extract_all(text, '[a-z0-9]+')) AS re_tokens
             FROM t),
       fp AS (SELECT doc_id, min(md5('0:' || sh)) AS fp_a,
                     min(md5('1:' || sh)) AS fp_b,
                     CAST(COUNT(*) AS INT) AS n_shingles
              FROM (${sqlShingleRows(3)}) GROUP BY doc_id)
       SELECT f.doc_id, f.lang, f.len, f.n_tokens, f.stop_cnt,
              f.en_hits, f.fr_hits, f.de_hits, f.es_hits, f.re_tokens,
              CASE WHEN en_hits >= greatest(fr_hits, de_hits, es_hits)
                        AND en_hits > 0 THEN 'en'
                   WHEN fr_hits >= greatest(de_hits, es_hits)
                        AND fr_hits > 0 THEN 'fr'
                   WHEN de_hits >= es_hits AND de_hits > 0 THEN 'de'
                   WHEN es_hits > 0 THEN 'es'
                   ELSE 'und' END AS pred_lang,
              CAST(len - (n_tokens - 1) AS DOUBLE)
                / CAST(n_tokens AS DOUBLE) AS mean_tok_len,
              CAST(stop_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                AS stop_ratio,
              fp.fp_a, fp.fp_b, fp.n_shingles,
              CASE WHEN n_tokens >= 40
                        AND CAST(stop_cnt AS DOUBLE)
                          / CAST(n_tokens AS DOUBLE) < 0.2 THEN 'good'
                   WHEN n_tokens >= 15 THEN 'ok' ELSE 'low' END AS quality
       FROM f JOIN fp ON f.doc_id = fp.doc_id
       ORDER BY f.doc_id"""
  }

  /** Lexical diversity per document: type-token ratio and hapax share
    * — the vocabulary-richness signals a quality filter reads next to
    * the repetition metrics (a TTR near 0 marks boilerplate/spam; a
    * hapax share near 1 marks gibberish). All counts exact from one
    * (doc, term) aggregate of the lowered token stream; the two ratios
    * are single divisions. Shuffle carries (doc_id, term) pairs with
    * map-side combine — the tfidf scan shape without the df branch.
    */
  def lexicalDiversity(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(toks(lower(col("text")))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
        (col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        (col("n_hapax").cast("double") / col("n_tokens").cast("double"))
          .as("hapax_share"))
      .orderBy("doc_id")

  val lexicalDiversitySql: String =
    s"""WITH tf AS (
         SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
         FROM (SELECT doc_id, unnest(${sqlToks("lower(text)")}) AS term
               FROM documents)
         GROUP BY 1, 2)
       SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
              CAST(COUNT(*) AS BIGINT) AS n_types,
              CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
              CAST(COUNT(*) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE) AS ttr,
              CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(SUM(tf) AS DOUBLE) AS hapax_share
       FROM tf GROUP BY doc_id ORDER BY doc_id"""

  /** Tokenizer fertility per language: chars per token and tokens per
    * doc — the cross-lingual budget planner (a lang whose fertility is
    * 2x pays 2x the sequence length for the same text; the per-lang
    * token budget in [[Curation.tokenBudgetMix]] should be read
    * against it). Exact integer sums, two single divisions per lang.
    */
  def tokenizerFertility(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), size(toks(col("text"))).cast("long").as("nt"),
        length(col("text")).cast("long").as("nc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"), sum(col("nc")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_chars"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token"),
        (col("n_tokens").cast("double") / col("n_docs").cast("double"))
          .as("tokens_per_doc"))
      .orderBy("lang")

  val tokenizerFertilitySql: String =
    s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(len(${sqlToks("text")})) AS BIGINT) AS n_tokens,
              CAST(SUM(length(text)) AS BIGINT) AS n_chars,
              CAST(SUM(length(text)) AS DOUBLE)
                / CAST(SUM(len(${sqlToks("text")})) AS DOUBLE) AS chars_per_token,
              CAST(SUM(len(${sqlToks("text")})) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) AS tokens_per_doc
       FROM documents GROUP BY lang ORDER BY lang"""

  /** Unrolled BPE merge count — fixed like [[graft.operators.Graph]]'s
    * sweep constants so the oracle's shape is data-independent. Real
    * tokenizer training runs tens of thousands of merges of exactly
    * this per-merge algebra; the plan depth is linear in the count. */
  val BpeMerges = 5

  /** Byte-pair-encoding MERGE TRAINING (Sennrich et al. 2016,
    * arXiv:1508.07909) — the actual tokenizer-training loop, distributed:
    * learn the first [[BpeMerges]] merges from the corpus and emit the
    * merge table (rank, lhs, rhs, merged, pair weight) every BPE
    * tokenizer ships as `merges.txt`. The engine's tokenizer surface so
    * far ANALYZED tokenizations ([[tokenizerFertility]],
    * [[vocabEncodeDocs]]); this one LEARNS one.
    *
    * Faithful to the reference algorithm, deterministically:
    *  - training data is the word-frequency table (distinct word +
    *    count — the Sennrich formulation), so all per-word passes are
    *    VOCAB-sized, never corpus-sized;
    *  - each round counts adjacent symbol pairs weighted by word count
    *    (one narrow agg with map-side partials), picks the argmax pair
    *    (count desc, then lexicographic — the tie rule that makes it
    *    oracle-gateable), and merges occurrences GREEDY LEFT-TO-RIGHT:
    *    within a run of consecutive match positions (only possible for
    *    self-pairs like "a a" in "aaaa") the even offsets from the run
    *    head merge — exactly the sequential scan's choices, computed as
    *    a gaps-and-islands window instead of a sequential loop;
    *  - symbol rows re-sequence per word and localCheckpoint per round
    *    (the Pregel-sweep discipline: lineage stays linear in rounds).
    *
    * Scale: the corpus is scanned ONCE for word counts; every round
    * then touches |vocab| x word-length symbol rows — at 100 TB that
    * is megabytes against terabytes. The windows partition per word,
    * the pair agg is symbol-pair-cardinality, the argmax is a 1-row
    * broadcast. (round 6)
    */
  def bpeTrainMerges(s: SparkSession, dir: String): DataFrame =
    bpeTrainMergesFrom(Tables.documents(s, dir)
      .select(explode(toks(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc")))

  /** Core over any word-frequency frame (w string, wc long) — shared by
    * the registered query and the hand-checked constructed-corpus spec.
    */
  def bpeTrainMergesFrom(words: DataFrame): DataFrame =
    bpeLoop(words)._1.reduce(_.unionByName(_)).orderBy("merge_rank")

  /** Shared trainer loop: per-round merge rows plus the FINAL symbol
    * segmentation the K merges leave behind (the encoder's output). */
  private def bpeLoop(words: DataFrame): (Seq[DataFrame], DataFrame) = {
    var rows = words
      .select(col("w"), col("wc"),
        posexplode(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")))
      .select(col("w"), col("wc"), (col("pos") + 1).as("pos"),
        col("col").as("sym"))
      .localCheckpoint()
    val wWin = Window.partitionBy(col("w")).orderBy(col("pos"))
    val merges = (1 to BpeMerges).map { i =>
      val withNext = rows.withColumn("nxt", lead(col("sym"), 1).over(wWin))
      val best = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("bl"), col("nxt").as("br"))
        .agg(sum(col("wc")).as("bc"))
        .orderBy(col("bc").desc, col("bl"), col("br"))
        .limit(1)
        .localCheckpoint() // 1 row, reused by the match pass AND output
      val matches = withNext.crossJoin(broadcast(best))
        .filter(col("nxt").isNotNull && col("sym") === col("bl") &&
          col("nxt") === col("br"))
        .withColumn("rk", col("pos") - row_number().over(wWin))
      val sel = matches
        .withColumn("rs",
          min(col("pos")).over(Window.partitionBy(col("w"), col("rk"))))
        .filter(((col("pos") - col("rs")) % 2) === 0)
        .select(col("w"), col("pos"), lit(true).as("selfl"))
      val consumed = sel.select(col("w"), (col("pos") + 1).as("pos"),
        lit(true).as("confl"))
      rows = withNext
        .join(sel, Seq("w", "pos"), "left")
        .join(consumed, Seq("w", "pos"), "left")
        .filter(col("confl").isNull)
        .select(col("w"), col("wc"), col("pos"),
          when(col("selfl").isNotNull, concat(col("sym"), col("nxt")))
            .otherwise(col("sym")).as("sym"))
        .withColumn("pos", row_number().over(wWin))
        .localCheckpoint()
      best.select(lit(i).as("merge_rank"), col("bl").as("lhs"),
        col("br").as("rhs"), concat(col("bl"), col("br")).as("merged"),
        col("bc").as("pair_weight"))
    }
    (merges, rows)
  }

  /** The trained tokenizer APPLIED — encode every corpus word with the
    * [[BpeMerges]] learned merges and report the segmentation: after
    * the training loop the symbol rows ARE each word's encoding, so
    * application costs one ordered per-word aggregation on top of
    * training (at deployment the merge table is broadcast and applied
    * map-side to unseen text; here corpus and training corpus
    * coincide, the Sennrich setup). Output: one row per distinct word
    * with its frequency, symbol count, and the space-joined encoding —
    * the measurable fertility drop vs raw characters
    * ([[tokenizerFertility]]'s metric, now under a LEARNED tokenizer).
    * Order inside the encoding rides array_sort of (pos, sym) structs,
    * partition-count-independent ([[vocabEncodeDocs]] discipline).
    * (round 6)
    */
  def bpeEncodeWords(s: SparkSession, dir: String): DataFrame =
    bpeEncodeWordsFrom(Tables.documents(s, dir)
      .select(explode(toks(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc")))

  /** Encoder core over any (w, wc) frame — shared with the
    * generated-input cross-check against a sequential reference BPE. */
  def bpeEncodeWordsFrom(words: DataFrame): DataFrame = {
    val fin = bpeLoop(words)._2
    fin.groupBy("w", "wc")
      .agg(count(lit(1)).as("n_symbols"),
        array_join(expr("transform(array_sort(collect_list(struct(pos, sym))), x -> x.sym)"),
          " ").as("encoded"))
      .orderBy("w")
  }

  val bpeEncodeWordsSql: String =
    s"""$bpeCtes
       SELECT w, wc, CAST(COUNT(*) AS BIGINT) AS n_symbols,
              STRING_AGG(sym, ' ' ORDER BY pos) AS encoded
       FROM r$BpeMerges GROUP BY w, wc ORDER BY w"""

  /** Shared WITH-clause body: words -> char rows -> K unrolled rounds. */
  private lazy val bpeCtes: String = {
    def round(i: Int): String =
      s"""nx$i AS MATERIALIZED (
           SELECT w, wc, pos, sym,
                  LEAD(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
           FROM r${i - 1}),
         b$i AS MATERIALIZED (
           SELECT sym AS bl, nxt AS br, CAST(SUM(wc) AS BIGINT) AS bc
           FROM nx$i WHERE nxt IS NOT NULL
           GROUP BY 1, 2 ORDER BY bc DESC, bl, br LIMIT 1),
         mt$i AS (SELECT n.w, n.pos,
                    n.pos - ROW_NUMBER() OVER (PARTITION BY n.w
                      ORDER BY n.pos) AS rk
                  FROM nx$i n, b$i b
                  WHERE n.sym = b.bl AND n.nxt = b.br),
         sl$i AS MATERIALIZED (
           SELECT w, pos FROM (
             SELECT w, pos, MIN(pos) OVER (PARTITION BY w, rk) AS rs
             FROM mt$i) WHERE (pos - rs) % 2 = 0),
         r$i AS MATERIALIZED (
           SELECT n.w, n.wc,
                  ROW_NUMBER() OVER (PARTITION BY n.w ORDER BY n.pos) AS pos,
                  CASE WHEN s.pos IS NOT NULL THEN n.sym || n.nxt
                       ELSE n.sym END AS sym
           FROM nx$i n
           LEFT JOIN sl$i s ON s.w = n.w AND s.pos = n.pos
           WHERE NOT EXISTS (SELECT 1 FROM sl$i c
                             WHERE c.w = n.w AND c.pos = n.pos - 1))"""
    s"""WITH words AS MATERIALIZED (
         SELECT w, CAST(COUNT(*) AS BIGINT) AS wc
         FROM (SELECT unnest(${sqlToks("text")}) AS w FROM documents)
         GROUP BY w),
       r0 AS MATERIALIZED (
         SELECT w, wc, i AS pos, substr(w, i, 1) AS sym
         FROM (SELECT w, wc, unnest(generate_series(1, length(w))) AS i
               FROM words)),
       ${(1 to BpeMerges).map(round).mkString(",\n       ")}"""
  }

  val bpeTrainMergesSql: String = {
    val out = (1 to BpeMerges).map(i =>
      s"SELECT $i AS merge_rank, bl AS lhs, br AS rhs, bl || br AS merged, bc AS pair_weight FROM b$i")
      .mkString("\n       UNION ALL ")
    s"""$bpeCtes
       $out
       ORDER BY merge_rank"""
  }

  /** Cross-source VOCABULARY overlap matrix — "do the scrapes speak
    * the same language": per unordered source pair, the Jaccard of
    * their distinct token sets (plus both set sizes and the
    * intersection). The corpus-similarity dashboard next to
    * [[graft.operators.Curation.sourceDivergenceTv]]'s distribution
    * drift: TV weighs frequency mass, this weighs vocabulary IDENTITY
    * (a source can share every token yet differ wildly in mix, and
    * vice versa). Scale: the (source, token) frame is distinct-pruned
    * before any join (bodies never shuffle), the pair intersection is
    * a token equi-join AQE splits on head tokens, and the output is
    * sources²-bounded. (round 6)
    */
  def tokenOverlapMatrix(s: SparkSession, dir: String): DataFrame = {
    val st = Tables.documents(s, dir)
      .select(col("source"), explode(toks(col("text"))).as("tok"))
      .distinct()
      .localCheckpoint() // feeds sizes AND the pair join
    val sizes = st.groupBy("source").agg(count(lit(1)).as("n_toks"))
    val inter = st.as("a").join(st.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("n_toks").as("n_a"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n_toks").as("n_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_common"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  val tokenOverlapMatrixSql: String =
    s"""WITH st AS MATERIALIZED (
         SELECT DISTINCT source, tok
         FROM (SELECT source, unnest(${sqlToks("text")}) AS tok
               FROM documents)),
       sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_toks
                 FROM st GROUP BY 1),
       inter AS (SELECT a.source AS source_a, b.source AS source_b,
                        CAST(COUNT(*) AS BIGINT) AS n_common
                 FROM st a JOIN st b
                   ON a.tok = b.tok AND a.source < b.source
                 GROUP BY 1, 2)
       SELECT i.source_a, i.source_b, sa.n_toks AS n_a, sb.n_toks AS n_b,
              i.n_common,
              CAST(i.n_common AS DOUBLE)
                / CAST(sa.n_toks + sb.n_toks - i.n_common AS DOUBLE)
                AS jaccard
       FROM inter i JOIN sizes sa ON i.source_a = sa.source
                    JOIN sizes sb ON i.source_b = sb.source
       ORDER BY source_a, source_b"""

  /** Count of regex-match GROUPS in `c` under pattern `pat`: replace
    * each match with one sentinel char and diff the lengths against a
    * full deletion — pure codegen'd string ops, no UDF. */
  private def matchCount(c: Column, pat: String): Column =
    length(regexp_replace(c, pat, "#")) - length(regexp_replace(c, pat, ""))

  /** DuckDB twin of [[matchCount]] (the 'g' flag: DuckDB replaces only
    * the first match by default, Spark replaces all). */
  private def sqlMatchCount(e: String, pat: String): String =
    s"(length(regexp_replace($e, '$pat', '#', 'g')) - " +
      s"length(regexp_replace($e, '$pat', '', 'g')))"

  /** Flesch reading-ease per source — the classic readability score as
    * a corpus-quality signal next to [[textQualityScore]]'s heuristic
    * bundle (training mixes routinely filter or re-weight by reading
    * level). Words from the shared [[graft.functions.Text.toks]]
    * tokenizer, sentences as `[.!?]+` runs (clamped ≥ 1 per doc so
    * fragment docs don't zero the denominator), syllables by the
    * standard vowel-group proxy `[aeiouy]+` over lowercased text —
    * counted by replace-and-diff length arithmetic (codegen'd, no
    * UDF, identical in both engines). All three accumulate as exact
    * BIGINTs per source; the score is one double tree over the
    * aggregate ratios, NULL for a source whose docs tokenize to zero
    * words (the portable degenerate verdict — §7b zero-division rule).
    * Scale: pure per-row projection + one k-row
    * aggregate — no shuffle but source partials. (round 6)
    */
  def readabilityFlesch(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"),
        size(toks(col("text"))).cast("long").as("w"),
        greatest(matchCount(col("text"), "[.!?]+"), lit(1)).cast("long")
          .as("sen"),
        matchCount(lower(col("text")), "[aeiouy]+").cast("long").as("syl"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
        sum(col("sen")).as("n_sentences"), sum(col("syl")).as("n_syllables"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_sentences"), col("n_syllables"),
        when(col("n_words") > 0,
          lit(206.835)
            - lit(1.015) * (col("n_words").cast("double")
              / col("n_sentences").cast("double"))
            - lit(84.6) * (col("n_syllables").cast("double")
              / col("n_words").cast("double"))).as("flesch"))
      .orderBy("source")

  val readabilityFleschSql: String =
    s"""WITH perdoc AS (
         SELECT source,
                CAST(len(${sqlToks("text")}) AS BIGINT) AS w,
                CAST(greatest(${sqlMatchCount("text", "[.!?]+")}, 1)
                     AS BIGINT) AS sen,
                CAST(${sqlMatchCount("lower(text)", "[aeiouy]+")}
                     AS BIGINT) AS syl
         FROM documents),
       agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(w) AS BIGINT) AS n_words,
                      CAST(SUM(sen) AS BIGINT) AS n_sentences,
                      CAST(SUM(syl) AS BIGINT) AS n_syllables
               FROM perdoc GROUP BY 1)
       SELECT source, n_docs, n_words, n_sentences, n_syllables,
              CASE WHEN n_words > 0 THEN
                206.835
                  - 1.015 * (CAST(n_words AS DOUBLE)
                             / CAST(n_sentences AS DOUBLE))
                  - 84.6 * (CAST(n_syllables AS DOUBLE)
                            / CAST(n_words AS DOUBLE)) END AS flesch
       FROM agg ORDER BY source"""

  /** Frequency-weighted cosine similarity between source unigram
    * vectors — completing the corpus-similarity triangle:
    * [[tokenOverlapMatrix]] weighs vocabulary IDENTITY (Jaccard of
    * sets), [[graft.operators.Curation.sourceDivergenceTv]] weighs
    * frequency MASS drift, this weighs the ANGLE between count
    * vectors (two sources can share every token and still point in
    * different directions). Dot products and squared norms accumulate
    * in DECIMAL(38,0)/HUGEINT (BIGINT squares saturate once a
    * (source, token) count passes ~3e9); cosine is one division over
    * two correctly-rounded sqrts. Scale: the (source, token, count)
    * frame is aggregate-compacted before any join (bodies never
    * shuffle), the pair intersection is a token equi-join AQE splits
    * on head tokens, and the output is sources²-bounded. (round 6)
    */
  def sourceCosineMatrix(s: SparkSession, dir: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val tf = Tables.documents(s, dir)
      .select(col("source"), explode(toks(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds norms AND the pair join
    val nrm = tf.groupBy("source")
      .agg(sum(dec(col("c")) * col("c")).cast("decimal(38,0)").as("n2"))
    // Grouped-bucket pair generation (round 15 — the dedupMinhashLsh
    // cand pattern): one tok-keyed aggregate collects each token's
    // (source, count) list — bounded by |sources|, never corpus-sized
    // — and the source<source pairs expand MAP-SIDE from the sorted
    // array, replacing the tok-keyed self-join (exchange + join +
    // double-sided read of tf) with a single exchange. Products are
    // exact integers summed in DECIMAL(38,0) — order-insensitive,
    // bit-identical results.
    val dots = tf
      .groupBy("tok")
      .agg(sort_array(collect_list(struct(col("source"), col("c"))))
        .as("xs"))
      .filter(size(col("xs")) > 1)
      .select(col("xs"), posexplode(col("xs")).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(col("xs"), col("i") + lit(2), size(col("xs"))))
          .as("b"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(sum(dec(col("a.c")) * col("b.c")).cast("decimal(38,0)").as("dot"))
    dots
      .join(broadcast(nrm.select(col("source").as("source_a"),
        col("n2").as("n2_a"))), Seq("source_a"))
      .join(broadcast(nrm.select(col("source").as("source_b"),
        col("n2").as("n2_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"),
        col("dot").cast("double").as("dot"),
        sqrt(col("n2_a").cast("double")).as("norm_a"),
        sqrt(col("n2_b").cast("double")).as("norm_b"),
        (col("dot").cast("double")
          / (sqrt(col("n2_a").cast("double"))
            * sqrt(col("n2_b").cast("double")))).as("cosine"))
      .orderBy("source_a", "source_b")
  }

  val sourceCosineMatrixSql: String =
    s"""WITH tf AS MATERIALIZED (
         SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
         FROM (SELECT source, unnest(${sqlToks("text")}) AS tok
               FROM documents)
         GROUP BY 1, 2),
       nrm AS (SELECT source, SUM(CAST(c AS HUGEINT) * c) AS n2
               FROM tf GROUP BY 1),
       dots AS (SELECT a.source AS source_a, b.source AS source_b,
                       SUM(CAST(a.c AS HUGEINT) * b.c) AS dot
                FROM tf a JOIN tf b
                  ON a.tok = b.tok AND a.source < b.source
                GROUP BY 1, 2)
       SELECT d.source_a, d.source_b,
              CAST(CAST(d.dot AS VARCHAR) AS DOUBLE) AS dot,
              sqrt(CAST(CAST(na.n2 AS VARCHAR) AS DOUBLE)) AS norm_a,
              sqrt(CAST(CAST(nb.n2 AS VARCHAR) AS DOUBLE)) AS norm_b,
              CAST(CAST(d.dot AS VARCHAR) AS DOUBLE)
                / (sqrt(CAST(CAST(na.n2 AS VARCHAR) AS DOUBLE))
                   * sqrt(CAST(CAST(nb.n2 AS VARCHAR) AS DOUBLE))) AS cosine
       FROM dots d JOIN nrm na ON d.source_a = na.source
                   JOIN nrm nb ON d.source_b = nb.source
       ORDER BY source_a, source_b"""

  /** Vocabulary-growth buckets for [[vocabGrowthCurve]]. */
  val GrowthBuckets = 20

  /** Vocabulary growth curve (Heaps'-law empirics) — "is the corpus
    * still teaching the tokenizer new words": docs bucket into
    * [[GrowthBuckets]] equal doc-id ranges, a token is NEW in the
    * bucket where it first appears (min bucket per token — exact,
    * order-free, no sequential scan), and the cumulative vocabulary is
    * the running sum over the 20-row bucket frame (aggregates-only
    * join, no window). A flattening curve says more of the same data
    * stops growing the vocab — the evidence behind dataset-mixing
    * decisions. Scale: one (bucket, token) distinct-agg over the
    * corpus; everything after is bucket-cardinality. (round 6)
    */
  def vocabGrowthCurve(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val mx = docs.agg(max(col("doc_id")).as("mx"))
    val bk = expr(s"(doc_id * $GrowthBuckets) div (mx + 1)")
    val dt = docs.crossJoin(broadcast(mx))
      .select(bk.as("bk"), explode(toks(col("text"))).as("tok"))
    val db = docs.crossJoin(broadcast(mx))
      .select(bk.as("bk"))
      .groupBy("bk").agg(count(lit(1)).as("n_docs"))
    val np = dt.groupBy("tok").agg(min(col("bk")).as("fb"))
      .groupBy(col("fb").as("bk")).agg(count(lit(1)).as("new_tokens"))
      .localCheckpoint() // feeds the per-bucket join AND the cumulative
    val cum = db.as("d").join(np.as("n"), col("n.bk") <= col("d.bk"), "left")
      .groupBy(col("d.bk").as("bk"))
      .agg(coalesce(sum(col("n.new_tokens")), lit(0L)).as("cum_vocab"))
    db.join(np, Seq("bk"), "left").join(cum, Seq("bk"))
      .select(col("bk").as("bucket"), col("n_docs"),
        coalesce(col("new_tokens"), lit(0L)).as("new_tokens"),
        col("cum_vocab"))
      .orderBy("bucket")
  }

  val vocabGrowthCurveSql: String =
    s"""WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
       dt AS (SELECT (d.doc_id * $GrowthBuckets) // (m.mx + 1) AS bk,
                     unnest(${sqlToks("d.text")}) AS tok
              FROM documents d CROSS JOIN mx m),
       db AS (SELECT (d.doc_id * $GrowthBuckets) // (m.mx + 1) AS bk,
                     CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM documents d CROSS JOIN mx m GROUP BY 1),
       np AS MATERIALIZED (
         SELECT fb AS bk, CAST(COUNT(*) AS BIGINT) AS new_tokens
         FROM (SELECT tok, MIN(bk) AS fb FROM dt GROUP BY 1)
         GROUP BY 1),
       cum AS (SELECT d.bk, CAST(COALESCE(SUM(n.new_tokens), 0) AS BIGINT)
                        AS cum_vocab
               FROM db d LEFT JOIN np n ON n.bk <= d.bk GROUP BY 1)
       SELECT db.bk AS bucket, db.n_docs,
              CAST(COALESCE(np.new_tokens, 0) AS BIGINT) AS new_tokens,
              c.cum_vocab
       FROM db LEFT JOIN np ON db.bk = np.bk JOIN cum c ON db.bk = c.bk
       ORDER BY bucket"""

  /** Per-source quality tier mix — the curation dashboard's first
    * question ("which scrape is feeding me junk"): the oracled
    * [[textQualityScore]] tiers joined back to provenance and
    * pivoted to per-source good/ok/low counts with shares. One
    * doc-cardinality join (doc_id-keyed, AQE-planned) + one
    * source-cardinality aggregate on top of the quality scan; shares
    * are single divisions of exact counts. (round 6)
    */
  def qualitySourceMix(s: SparkSession, dir: String): DataFrame =
    textQualityScore(s, dir)
      .select(col("doc_id"), col("quality"))
      .join(Tables.documents(s, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("quality") === "good", 1L).otherwise(0L)).as("n_good"),
        sum(when(col("quality") === "ok", 1L).otherwise(0L)).as("n_ok"),
        sum(when(col("quality") === "low", 1L).otherwise(0L)).as("n_low"))
      .select(col("source"), col("n_docs"), col("n_good"), col("n_ok"),
        col("n_low"),
        (col("n_good").cast("double") / col("n_docs").cast("double"))
          .as("good_share"),
        (col("n_low").cast("double") / col("n_docs").cast("double"))
          .as("low_share"))
      .orderBy("source")

  val qualitySourceMixSql: String =
    s"""WITH q AS (SELECT doc_id, quality FROM ($textQualityScoreSql))
       SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN q.quality = 'good' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_good,
              CAST(SUM(CASE WHEN q.quality = 'ok' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_ok,
              CAST(SUM(CASE WHEN q.quality = 'low' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_low,
              CAST(SUM(CASE WHEN q.quality = 'good' THEN 1 ELSE 0 END)
                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS good_share,
              CAST(SUM(CASE WHEN q.quality = 'low' THEN 1 ELSE 0 END)
                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS low_share
       FROM q JOIN documents d USING (doc_id)
       GROUP BY d.source ORDER BY d.source"""

  /** Vocabulary size for the OOV gate. */
  val OovVocabK = 1000

  /** Out-of-vocabulary rate per source — the tokenizer-coverage gate
    * ("how much of each scrape falls outside the top-K vocabulary",
    * the fragment/fertility early-warning next to
    * [[tokenizerFertility]]): the top-[[OovVocabK]] tokens by corpus
    * count (ties lexicographic) define the vocabulary; each source
    * reports its token occurrences, OOV occurrences and the rate.
    * Scale: ONE corpus scan compacts to the (source, token, count)
    * frame (checkpointed — vocabulary selection and the coverage join
    * both read it); top-K plans as TakeOrderedAndProject (per-partition
    * top-K + driver merge, the sample_bottomk discipline) and
    * broadcasts. (round 6)
    */
  def oovRateBySource(s: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.documents(s, dir)
      .select(col("source"), explode(toks(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds the vocab top-K AND the coverage join
    val vocab = cnt.groupBy("tok").agg(sum(col("c")).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(OovVocabK)
      .select(col("tok"), lit(1L).as("inv"))
    cnt.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("source")
      .agg(sum(col("c")).as("n_tokens"),
        sum(when(col("inv").isNull, col("c")).otherwise(0L)).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
      .orderBy("source")
  }

  val oovRateBySourceSql: String =
    s"""WITH cnt AS MATERIALIZED (
         SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
         FROM (SELECT source, unnest(${sqlToks("text")}) AS tok
               FROM documents)
         GROUP BY 1, 2),
       vocab AS (SELECT tok FROM (
                   SELECT tok, CAST(SUM(c) AS BIGINT) AS n
                   FROM cnt GROUP BY 1)
                 ORDER BY n DESC, tok LIMIT $OovVocabK)
       SELECT cnt.source, CAST(SUM(cnt.c) AS BIGINT) AS n_tokens,
              CAST(SUM(CASE WHEN v.tok IS NULL THEN cnt.c ELSE 0 END)
                   AS BIGINT) AS n_oov,
              CAST(SUM(CASE WHEN v.tok IS NULL THEN cnt.c ELSE 0 END)
                   AS DOUBLE) / CAST(SUM(cnt.c) AS DOUBLE) AS oov_rate
       FROM cnt LEFT JOIN vocab v ON cnt.tok = v.tok
       GROUP BY cnt.source ORDER BY cnt.source"""

  /** Stopword token density per source — the function-word share that
    * separates prose from keyword-stuffed listings (a classic
    * quality-filter signal next to [[textQualityScore]]'s per-doc
    * ratios: natural English runs ~30-50% function words; scraped tag
    * soup runs near zero): occurrences of the [[Stop]] English list
    * over all token occurrences, both exact BIGINTs from one (source,
    * token-hit) aggregation, one double division per source. Scale:
    * one corpus scan, token explode after the (source, tokens)
    * projection, source-cardinality output. (round 9)
    */
  def stopwordDensity(s: SparkSession, dir: String): DataFrame = {
    val en = Stop(0)._2
    Tables.documents(s, dir)
      .select(col("source"), explode(toks(col("text"))).as("tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("tok").isInCollection(en), 1L).otherwise(0L))
          .as("n_stop"))
      .select(col("source"), col("n_tokens"), col("n_stop"),
        when(col("n_tokens") > 0,
          col("n_stop").cast("double") / col("n_tokens").cast("double"))
          .as("stop_density"))
      .orderBy("source")
  }

  val stopwordDensitySql: String = {
    val arr = Stop(0)._2.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH tk AS (
         SELECT source, UNNEST(${sqlToks("text")}) AS tok FROM documents),
       agg AS (
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                CAST(SUM(CASE WHEN list_contains($arr, tok)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
         FROM tk GROUP BY 1)
       SELECT source, n_tokens, n_stop,
              CASE WHEN n_tokens > 0 THEN
                CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
              END AS stop_density
       FROM agg ORDER BY source"""
  }

  /** Hapax legomena rate per source — the share of a source's
    * vocabulary seen exactly once ([[vocabGrowthCurve]]'s pointwise
    * derivative: a high hapax share means the vocabulary is still
    * growing — OCR noise, IDs, or genuinely diverse prose; near zero
    * means templated text): per-(source, token) counts, then vocab /
    * hapax counts and one double division. Scale: the same (source,
    * token) aggregate every corpus matrix rides; source-cardinality
    * output. (round 9)
    */
  def hapaxRate(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), explode(toks(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(col("source"), col("vocab"), col("hapax"),
        when(col("vocab") > 0,
          col("hapax").cast("double") / col("vocab").cast("double"))
          .as("hapax_rate"))
      .orderBy("source")

  val hapaxRateSql: String =
    s"""WITH cnt AS (
         SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
         FROM (SELECT source, UNNEST(${sqlToks("text")}) AS tok
               FROM documents)
         GROUP BY 1, 2),
       agg AS (
         SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
                CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS hapax
         FROM cnt GROUP BY 1)
       SELECT source, vocab, hapax,
              CASE WHEN vocab > 0 THEN
                CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE)
              END AS hapax_rate
       FROM agg ORDER BY source"""

  /** Yule's characteristic K per source — the classic REPETITIVENESS
    * constant of lexicography ([[lexicalDiversity]]'s TTR falls with
    * corpus size by Heaps' law, so sources of different volume cannot
    * be compared by it; K is length-invariant — the collision mass of
    * the token distribution, scaled): K = 10^4·(Σ m²·V_m − N)/N² over
    * the frequency spectrum V_m (how many words occur exactly m
    * times). Entirely integer until one double division — Yule chose
    * the log-free form a century before this engine needed it. High K
    * = templated/repetitive text, low K = rich vocabulary. Scale: the
    * (source, token) aggregate every corpus matrix rides, then a
    * spectrum-sized rollup. (round 9)
    */
  def yuleK(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), explode(toks(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("m"))
      .groupBy("source")
      .agg(sum(col("m")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(col("m") * col("m")).as("sm2"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        when(col("n_tokens") > 0,
          lit(10000.0e0) * (col("sm2") - col("n_tokens")).cast("double")
            / (col("n_tokens") * col("n_tokens")).cast("double"))
          .as("yule_k"))
      .orderBy("source")

  val yuleKSql: String =
    s"""WITH cnt AS (
         SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS m
         FROM (SELECT source, UNNEST(${sqlToks("text")}) AS tok
               FROM documents)
         GROUP BY 1, 2),
       agg AS (
         SELECT source, CAST(SUM(m) AS BIGINT) AS n_tokens,
                CAST(COUNT(*) AS BIGINT) AS vocab,
                CAST(SUM(m * m) AS BIGINT) AS sm2
         FROM cnt GROUP BY 1)
       SELECT source, n_tokens, vocab,
              CASE WHEN n_tokens > 0 THEN
                10000.0 * CAST(sm2 - n_tokens AS DOUBLE)
                  / CAST(n_tokens * n_tokens AS DOUBLE)
              END AS yule_k
       FROM agg ORDER BY source"""

  /** Word-length profile per source — mean token length, long-word
    * share and max ([[readabilityFlesch]]'s ingredient surfaced as a
    * per-source fingerprint; a source whose mean word length drifts
    * changed register or language): length sums exact BIGINT, mean and
    * share as single double divisions, threshold ≥ 7 chars (the
    * "complex word" cut readability indices use). Scale: token explode
    * after projection, source-cardinality output. (round 9)
    */
  def wordLengthProfile(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), explode(toks(col("text"))).as("tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(length(col("tok")).cast("long")).as("sum_len"),
        sum(when(length(col("tok")) >= 7, 1L).otherwise(0L)).as("n_long"),
        max(length(col("tok")).cast("long")).as("max_len"))
      .select(col("source"), col("n_tokens"), col("sum_len"),
        col("max_len"),
        when(col("n_tokens") > 0,
          col("sum_len").cast("double") / col("n_tokens").cast("double"))
          .as("mean_len"),
        when(col("n_tokens") > 0,
          col("n_long").cast("double") / col("n_tokens").cast("double"))
          .as("long_share"))
      .orderBy("source")

  val wordLengthProfileSql: String =
    s"""WITH tk AS (
         SELECT source, UNNEST(${sqlToks("text")}) AS tok FROM documents),
       agg AS (
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                CAST(SUM(length(tok)) AS BIGINT) AS sum_len,
                CAST(SUM(CASE WHEN length(tok) >= 7 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_long,
                CAST(MAX(length(tok)) AS BIGINT) AS max_len
         FROM tk GROUP BY 1)
       SELECT source, n_tokens, sum_len, max_len,
              CASE WHEN n_tokens > 0 THEN
                CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE)
              END AS mean_len,
              CASE WHEN n_tokens > 0 THEN
                CAST(n_long AS DOUBLE) / CAST(n_tokens AS DOUBLE)
              END AS long_share
       FROM agg ORDER BY source"""

  /** Character-class profile per source — digit / uppercase / space
    * shares of the raw character stream (the page-layout fingerprint
    * under [[textQualityScore]]: tables and SKUs are digit-heavy,
    * shouting templates uppercase-heavy; a redesigned scrape moves
    * these before any token statistic notices): class counts as length
    * deltas under class-targeted regexp_replace (exact integers — no
    * tokenization involved), three guarded double divisions. ASCII
    * classes only, deliberately: both engines' regex dialects agree on
    * [0-9]/[A-Z]/[ ] and the synthetic corpus is ASCII; a Unicode
    * deployment would swap in character-property classes. Scale: pure
    * per-row projection then a source-cardinality aggregate. (round 9)
    */
  def charClassProfile(s: SparkSession, dir: String): DataFrame = {
    def classCount(c: Column, re: String): Column =
      (length(c) - length(regexp_replace(c, re, ""))).cast("long")
    Tables.documents(s, dir)
      .select(col("source"), length(col("text")).cast("long").as("nc"),
        classCount(col("text"), "[0-9]").as("nd"),
        classCount(col("text"), "[A-Z]").as("nu"),
        classCount(col("text"), "[ ]").as("ns"))
      .groupBy("source")
      .agg(sum(col("nc")).as("n_chars"), sum(col("nd")).as("n_digit"),
        sum(col("nu")).as("n_upper"), sum(col("ns")).as("n_space"))
      .select(col("source"), col("n_chars"), col("n_digit"),
        col("n_upper"), col("n_space"),
        when(col("n_chars") > 0,
          col("n_digit").cast("double") / col("n_chars").cast("double"))
          .as("digit_share"),
        when(col("n_chars") > 0,
          col("n_upper").cast("double") / col("n_chars").cast("double"))
          .as("upper_share"),
        when(col("n_chars") > 0,
          col("n_space").cast("double") / col("n_chars").cast("double"))
          .as("space_share"))
      .orderBy("source")
  }

  val charClassProfileSql: String =
    """WITH cc AS (
         SELECT source, CAST(length(text) AS BIGINT) AS nc,
                CAST(length(text)
                  - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS BIGINT) AS nd,
                CAST(length(text)
                  - length(regexp_replace(text, '[A-Z]', '', 'g'))
                  AS BIGINT) AS nu,
                CAST(length(text)
                  - length(regexp_replace(text, '[ ]', '', 'g'))
                  AS BIGINT) AS ns
         FROM documents),
       agg AS (
         SELECT source, CAST(SUM(nc) AS BIGINT) AS n_chars,
                CAST(SUM(nd) AS BIGINT) AS n_digit,
                CAST(SUM(nu) AS BIGINT) AS n_upper,
                CAST(SUM(ns) AS BIGINT) AS n_space
         FROM cc GROUP BY 1)
       SELECT source, n_chars, n_digit, n_upper, n_space,
              CASE WHEN n_chars > 0 THEN
                CAST(n_digit AS DOUBLE) / CAST(n_chars AS DOUBLE)
              END AS digit_share,
              CASE WHEN n_chars > 0 THEN
                CAST(n_upper AS DOUBLE) / CAST(n_chars AS DOUBLE)
              END AS upper_share,
              CASE WHEN n_chars > 0 THEN
                CAST(n_space AS DOUBLE) / CAST(n_chars AS DOUBLE)
              END AS space_share
       FROM agg ORDER BY source"""

  /** Sentence-shape statistics per source — the document-structure
    * fingerprint between [[readabilityFlesch]]'s composite and
    * [[wordLengthProfile]]'s token view (a listing site emits one-
    * sentence fragments; an editorial source runs long multi-sentence
    * paragraphs — the mean alone hides the mix, so the single-sentence
    * share and max ride along): sentence count per doc via the flesch
    * terminator-run rule (greatest(matches, 1) — a fragment is one
    * sentence), exact BIGINT sums, two means + one share as final
    * double divisions. Scale: per-row regexp projection →
    * source-cardinality aggregate. (round 9)
    */
  def sentenceStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"),
        size(toks(col("text"))).cast("long").as("w"),
        greatest(matchCount(col("text"), "[.!?]+"), lit(1)).cast("long")
          .as("sen"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("sen")).as("n_sentences"),
        sum(col("w")).as("n_words"),
        sum(when(col("sen") === 1, 1L).otherwise(0L)).as("n_single"),
        max(col("sen")).as("max_sentences"))
      .select(col("source"), col("n_docs"), col("n_sentences"),
        col("max_sentences"),
        (col("n_sentences").cast("double") / col("n_docs").cast("double"))
          .as("mean_sentences_per_doc"),
        when(col("n_sentences") > 0,
          col("n_words").cast("double") / col("n_sentences").cast("double"))
          .as("mean_words_per_sentence"),
        (col("n_single").cast("double") / col("n_docs").cast("double"))
          .as("single_sentence_share"))
      .orderBy("source")

  val sentenceStatsSql: String =
    s"""WITH perdoc AS (
         SELECT source,
                CAST(len(${sqlToks("text")}) AS BIGINT) AS w,
                CAST(greatest(${sqlMatchCount("text", "[.!?]+")}, 1)
                     AS BIGINT) AS sen
         FROM documents),
       agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(sen) AS BIGINT) AS n_sentences,
                      CAST(SUM(w) AS BIGINT) AS n_words,
                      CAST(SUM(CASE WHEN sen = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_single,
                      CAST(MAX(sen) AS BIGINT) AS max_sentences
               FROM perdoc GROUP BY 1)
       SELECT source, n_docs, n_sentences, max_sentences,
              CAST(n_sentences AS DOUBLE) / CAST(n_docs AS DOUBLE)
                AS mean_sentences_per_doc,
              CASE WHEN n_sentences > 0 THEN
                CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)
              END AS mean_words_per_sentence,
              CAST(n_single AS DOUBLE) / CAST(n_docs AS DOUBLE)
                AS single_sentence_share
       FROM agg ORDER BY source"""

  def queries: Seq[Q] = Seq(
    Q("oov_rate_by_source", Some(oovRateBySourceSql))(oovRateBySource),
    Q("sentence_stats", Some(sentenceStatsSql))(sentenceStats),
    Q("quality_source_mix", Some(qualitySourceMixSql))(qualitySourceMix),
    Q("vocab_growth_curve", Some(vocabGrowthCurveSql))(vocabGrowthCurve),
    Q("readability_flesch", Some(readabilityFleschSql))(readabilityFlesch),
    Q("source_cosine_matrix", Some(sourceCosineMatrixSql), bench = true)(sourceCosineMatrix),
    Q("token_overlap_matrix", Some(tokenOverlapMatrixSql))(tokenOverlapMatrix),
    Q("bpe_train_merges", Some(bpeTrainMergesSql))(bpeTrainMerges),
    Q("bpe_encode_words", Some(bpeEncodeWordsSql))(bpeEncodeWords),
    Q("tokenizer_fertility", Some(tokenizerFertilitySql))(tokenizerFertility),
    Q("lexical_diversity", Some(lexicalDiversitySql))(lexicalDiversity),
    Q("top_tokens", Some(topTokensSql), bench = true)(topTokens),
    Q("doc_signals_fused", Some(docSignalsFusedSql))(docSignalsFused),
    Q("skill_association", Some(skillAssociationSql))(skillAssociation),
    Q("quality_compression_ratio", None)(qualityCompressionRatio),
    Q("quality_unigram_lm", Some(qualityUnigramLmSql))(qualityUnigramLm),
    Q("top_bigrams", Some(topBigramsSql))(topBigrams),
    Q("keyword_rake", Some(keywordRakeSql))(keywordRake),
    Q("vocab_encode_docs", Some(vocabEncodeDocsSql))(vocabEncodeDocs),
    Q("top_tokens_sketch", None)(topTokensSketch),
    Q("skill_cooccurrence", Some(skillCooccurrenceSql))(skillCooccurrence),
    Q("top_skills_per_sector", Some(topSkillsPerSectorSql))(topSkillsPerSector),
    Q("lang_id_ngram", Some(langIdNgramSql))(langIdNgram),
    Q("cohen_kappa", Some(cohenKappaSql))(cohenKappa),
    Q("ngram_novelty", Some(ngramNoveltySql))(ngramNovelty),
    Q("collocation_lift", Some(collocationLiftSql))(collocationLift),
    Q("text_quality_score", Some(textQualityScoreSql))(textQualityScore),
    Q("quality_repetition", Some(qualityRepetitionSql))(qualityRepetition),
    Q("token_count", Some(tokenCountSql))(tokenCount),
    Q("doc_fingerprint", Some(docFingerprintSql))(docFingerprint),
    Q("stopword_density", Some(stopwordDensitySql))(stopwordDensity),
    Q("hapax_rate", Some(hapaxRateSql))(hapaxRate),
    Q("yule_k", Some(yuleKSql))(yuleK),
    Q("word_length_profile", Some(wordLengthProfileSql))(wordLengthProfile),
    Q("char_class_profile", Some(charClassProfileSql))(charClassProfile))
}
