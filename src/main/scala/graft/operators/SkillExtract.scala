package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skill-NER surface — the reference's skillner stage
  * (/root/reference/skillner/skillner_logic.py: spaCy PhraseMatcher over a
  * skill DB, full matches + n-gram scored matches, hard/soft typing,
  * per-offer dedup) re-expressed as distributed phrase matching:
  * tokenize -> equi-join tokens (and adjacent-token bigrams) against a
  * broadcast vocabulary. No Python, no per-row NLP object: the match is a
  * broadcast hash join that scales with corpus size, and the vocabulary
  * (like the reference's SKILL_DB) is small by construction.
  */
object SkillExtract {

  /** The engine's stand-in for skillner's SKILL_DB: (skill, type). Terms
    * chosen from the synthetic documents' vocabulary; unigrams and
    * bigrams exercise both match paths.
    */
  val vocab: Seq[(String, String, Int)] = Seq(
    ("spark", "hard", 1), ("hash", "hard", 2), ("join", "hard", 3),
    ("filter", "hard", 4), ("window", "hard", 5), ("stream", "hard", 6),
    ("vector", "hard", 7), ("merge", "hard", 8), ("sort", "hard", 9),
    ("scan", "hard", 10), ("query", "hard", 11), ("batch", "hard", 12),
    ("fast", "soft", 13), ("slow", "soft", 14), ("small", "soft", 15),
    ("hash join", "hard", 16), ("sort merge", "hard", 17),
    ("table scan", "hard", 18), ("window merge", "hard", 19))

  def vocabDf(s: SparkSession): DataFrame = {
    import s.implicits._
    vocab.toDF("skill", "skill_type", "skill_id")
  }

  val vocabSql: String = vocab
    .map { case (sk, ty, id) => s"('$sk', '$ty', $id)" }
    .mkString("SELECT * FROM (VALUES ", ", ", ") AS v(skill, skill_type, skill_id)")

  private val tokensSql: String =
    """SELECT doc_id, unnest(toks) AS token,
              unnest(generate_series(0, len(toks) - 1)) AS i
       FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks
             FROM documents)"""

  /** Phrase-match extraction: unigram matches plus adjacent-token bigram
    * matches (skillner's full_matches), deduped per document (skillner
    * add_skill dedup, skillner_logic.py:69-80).
    *
    * Bigrams are built array-side with zip_with BEFORE exploding — pure
    * map work, no positional self-join — so the only shuffle is the final
    * distinct. The oracle SQL uses an equivalent positional self-join
    * (clarity over speed is fine for the oracle).
    */
  def skillExtractPhrase(s: SparkSession, dir: String): DataFrame = {
    val v = broadcast(vocabDf(s))
    val toks = split(col("text"), "\\s+")
    val bigrams = when(size(toks) >= 2,
      zip_with(slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (x, y) => concat(x, lit(" "), y)))
      .otherwise(array().cast("array<string>"))
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(concat(toks, bigrams)).as("term"))
      .join(v, col("term") === v("skill"))
      .select(col("doc_id"), col("skill"), col("skill_type"), col("skill_id"))
      .distinct()
      .orderBy("doc_id", "skill_id")
  }

  val skillExtractPhraseSql: String =
    s"""WITH toks AS ($tokensSql),
         uni AS (
           SELECT doc_id, skill, skill_type, skill_id
           FROM toks JOIN ($vocabSql) v ON toks.token = v.skill),
         bi AS (
           SELECT a.doc_id, v.skill, v.skill_type, v.skill_id
           FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.i + 1 = b.i
           JOIN ($vocabSql) v ON a.token || ' ' || b.token = v.skill)
       SELECT DISTINCT doc_id, skill, skill_type, skill_id
       FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
       ORDER BY doc_id, skill_id"""

  /** Hard/soft typing rollup (the reference splits skills into
    * hard_skills/soft_skills arrays; transform_job.py:145-163).
    */
  def skillTypeSplit(s: SparkSession, dir: String): DataFrame =
    skillExtractPhrase(s, dir)
      .groupBy("skill_type", "skill")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("skill_type", "skill")

  val skillTypeSplitSql: String =
    s"""WITH matches AS ($skillExtractPhraseSql)
       SELECT skill_type, skill, COUNT(DISTINCT doc_id) AS n_docs
       FROM matches GROUP BY 1, 2 ORDER BY 1, 2"""

  def queries: Seq[Q] = Seq(
    Q("skill_extract_phrase", Some(skillExtractPhraseSql), bench = true)(skillExtractPhrase),
    Q("skill_type_split", Some(skillTypeSplitSql))(skillTypeSplit))
}
