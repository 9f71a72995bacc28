package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Enrichment surface — the reference's LLM stage
  * (/root/reference/data_extraction/Traitement/pipline.py:88-110 system
  * prompt: titre_homogene, secteur, niveau_qualification 1..5;
  * pipline.py:200-205 dictionnaire_titres) re-expressed as DETERMINISTIC
  * rule-based transforms. An actual LLM call is an external service the
  * engine deliberately does not embed; the contract (input/output columns,
  * batching shape) is identical, so a model-backed implementation can
  * swap in behind the same columns.
  */
object Enrich {

  /** titre_homogene: lowercase, strip punctuation/digits, collapse
    * whitespace, trim — the deterministic core of title homogenization.
    */
  def titleNormalize(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"), col("p_name"),
        trim(regexp_replace(
          regexp_replace(lower(col("p_name")), "[^a-z ]", " "),
          " +", " ")).as("titre_homogene"))
      .orderBy("p_partkey")

  val titleNormalizeSql: String =
    """SELECT p_partkey, p_name,
       trim(regexp_replace(regexp_replace(lower(p_name), '[^a-z ]', ' ', 'g'),
            ' +', ' ', 'g')) AS titre_homogene
       FROM part ORDER BY p_partkey"""

  /** secteur classification: keyword rules over text (the LLM deduced
    * sector from title+description; here a CASE-contains rulebook).
    */
  def sectorClassify(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        when(col("text").contains("spark"), "Data")
          .when(col("text").contains("stream"), "Streaming")
          .when(col("text").contains("customer"), "CRM")
          .when(col("text").contains("vector"), "ML")
          .otherwise("Autre").as("secteur"))
      .groupBy("secteur").agg(count(lit(1)).as("n"))
      .orderBy("secteur")

  val sectorClassifySql: String =
    """SELECT CASE
         WHEN contains(text, 'spark') THEN 'Data'
         WHEN contains(text, 'stream') THEN 'Streaming'
         WHEN contains(text, 'customer') THEN 'CRM'
         WHEN contains(text, 'vector') THEN 'ML'
         ELSE 'Autre' END AS secteur, COUNT(*) AS n
       FROM documents GROUP BY 1 ORDER BY 1"""

  /** niveau_qualification: ordinal 1..5 mapping (the LLM graded Bac..
    * Doctorat; here the ordered priority domain plays the grade).
    */
  def qualificationLevel(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        when(col("o_orderpriority") === "1-URGENT", 5)
          .when(col("o_orderpriority") === "2-HIGH", 4)
          .when(col("o_orderpriority") === "3-MEDIUM", 3)
          .when(col("o_orderpriority") === "4-NOT SPECIFIED", 2)
          .otherwise(1).as("niveau_qualification"))
      .groupBy("niveau_qualification").agg(count(lit(1)).as("n"))
      .orderBy("niveau_qualification")

  val qualificationLevelSql: String =
    """SELECT CASE o_orderpriority
         WHEN '1-URGENT' THEN 5 WHEN '2-HIGH' THEN 4 WHEN '3-MEDIUM' THEN 3
         WHEN '4-NOT SPECIFIED' THEN 2 ELSE 1 END AS niveau_qualification,
       COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1"""

  /** dictionnaire_titres: frequency dictionary of homogenized titles
    * (pipline.py:200-205), i.e. groupBy-count over the normalized title.
    */
  def titleFreqDict(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(trim(regexp_replace(
        regexp_replace(lower(col("p_name")), "[^a-z ]", " "),
        " +", " ")).as("titre_homogene"))
      .groupBy("titre_homogene").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("titre_homogene"))

  val titleFreqDictSql: String =
    """SELECT trim(regexp_replace(regexp_replace(lower(p_name), '[^a-z ]', ' ', 'g'),
              ' +', ' ', 'g')) AS titre_homogene, COUNT(*) AS n
       FROM part GROUP BY 1 ORDER BY n DESC, titre_homogene"""

  def queries: Seq[Q] = Seq(
    Q("title_normalize", Some(titleNormalizeSql))(titleNormalize),
    Q("sector_classify", Some(sectorClassifySql))(sectorClassify),
    Q("qualification_level", Some(qualificationLevelSql))(qualificationLevel),
    Q("title_freq_dict", Some(titleFreqDictSql))(titleFreqDict))
}
