package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality layer (the Deequ-style profile/constraint pattern): a
  * corpus pipeline at scale gates every load on machine-checkable
  * expectations — the reference does this ad hoc (required-field
  * filters, quarantine); here it is a first-class, auditable report.
  *
  * Both operators are ONE aggregation pass over the table producing a
  * single metrics row that is then exploded into (metric, value) rows —
  * adding a metric adds an agg column, never a pass. All metrics are
  * exact integers or strings (no doubles to drift); profile ranges
  * surface as strings so heterogeneous column types share one schema.
  */
object DataQuality {

  private case class ColSpec(name: String, expr: Column)

  /** Per-column profile of `documents`: row count, non-null count,
    * distinct count, min/max (as strings). The profiling shape that
    * feeds schema drift detection and constraint suggestion.
    */
  def dataProfile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq(
      ColSpec("doc_id", col("doc_id")),
      ColSpec("lang", col("lang")),
      ColSpec("n_chars", col("n_chars")),
      ColSpec("source", col("source")))
    val aggs = cols.flatMap { c =>
      Seq(count(c.expr).as(s"nn_${c.name}"),
        countDistinct(c.expr).as(s"nd_${c.name}"),
        min(c.expr).cast("string").as(s"mn_${c.name}"),
        max(c.expr).cast("string").as(s"mx_${c.name}"))
    } :+ count(lit(1)).as("n")
    Tables.documents(s, dir)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c.name).as("col"), col("n").as("n_rows"),
          col(s"nn_${c.name}").as("n_nonnull"),
          col(s"nd_${c.name}").as("n_distinct"),
          col(s"mn_${c.name}").as("min_v"),
          col(s"mx_${c.name}").as("max_v"))
      }: _*)).as("p"))
      .select(col("p.*"))
      .orderBy("col")
  }

  val dataProfileSql: String = {
    def row(c: String) =
      s"""SELECT '$c' AS col, COUNT(*) AS n_rows, COUNT($c) AS n_nonnull,
            COUNT(DISTINCT $c) AS n_distinct,
            CAST(MIN($c) AS VARCHAR) AS min_v, CAST(MAX($c) AS VARCHAR) AS max_v
          FROM documents"""
    Seq("doc_id", "lang", "n_chars", "source")
      .map(row).mkString("", " UNION ALL ", " ORDER BY col")
  }

  /** Languages the corpus contract admits. */
  private val LangDomain = Seq("en", "fr", "de", "es", "zh")

  /** Constraint suite over `documents`: each expectation yields its
    * violation count and a pass flag — the load gate a 100 TB ingest
    * runs before publishing a snapshot (fail the batch, not the
    * downstream queries). One aggregation pass for the whole suite.
    */
  def constraintCheck(s: SparkSession, dir: String): DataFrame =
    constraintCheckDf(Tables.documents(s, dir))

  /** Generic expectation runner: each (name, violation-count aggregate)
    * pair becomes one report row — the whole suite is ONE aggregation
    * pass over `df` no matter how many checks it carries.
    */
  def constraintSuite(df: DataFrame,
      checks: Seq[(String, Column)]): DataFrame = {
    val aggs = checks.zipWithIndex.map { case ((_, e), i) => e.as(s"v$i") }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.zipWithIndex.map { case ((n, _), i) =>
        struct(lit(n).as("constraint"), col(s"v$i").as("violations"),
          (col(s"v$i") === 0).as("passed"))
      }: _*)).as("c"))
      .select(col("c.*"))
      .orderBy("constraint")
  }

  /** The suite against any documents-shaped frame (doc_id, text, lang,
    * n_chars) — the ingest gate runs it on each candidate batch.
    */
  def constraintCheckDf(docs: DataFrame): DataFrame = {
    val langArr = array(LangDomain.map(lit): _*)
    constraintSuite(docs, Seq(
      "doc_id_not_null" -> count(when(col("doc_id").isNull, 1)),
      "doc_id_unique" -> (count(col("doc_id")) - countDistinct(col("doc_id"))),
      "lang_in_domain" ->
        count(when(!array_contains(langArr, col("lang")), 1)),
      "n_chars_consistent" ->
        count(when(length(col("text")) =!= col("n_chars"), 1)),
      "text_nonempty" -> count(when(length(col("text")) === 0, 1))))
  }

  val constraintCheckSql: String = {
    val domain = LangDomain.map(l => s"'$l'").mkString(", ")
    s"""WITH m AS (SELECT
         COUNT(CASE WHEN doc_id IS NULL THEN 1 END) AS v0,
         COUNT(doc_id) - COUNT(DISTINCT doc_id) AS v1,
         COUNT(CASE WHEN lang NOT IN ($domain) THEN 1 END) AS v2,
         COUNT(CASE WHEN length(text) <> n_chars THEN 1 END) AS v3,
         COUNT(CASE WHEN length(text) = 0 THEN 1 END) AS v4
       FROM documents)
       SELECT col1 AS "constraint", CAST(col2 AS BIGINT) AS violations,
              (col2 = 0) AS passed
       FROM m, LATERAL (VALUES
         ('doc_id_not_null', v0), ('doc_id_unique', v1),
         ('lang_in_domain', v2), ('n_chars_consistent', v3),
         ('text_nonempty', v4)) AS t(col1, col2)
       ORDER BY "constraint""""
  }

  def queries: Seq[Q] = Seq(
    Q("data_profile", Some(dataProfileSql))(dataProfile),
    Q("constraint_check", Some(constraintCheckSql))(constraintCheck))
}
