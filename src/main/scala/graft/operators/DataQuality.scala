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

  /** Key-candidate discovery — the uniqueness layer of profiling: for
    * each candidate key (single columns and the composite line-number
    * key), one row with exact duplication stats and an `is_key`
    * verdict (non-null, all-distinct). This is how a pipeline
    * discovers/validates primary keys before trusting MERGE/dedup
    * logic on them. Each candidate is one count-distinct aggregate
    * over its projection — map-side partials, no joins; HLL sketches
    * replace exact distinct at 100 TB when approximate verdicts
    * suffice (approx_distinct is the registered sketch twin).
    */
  def keyCandidateProfile(s: SparkSession, dir: String): DataFrame = {
    def audit(table: String, cand: String, df: DataFrame,
        keyCols: Seq[String]): DataFrame = {
      val k = struct(keyCols.map(col): _*)
      val nonNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
      df.agg(count(lit(1)).as("n_rows"),
          count(when(nonNull, 1)).as("n_nonnull"),
          countDistinct(when(nonNull, k)).as("n_distinct"))
        .select(lit(table).as("table_name"), lit(cand).as("candidate"),
          col("n_rows"), col("n_nonnull"), col("n_distinct"),
          (col("n_nonnull") - col("n_distinct")).as("dup_rows"),
          (col("n_nonnull") === col("n_rows") &&
            col("n_distinct") === col("n_rows")).as("is_key"))
    }
    val li = Tables.lineitem(s, dir)
    audit("orders", "o_orderkey", Tables.orders(s, dir), Seq("o_orderkey"))
      .unionByName(audit("orders", "o_custkey",
        Tables.orders(s, dir), Seq("o_custkey")))
      .unionByName(audit("lineitem", "l_orderkey", li, Seq("l_orderkey")))
      .unionByName(audit("lineitem", "l_orderkey,l_linenumber", li,
        Seq("l_orderkey", "l_linenumber")))
      .unionByName(audit("documents", "doc_id",
        Tables.documents(s, dir), Seq("doc_id")))
      .orderBy("table_name", "candidate")
  }

  val keyCandidateProfileSql: String = {
    def row(table: String, cand: String, from: String, cols: Seq[String]) = {
      val nonNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
      val tup = if (cols.size == 1) cols.head
        else s"(${cols.mkString(", ")})"
      s"""SELECT '$table' AS table_name, '$cand' AS candidate,
            COUNT(*) AS n_rows,
            COUNT(CASE WHEN $nonNull THEN 1 END) AS n_nonnull,
            COUNT(DISTINCT CASE WHEN $nonNull THEN $tup END) AS n_distinct,
            COUNT(CASE WHEN $nonNull THEN 1 END)
              - COUNT(DISTINCT CASE WHEN $nonNull THEN $tup END) AS dup_rows,
            (COUNT(CASE WHEN $nonNull THEN 1 END) = COUNT(*)
              AND COUNT(DISTINCT CASE WHEN $nonNull THEN $tup END)
                = COUNT(*)) AS is_key
          FROM $from"""
    }
    Seq(
      row("orders", "o_orderkey", "orders", Seq("o_orderkey")),
      row("orders", "o_custkey", "orders", Seq("o_custkey")),
      row("lineitem", "l_orderkey", "lineitem", Seq("l_orderkey")),
      row("lineitem", "l_orderkey,l_linenumber", "lineitem",
        Seq("l_orderkey", "l_linenumber")),
      row("documents", "doc_id", "documents", Seq("doc_id")))
      .mkString("", " UNION ALL ", " ORDER BY table_name, candidate")
  }

  /** Referential-integrity audit over every star-schema FK edge: child
    * row count, orphan rows (child keys with no parent), distinct
    * orphan keys. The pre-publish gate for MERGE pipelines — an orphan
    * spike means a dimension load fell behind its facts. Each edge is
    * one left join + one agg; small parents (region/nation/customer)
    * broadcast, the lineitem→orders edge is the one genuine fact-fact
    * shuffle and rides the same key partitioning the star join uses.
    */
  /** One FK edge's audit row — public so the spec can drive it with
    * constructed orphan frames.
    */
  def edgeAudit(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      bcast: Boolean): DataFrame = {
    val p = parent.select(col(parentKey)).distinct()
    val joined = child.select(col(childKey))
      .join(if (bcast) broadcast(p) else p,
        col(childKey) === col(parentKey), "left")
    joined.agg(count(lit(1)).as("n_child"),
        count(when(col(parentKey).isNull, 1)).as("n_orphan"),
        countDistinct(when(col(parentKey).isNull, col(childKey)))
          .as("n_orphan_keys"))
      .select(lit(name).as("edge"), col("n_child"), col("n_orphan"),
        col("n_orphan_keys"))
  }

  def riOrphanAudit(s: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String, bcast: Boolean): DataFrame =
      edgeAudit(name, child, childKey, parent, parentKey, bcast)
    edge("customer.c_nationkey->nation", Tables.customer(s, dir),
        "c_nationkey", Tables.nation(s, dir), "n_nationkey", bcast = true)
      .unionByName(edge("lineitem.l_orderkey->orders",
        Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey", bcast = false))
      .unionByName(edge("nation.n_regionkey->region", Tables.nation(s, dir),
        "n_regionkey", Tables.region(s, dir), "r_regionkey", bcast = true))
      .unionByName(edge("orders.o_custkey->customer", Tables.orders(s, dir),
        "o_custkey", Tables.customer(s, dir), "c_custkey", bcast = true))
      .unionByName(edge("supplier.s_nationkey->nation",
        Tables.supplier(s, dir), "s_nationkey",
        Tables.nation(s, dir), "n_nationkey", bcast = true))
      .orderBy("edge")
  }

  val riOrphanAuditSql: String = {
    def row(name: String, child: String, childKey: String,
        parent: String, parentKey: String) =
      s"""SELECT '$name' AS edge, COUNT(*) AS n_child,
            COUNT(CASE WHEN p.$parentKey IS NULL THEN 1 END) AS n_orphan,
            COUNT(DISTINCT CASE WHEN p.$parentKey IS NULL
              THEN c.$childKey END) AS n_orphan_keys
          FROM $child c LEFT JOIN
            (SELECT DISTINCT $parentKey FROM $parent) p
            ON c.$childKey = p.$parentKey"""
    Seq(
      row("customer.c_nationkey->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      row("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      row("nation.n_regionkey->region", "nation", "n_regionkey",
        "region", "r_regionkey"),
      row("orders.o_custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      row("supplier.s_nationkey->nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"))
      .mkString("", " UNION ALL ", " ORDER BY edge")
  }

  def queries: Seq[Q] = Seq(
    Q("data_profile", Some(dataProfileSql))(dataProfile),
    Q("constraint_check", Some(constraintCheckSql))(constraintCheck),
    Q("key_candidate_profile", Some(keyCandidateProfileSql))(keyCandidateProfile),
    Q("ri_orphan_audit", Some(riOrphanAuditSql))(riOrphanAudit))
}
