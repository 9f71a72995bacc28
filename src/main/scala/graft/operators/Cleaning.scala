package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingestion/cleaning suite — the reference's Spark cleaning stage
  * (/root/reference/spark_pipeline/transform_job.py:181-233 clean_data)
  * re-expressed with native, codegen'd column functions instead of the
  * reference's Python UDFs:
  *  - required-field not-null/not-empty filter (transform_job.py:193-195)
  *  - dedup by business key (transform_job.py:199) — made deterministic
  *    (row_number survivor) instead of dropDuplicates' arbitrary pick
  *  - multi-format date normalization (transform_job.py:120-142
  *    normalize_date UDF) — pure CASE/to_date chain, no UDF
  *  - comma/space-list split to rows (transform_job.py:206-217)
  *  - trim/lower casing normalization (transform_job.py:218-221)
  *  - fillna 'Unspecified' (transform_job.py:231)
  *  - JSON field extraction (the scrapers' semi-structured payloads)
  */
object Cleaning {

  /** Required-field filter: every surviving row has its business keys. */
  def requiredFilter(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("text").isNotNull && col("text") =!= "" &&
        col("source").isNotNull && col("source") =!= "" &&
        col("lang").isNotNull && col("lang") =!= "" && col("n_chars") > 0)
      .select("doc_id", "source", "lang", "n_chars")
      .orderBy("doc_id")

  val requiredFilterSql: String =
    """SELECT doc_id, source, lang, n_chars FROM documents
       WHERE text IS NOT NULL AND text <> '' AND source IS NOT NULL
         AND source <> '' AND lang IS NOT NULL AND lang <> '' AND n_chars > 0
       ORDER BY doc_id"""

  /** Deterministic dedup by key: first event per (user, type) by (ts,
    * event_id). One shuffle on the partition key; at 100 TB this is the
    * canonical "keep first version" compaction.
    */
  def dedupExactKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("user_id", "event_type")
  }

  val dedupExactKeySql: String =
    """SELECT event_id, user_id, event_type, value FROM events
       QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) = 1
       ORDER BY user_id, event_type"""

  /** Year substituted into year-less date formats. The reference uses
    * the CURRENT year (transform_job.py:133-137) — nondeterministic by
    * design; here it is an explicit parameter so pipelines pin it (the
    * registered query pins DefaultYear so the oracle is stable).
    */
  val DefaultYear = 2025

  private val monthNum: Map[String, Int] = {
    val abbrev = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
      "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
    val full = Seq("January", "February", "March", "April", "May", "June",
      "July", "August", "September", "October", "November", "December")
    (abbrev.zipWithIndex ++ full.zipWithIndex)
      .map { case (m, i) => m -> (i + 1) }.toMap
  }

  /** Multi-format date normalization. The reference tries strptime
    * formats in order — `%Y-%m-%d`, `%d/%m/%Y`, `%d %b-%H:%M` AND
    * `%d %B-%H:%M` (full month names, "1 March-12:53") — and defaults
    * the year when absent (transform_job.py:120-142). Re-expressed as a
    * regex-gated CASE so it is ANSI-safe, codegen'd, and deterministic.
    * Input strings are derived from o_orderdate cycling through all
    * four accepted formats (the %B form with a non-padded day, as the
    * scrapers emit it).
    */
  def normalizeDateMultiformat(s: SparkSession, dir: String): DataFrame =
    normalizeDateMultiformat(s, dir, DefaultYear)

  def normalizeDateMultiformat(s: SparkSession, dir: String,
      defaultYear: Int): DataFrame = {
    val raw = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
      .withColumn("raw_date",
        when(col("o_orderkey") % 4 === 0, date_format(col("d"), "yyyy-MM-dd"))
          .when(col("o_orderkey") % 4 === 1, date_format(col("d"), "dd/MM/yyyy"))
          .when(col("o_orderkey") % 4 === 2, date_format(col("d"), "dd MMM-HH:mm"))
          .otherwise(date_format(col("d"), "d MMMM-HH:mm")))
    val mon = regexp_extract(col("raw_date"), "^(\\d{1,2}) ([A-Za-z]+)-", 2)
    val monAsNum = monthNum.foldLeft(lit(0)) { case (acc, (m, n)) =>
      when(mon === m, n).otherwise(acc)
    }
    raw.withColumn("normalized",
      when(col("raw_date").rlike("^\\d{4}-\\d{2}-\\d{2}$"),
        to_date(col("raw_date"), "yyyy-MM-dd"))
        .when(col("raw_date").rlike("^\\d{2}/\\d{2}/\\d{4}$"),
          to_date(col("raw_date"), "dd/MM/yyyy"))
        .when(col("raw_date").rlike("^\\d{1,2} [A-Za-z]+-\\d{2}:\\d{2}$") &&
          monAsNum >= 1, {
          // year-defaulted dates can be invalid (29 Feb 2025): guard the
          // day against the month's length — ANSI-safe in both engines,
          // and the reference's strptime would likewise reject them.
          val dayN = regexp_extract(col("raw_date"), "^(\\d{1,2})", 1).cast("int")
          when(dayN <= dayofmonth(
              last_day(make_date(lit(defaultYear), monAsNum, lit(1)))),
            make_date(lit(defaultYear), monAsNum, dayN))
            .otherwise(lit(null).cast("date"))
        })
        .otherwise(lit(null).cast("date")))
      .select("o_orderkey", "raw_date", "normalized")
      .orderBy("o_orderkey")
  }

  val normalizeDateMultiformatSql: String = {
    val monthCase =
      """CASE regexp_extract(raw_date, '^(\d{1,2}) ([A-Za-z]+)-', 2)
         WHEN 'Jan' THEN 1 WHEN 'Feb' THEN 2 WHEN 'Mar' THEN 3 WHEN 'Apr' THEN 4
         WHEN 'May' THEN 5 WHEN 'Jun' THEN 6 WHEN 'Jul' THEN 7 WHEN 'Aug' THEN 8
         WHEN 'Sep' THEN 9 WHEN 'Oct' THEN 10 WHEN 'Nov' THEN 11 WHEN 'Dec' THEN 12
         WHEN 'January' THEN 1 WHEN 'February' THEN 2 WHEN 'March' THEN 3
         WHEN 'April' THEN 4 WHEN 'June' THEN 6 WHEN 'July' THEN 7
         WHEN 'August' THEN 8 WHEN 'September' THEN 9 WHEN 'October' THEN 10
         WHEN 'November' THEN 11 WHEN 'December' THEN 12
         ELSE 0 END"""
    s"""WITH raw AS (
         SELECT o_orderkey,
           CASE CAST(o_orderkey % 4 AS INT)
             WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
             WHEN 1 THEN strftime(o_orderdate, '%d/%m/%Y')
             WHEN 2 THEN strftime(o_orderdate, '%d %b-%H:%M')
             ELSE strftime(o_orderdate, '%-d %B-%H:%M') END AS raw_date
         FROM orders)
       SELECT o_orderkey, raw_date,
         CASE
           WHEN regexp_matches(raw_date, '^\\d{4}-\\d{2}-\\d{2}$$')
             THEN CAST(strptime(raw_date, '%Y-%m-%d') AS DATE)
           WHEN regexp_matches(raw_date, '^\\d{2}/\\d{2}/\\d{4}$$')
             THEN CAST(strptime(raw_date, '%d/%m/%Y') AS DATE)
           WHEN regexp_matches(raw_date, '^\\d{1,2} [A-Za-z]+-\\d{2}:\\d{2}$$')
                AND $monthCase >= 1
                AND CAST(regexp_extract(raw_date, '^(\\d{1,2})', 1) AS INT)
                    <= day(last_day(make_date($DefaultYear, $monthCase, 1)))
             THEN make_date($DefaultYear, $monthCase,
                    CAST(regexp_extract(raw_date, '^(\\d{1,2})', 1) AS INT))
           ELSE NULL END AS normalized
       FROM raw ORDER BY o_orderkey"""
  }

  /** Multi-value list split -> exploded normalized rows (the reference
    * splits secteur/skills CSV-strings to arrays). Projection before the
    * explode keeps the blown-up intermediate to (id, token).
    */
  def splitExplodeMultivalue(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("n"))
      .orderBy("doc_id", "token")

  val splitExplodeMultivalueSql: String =
    """SELECT doc_id, token, COUNT(*) AS n
       FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
             FROM documents)
       WHERE token <> '' GROUP BY doc_id, token ORDER BY doc_id, token"""

  /** String normalization: trim/lower/upper/replace chains. */
  def trimNormStrings(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        lower(trim(col("p_brand"))).as("brand_norm"),
        upper(trim(col("p_type"))).as("type_norm"),
        regexp_replace(lower(col("p_name")), "\\s+", "_").as("name_slug"))
      .orderBy("p_partkey")

  val trimNormStringsSql: String =
    """SELECT p_partkey, lower(trim(p_brand)) AS brand_norm,
       upper(trim(p_type)) AS type_norm,
       regexp_replace(lower(p_name), '\s+', '_', 'g') AS name_slug
       FROM part ORDER BY p_partkey"""

  /** Null-domain defaulting (fillna 'Unspecified'). Testdata has no nulls
    * so one is manufactured via NULLIF to exercise the path.
    */
  def fillnaUnspecified(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
          lit("Unspecified")).as("segment"))
      .groupBy("segment").agg(count(lit(1)).as("n"))
      .orderBy("segment")

  val fillnaUnspecifiedSql: String =
    """SELECT COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'Unspecified') AS segment,
       COUNT(*) AS n FROM customer GROUP BY 1 ORDER BY 1"""

  /** JSON field extraction from a string column (scraper payloads). */
  def jsonExtractProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k")

  val jsonExtractPropsSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, COUNT(*) AS n
       FROM events GROUP BY 1 ORDER BY 1"""

  def queries: Seq[Q] = Seq(
    Q("clean_required_filter", Some(requiredFilterSql))(requiredFilter),
    Q("dedup_exact_key", Some(dedupExactKeySql))(dedupExactKey),
    Q("normalize_date_multiformat", Some(normalizeDateMultiformatSql))(normalizeDateMultiformat),
    Q("split_explode_multivalue", Some(splitExplodeMultivalueSql), bench = true)(splitExplodeMultivalue),
    Q("trim_norm_strings", Some(trimNormStringsSql))(trimNormStrings),
    Q("fillna_unspecified", Some(fillnaUnspecifiedSql))(fillnaUnspecified),
    Q("json_extract_props", Some(jsonExtractPropsSql))(jsonExtractProps))
}
