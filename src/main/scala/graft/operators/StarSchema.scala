package graft.operators

import graft.Q
import graft.functions.Keys
import graft.functions.Nums._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star-schema warehouse build — the reference's Postgres loading stage
  * (/root/reference/docker-entrypoint-initdb.d/schema.sql,
  * /root/reference/spark_pipeline/insert_to_postgres.py) re-expressed as
  * set-based Spark plans. The reference's row-at-a-time `get_or_create`
  * becomes a distinct + dense surrogate key; its Python calendar loop
  * (insert_to_postgres.py:86-135 populate_calendar) becomes a
  * sequence()/explode date spine. Both are single-pass, shuffle-minimal,
  * and scale linearly — the per-row SELECT-then-INSERT of the reference
  * is the classic anti-pattern this engine replaces.
  */
object StarSchema {

  /** Calendar dimension spine: min..max order date, one row per day, with
    * the reference's dim_date attributes (schema.sql:4-12) plus
    * insert_to_postgres.py's year_month/week_of_year. The min/max agg is
    * a 2-value reduction; the spine itself is generated, not scanned.
    */
  def dimDateSpine(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .agg(min(col("o_orderdate").cast("date")).as("lo"),
        max(col("o_orderdate").cast("date")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("full_date"))
      .select(col("full_date"),
        dayofmonth(col("full_date")).as("jour"),
        month(col("full_date")).as("mois"),
        quarter(col("full_date")).as("trimestre"),
        year(col("full_date")).as("annee"),
        (weekday(col("full_date")) + 1).as("jour_semaine"),
        (year(col("full_date")) * 100 + month(col("full_date"))).as("year_month"),
        weekofyear(col("full_date")).as("week_of_year"))
      .orderBy("full_date")

  val dimDateSpineSql: String =
    """WITH span AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo,
                            CAST(max(o_orderdate) AS DATE) AS hi FROM orders),
         spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM span)
       SELECT CAST(d AS DATE) AS full_date,
         CAST(day(d) AS INT) AS jour,
         CAST(month(d) AS INT) AS mois,
         CAST(quarter(d) AS INT) AS trimestre,
         CAST(year(d) AS INT) AS annee,
         CAST(isodow(d) AS INT) AS jour_semaine,
         CAST(year(d) * 100 + month(d) AS INT) AS year_month,
         CAST(weekofyear(d) AS INT) AS week_of_year
       FROM spine ORDER BY full_date"""

  /** get-or-create dimensions re-expressed: distinct natural keys +
    * dense surrogate ids, stacked for the order dims. Deterministic
    * (sorted) unlike the reference's insertion-order serials. Ids come
    * from the two-phase Keys.denseIds — per-dim-partition windows would
    * funnel each dim's full value set through one task at scale.
    */
  def dimSurrogateKeys(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def dim(c: String, name: String) =
      o.select(lower(trim(col(c))).as("value")).distinct()
        .withColumn("dim_name", lit(name))
    val all = dim("o_orderpriority", "priority")
      .unionByName(dim("o_orderstatus", "status"))
    Keys.denseIds(all, Seq("dim_name"), Seq("value"), "id")
      .select("dim_name", "value", "id")
      .orderBy("dim_name", "id")
  }

  val dimSurrogateKeysSql: String =
    """WITH stacked AS (
         SELECT 'priority' AS dim_name, lower(trim(o_orderpriority)) AS value
           FROM orders GROUP BY 2
         UNION ALL
         SELECT 'status' AS dim_name, lower(trim(o_orderstatus)) AS value
           FROM orders GROUP BY 2)
       SELECT dim_name, value,
         CAST(ROW_NUMBER() OVER (PARTITION BY dim_name ORDER BY value) AS INT) AS id
       FROM stacked ORDER BY dim_name, id"""

  /** Fact build: natural keys -> surrogate ids via broadcast joins
    * against the (tiny) dims; the fact side never shuffles. Mirrors
    * fact_offre (schema.sql:66-80).
    */
  def factStarJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def dim(c: String) =
      Keys.denseIds(o.select(lower(trim(col(c))).as("value")).distinct(),
        Nil, Seq("value"), "id")
    val dPrio = dim("o_orderpriority")
      .withColumnRenamed("value", "prio").withColumnRenamed("id", "id_priority")
    val dStat = dim("o_orderstatus")
      .withColumnRenamed("value", "stat").withColumnRenamed("id", "id_status")
    o.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderdate").cast("date").as("date_id"),
      lower(trim(col("o_orderpriority"))).as("prio"),
      lower(trim(col("o_orderstatus"))).as("stat"),
      decp(col("o_totalprice")).cast("double").as("price"))
      .join(broadcast(dPrio), "prio")
      .join(broadcast(dStat), "stat")
      .select("o_orderkey", "o_custkey", "date_id", "id_priority", "id_status", "price")
      .orderBy("o_orderkey")
  }

  val factStarJoinSql: String =
    """WITH dprio AS (
         SELECT value AS prio, CAST(ROW_NUMBER() OVER (ORDER BY value) AS INT) AS id_priority
         FROM (SELECT DISTINCT lower(trim(o_orderpriority)) AS value FROM orders)),
       dstat AS (
         SELECT value AS stat, CAST(ROW_NUMBER() OVER (ORDER BY value) AS INT) AS id_status
         FROM (SELECT DISTINCT lower(trim(o_orderstatus)) AS value FROM orders))
       SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS date_id,
         id_priority, id_status,
         CAST(CAST(o_totalprice AS DECIMAL(14,4)) AS DOUBLE) AS price
       FROM orders
       JOIN dprio ON lower(trim(o_orderpriority)) = prio
       JOIN dstat ON lower(trim(o_orderstatus)) = stat
       ORDER BY o_orderkey"""

  /** Many-to-many bridge (offre_skill, schema.sql:83-88): document <->
    * vocabulary term with PK dedup. Tokenize -> equi-join against the
    * broadcast vocabulary -> distinct pairs; at scale this is a map-side
    * join plus one shuffle for the distinct.
    */
  def bridgeOfferSkill(s: SparkSession, dir: String): DataFrame = {
    val vocab = SkillExtract.vocabDf(s)
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .join(broadcast(vocab), col("token") === vocab("skill"))
      .select(col("doc_id"), col("skill_id"))
      .distinct()
      .orderBy("doc_id", "skill_id")
  }

  val bridgeOfferSkillSql: String =
    s"""SELECT DISTINCT doc_id, skill_id
       FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS token
             FROM documents) t
       JOIN (${SkillExtract.vocabSql}) v ON t.token = v.skill
       ORDER BY doc_id, skill_id"""

  def queries: Seq[Q] = Seq(
    Q("dim_date_spine", Some(dimDateSpineSql))(dimDateSpine),
    Q("dim_surrogate_keys", Some(dimSurrogateKeysSql))(dimSurrogateKeys),
    Q("fact_star_join", Some(factStarJoinSql), bench = true)(factStarJoin),
    Q("bridge_offer_skill", Some(bridgeOfferSkillSql))(bridgeOfferSkill))
}
