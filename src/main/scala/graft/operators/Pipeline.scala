package graft.operators

import graft.functions.Nums._
import graft.sources.{JsonLake, Warehouse}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's whole production flow as ONE composable, data-driven
  * pipeline over arbitrary job-offer frames (not bound to the testdata
  * tables): scraper JSON lake -> schema-enforced ingest + quarantine ->
  * cleaning -> skill phrase-match -> deterministic enrichment ->
  * star-schema build -> partition-aligned warehouse write.
  *
  * Reference mapping: celery DAG (/root/reference/celery_app) ordering
  * scrape -> transform (spark_pipeline/transform_job.py) -> skillner ->
  * LLM enrich -> insert_to_postgres.py. Here every stage is a pure
  * DataFrame -> DataFrame function, so the DAG is function composition
  * and Catalyst optimizes ACROSS stage boundaries (e.g. the cleaning
  * filter pushes into the JSON scan) — impossible in the reference's
  * process-per-stage design.
  */
object Pipeline {

  /** Landing-zone schema for scraped offers (transform_job.py:168-178). */
  val offerSchema: StructType = StructType(Seq(
    StructField("job_url", StringType),
    StructField("titre", StringType),
    StructField("via", StringType),
    StructField("publication_date", StringType),
    StructField("description", StringType),
    StructField("contrat", StringType),
    StructField("niveau_etudes", StringType)))

  /** Cleaning stage (clean_data): required business keys present,
    * deterministic dedup by job_url (earliest publication wins),
    * multi-format date normalization, domain defaulting.
    */
  def clean(offers: DataFrame): DataFrame = {
    val required = Seq("job_url", "titre", "via")
      .map(c => col(c).isNotNull && trim(col(c)) =!= "")
      .reduce(_ && _)
    val w = Window.partitionBy(col("job_url"))
      .orderBy(col("pub_date").asc_nulls_last, col("titre"))
    offers
      .filter(required)
      .withColumn("pub_date",
        // try_to_date: unparseable dates become NULL instead of an ANSI
        // runtime error (the reference's strptime-chain fallback)
        coalesce(
          expr("try_to_date(publication_date, 'yyyy-MM-dd')"),
          expr("try_to_date(publication_date, 'dd/MM/yyyy')")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "publication_date")
      .withColumn("contrat",
        coalesce(nullif(trim(col("contrat")), lit("")), lit("Unspecified")))
      .withColumn("niveau_etudes",
        coalesce(nullif(trim(col("niveau_etudes")), lit("")), lit("Unspecified")))
  }

  /** Skill stage (skillner): broadcast-vocabulary phrase match over the
    * description, returning the offer<->skill bridge.
    */
  def skillBridge(offers: DataFrame, vocab: DataFrame): DataFrame = {
    val toksC = filter(split(lower(col("description")), "\\s+"), t => t =!= lit(""))
    val bigrams = when(size(toksC) >= 2,
      zip_with(slice(toksC, lit(1), size(toksC) - 1),
        slice(toksC, lit(2), size(toksC) - 1),
        (x, y) => concat(x, lit(" "), y)))
      .otherwise(array().cast("array<string>"))
    offers
      .select(col("job_url"), explode(concat(toksC, bigrams)).as("term"))
      .join(broadcast(vocab), col("term") === vocab("skill"))
      .select(col("job_url"), col("skill_id"))
      .distinct()
  }

  /** Enrichment stage (Groq pipeline, deterministic re-expression). */
  def enrich(offers: DataFrame): DataFrame =
    offers
      .withColumn("titre_homogene",
        trim(regexp_replace(
          regexp_replace(lower(col("titre")), "[^a-z ]", " "), " +", " ")))
      .withColumn("secteur",
        when(lower(col("description")).contains("data"), "Data")
          .when(lower(col("description")).contains("vente"), "Commerce")
          .when(lower(col("description")).contains("cloud"), "IT")
          .otherwise("Autre"))
      .withColumn("niveau_qualification",
        when(col("niveau_etudes").contains("Doctorat"), 5)
          .when(col("niveau_etudes").contains("Master"), 4)
          .when(col("niveau_etudes").contains("Licence"), 3)
          .when(col("niveau_etudes").contains("Bac"), 2)
          .otherwise(1))

  /** A get-or-create dimension as distinct + dense surrogate keys. */
  def dim(df: DataFrame, natural: String, idCol: String): DataFrame =
    df.select(lower(trim(col(natural))).as("value")).distinct()
      .select(col("value"),
        row_number().over(Window.orderBy(col("value"))).as(idCol))

  final case class Result(nRaw: Long, nClean: Long, nQuarantined: Long,
      nFacts: Long, nSkillLinks: Long)

  /** Run the full flow from a JSON lake to a warehouse directory. */
  def run(s: SparkSession, lakePath: String, outDir: String): Result = {
    val raw = JsonLake.readJson(s, lakePath, offerSchema)
    val (ok, bad) = JsonLake.quarantine(raw)
    val offers = enrich(clean(ok))

    val dSource = dim(offers, "via", "id_source")
    val dContrat = dim(offers, "contrat", "id_contrat")
    val dTitre = dim(offers, "titre_homogene", "id_titre")
    val vocab = SkillExtract.vocabDf(s)

    val fact = offers
      .join(broadcast(dSource), lower(trim(col("via"))) === dSource("value"))
      .join(broadcast(dContrat), lower(trim(col("contrat"))) === dContrat("value"))
      .join(broadcast(dTitre), col("titre_homogene") === dTitre("value"))
      .select(col("job_url"), col("pub_date"), col("id_source"),
        col("id_contrat"), col("id_titre"), col("secteur"),
        col("niveau_qualification"),
        (year(col("pub_date")) * 100 + month(col("pub_date"))).as("ym"))

    val bridge = skillBridge(offers, vocab)

    Warehouse.writeDim(dSource, s"$outDir/dim_source")
    Warehouse.writeDim(dContrat, s"$outDir/dim_contrat")
    Warehouse.writeDim(dTitre, s"$outDir/dim_titre")
    Warehouse.writeDim(vocab, s"$outDir/dim_skill")
    Warehouse.writeFactPartitioned(fact.filter(col("ym").isNotNull),
      s"$outDir/fact_offre", "ym", "job_url")
    bridge.write.mode("overwrite").parquet(s"$outDir/offre_skill")
    bad.write.mode("overwrite").json(s"$outDir/quarantine")

    Result(raw.count(), offers.count(), bad.count(),
      s.read.parquet(s"$outDir/fact_offre").count(),
      s.read.parquet(s"$outDir/offre_skill").count())
  }
}
