package graft.operators

import graft.functions.Keys
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

  /** Landing-zone schema for scraped offers — the reference's
    * global_schema (transform_job.py:15-38) including the nested
    * NER-output skills struct.
    */
  val offerSchema: StructType = StructType(Seq(
    StructField("job_url", StringType),
    StructField("titre", StringType),
    StructField("via", StringType),
    StructField("publication_date", StringType),
    StructField("description", StringType),
    StructField("competences", StringType),
    StructField("contrat", StringType),
    StructField("companie", StringType),
    StructField("secteur", StringType),
    StructField("niveau_etudes", StringType),
    StructField("niveau_experience", StringType),
    StructField("skills", StructType(Seq(
      StructField("hard_skills", ArrayType(StringType)),
      StructField("soft_skills", ArrayType(StringType)))))))

  /** The reference's flatten_skills_udf (transform_job.py:145-175) —
    * `{hard_skills: [...], soft_skills: [...]}` to
    * `array<struct{nom, type_skill}>` — as pure array functions: no
    * UDF, no Python worker round-trip, fully codegen-able.
    */
  def flatSkills: org.apache.spark.sql.Column = {
    def typed(arr: org.apache.spark.sql.Column, t: String) =
      transform(
        filter(coalesce(arr, array().cast("array<string>")),
          n => n.isNotNull && trim(n) =!= ""),
        n => struct(lower(trim(n)).as("nom"), lit(t).as("type_skill")))
    concat(typed(col("skills.hard_skills"), "hard"),
      typed(col("skills.soft_skills"), "soft"))
  }

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
      // comma-list secteur -> array (transform_job.py:216), trims, and
      // 'Unspecified' domain defaulting (transform_job.py:231)
      .withColumn("secteurs",
        filter(split(coalesce(col("secteur"), lit("")), ",\\s*"),
          x => trim(x) =!= ""))
      .withColumn("compagnie",
        coalesce(nullif(trim(col("companie")), lit("")), lit("Unspecified")))
      .withColumn("contrat",
        coalesce(nullif(trim(col("contrat")), lit("")), lit("Unspecified")))
      .withColumn("niveau_etudes",
        coalesce(nullif(trim(col("niveau_etudes")), lit("")), lit("Unspecified")))
      .withColumn("niveau_experience",
        coalesce(nullif(trim(col("niveau_experience")), lit("")), lit("Unspecified")))
      .withColumn("skills_flat", flatSkills)
  }

  /** Skill stage: the reference gets skills from BOTH the NER payload
    * (skills struct, flattened) and skillner's phrase matching; the
    * union feeds the skill dimension and bridge. Phrase matching is a
    * broadcast-vocabulary equi-join over unigrams + array-side bigrams.
    */
  def offerSkills(offers: DataFrame, vocab: DataFrame): DataFrame = {
    val toksC = filter(split(lower(col("description")), "\\s+"), t => t =!= lit(""))
    val bigrams = when(size(toksC) >= 2,
      zip_with(slice(toksC, lit(1), size(toksC) - 1),
        slice(toksC, lit(2), size(toksC) - 1),
        (x, y) => concat(x, lit(" "), y)))
      .otherwise(array().cast("array<string>"))
    val matched = offers
      .select(col("job_url"), explode(concat(toksC, bigrams)).as("term"))
      .join(broadcast(vocab), col("term") === vocab("skill"))
      .select(col("job_url"), col("skill").as("nom"),
        col("skill_type").as("type_skill"))
    val payload = offers
      .select(col("job_url"), explode(col("skills_flat")).as("sk"))
      .select(col("job_url"), col("sk.nom").as("nom"),
        col("sk.type_skill").as("type_skill"))
    matched.unionByName(payload).distinct()
  }

  /** Enrichment stage (Groq pipeline, deterministic re-expression of
    * its fallback-profile rules, init_groq.py:164-228): title
    * homogenization, sector classification, qualification ordinal,
    * plus the reference's contract and experience canonicalization.
    * Deviation from the reference, documented: its fallback forces
    * unknown contracts to "CDI" and unknown experience to "senior" —
    * that fabricates data, so unrecognized values stay "Unspecified"
    * here (the transform_job fillna domain).
    */
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
      // contract canonicalization (init_groq.py:185-195)
      .withColumn("contrat",
        when(lower(col("contrat")).contains("cdi"), "CDI")
          .when(lower(col("contrat")).contains("cdd"), "CDD")
          .when(lower(col("contrat")).contains("freelance"), "Freelance")
          .when(lower(col("contrat")).contains("stage"), "Stage")
          .otherwise(col("contrat")))
      // experience canonicalization (init_groq.py:198-205; the
      // reference checks the expert list FIRST, so "senior" => expert)
      .withColumn("niveau_experience",
        when(lower(col("niveau_experience"))
          .rlike("5 ans|10 ans|senior|expert"), "expert")
          .when(lower(col("niveau_experience"))
            .rlike("junior|débutant|1 an|2 ans"), "junior")
          .when(col("niveau_experience") === "Unspecified", "Unspecified")
          .otherwise("senior"))

  /** A get-or-create dimension as distinct + dense surrogate keys
    * (two-phase Keys.denseIds — a global ROW_NUMBER window would move
    * every distinct title/company through one task at scale).
    */
  def dim(df: DataFrame, natural: String, idCol: String): DataFrame =
    Keys.denseIds(df.select(lower(trim(col(natural))).as("value")).distinct(),
      Nil, Seq("value"), idCol)
      .select("value", idCol)

  /** The reference's DEFAULT_DATE calendar sentinel
    * (insert_to_postgres.py:10) — the row facts without a parseable
    * publication date reference.
    */
  val SentinelDate = "2000-01-01"

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
    // dim_compagnie carries a secteur attribute (schema.sql:36-41);
    // companies appearing under several sectors keep the min — a
    // deterministic stand-in for the reference's first-insert-wins
    val dCompagnie = Keys.denseIds(
      offers.select(lower(trim(col("compagnie"))).as("value"), col("secteur"))
        .groupBy("value").agg(min(col("secteur")).as("secteur")),
      Nil, Seq("value"), "id_compagnie")
      .select("value", "secteur", "id_compagnie")
    // the fact join needs only (value, id) — dropping secteur avoids an
    // ambiguous column against the offer's own enriched secteur
    val dCompagnieKeys = dCompagnie.drop("secteur")
    val dEtudes = dim(offers, "niveau_etudes", "id_niveau_etudes")
    val dExp = dim(offers, "niveau_experience", "id_niveau_experience")

    // dim_date: calendar spine over the observed publication range with
    // the FULL attribute set of the reference's populate_calendar
    // (insert_to_postgres.py:95-135): month_name (%B), year_month
    // (%Y%m), ISO week, date_str (%d/%m/%Y), plus the DEFAULT_DATE
    // sentinel row (2000-01-01) facts with no valid date point at.
    val sentinel = s.range(1)
      .select(to_date(lit(SentinelDate)).as("full_date"))
    val dDate = offers.filter(col("pub_date").isNotNull)
      .agg(min(col("pub_date")).as("lo"), max(col("pub_date")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("full_date"))
      .unionByName(sentinel).distinct()
      .select(col("full_date"),
        dayofmonth(col("full_date")).as("jour"),
        month(col("full_date")).as("mois"),
        quarter(col("full_date")).as("trimestre"),
        year(col("full_date")).as("annee"),
        (weekday(col("full_date")) + 1).as("jour_semaine"),
        (year(col("full_date")) * 100 + month(col("full_date")))
          .as("year_month"),
        weekofyear(col("full_date")).as("week_of_year"),
        date_format(col("full_date"), "MMMM").as("month_name"),
        date_format(col("full_date"), "dd/MM/yyyy").as("date_str"))

    val fact = offers
      .join(broadcast(dSource), lower(trim(col("via"))) === dSource("value"))
      .join(broadcast(dContrat), lower(trim(col("contrat"))) === dContrat("value"))
      .join(broadcast(dTitre), col("titre_homogene") === dTitre("value"))
      .join(broadcast(dCompagnieKeys),
        lower(trim(col("compagnie"))) === dCompagnieKeys("value"))
      .join(broadcast(dEtudes),
        lower(trim(col("niveau_etudes"))) === dEtudes("value"))
      .join(broadcast(dExp),
        lower(trim(col("niveau_experience"))) === dExp("value"))
      .select(col("job_url"), col("pub_date"), col("id_source"),
        col("id_contrat"), col("id_titre"), col("id_compagnie"),
        col("id_niveau_etudes"), col("id_niveau_experience"),
        // fact payload columns (schema.sql:78-80)
        col("description"), col("competences"),
        col("secteur"), col("niveau_qualification"),
        (year(col("pub_date")) * 100 + month(col("pub_date"))).as("ym"))

    // skill dim is get-or-create over the UNION of payload + matched
    // skills (insert_to_postgres.py get_or_create dim_skill semantics)
    val links = offerSkills(offers, SkillExtract.vocabDf(s))
    val dSkill = Keys.denseIds(
      links.select(col("nom"), col("type_skill")).distinct(),
      Nil, Seq("nom", "type_skill"), "id_skill")
      .select("nom", "type_skill", "id_skill")
    val bridge = links
      .join(broadcast(dSkill), Seq("nom", "type_skill"))
      .select(col("job_url"), col("id_skill")).distinct()

    Warehouse.writeDim(dSource, s"$outDir/dim_source")
    Warehouse.writeDim(dContrat, s"$outDir/dim_contrat")
    Warehouse.writeDim(dTitre, s"$outDir/dim_titre")
    Warehouse.writeDim(dCompagnie, s"$outDir/dim_compagnie")
    Warehouse.writeDim(dEtudes, s"$outDir/dim_niveau_etudes")
    Warehouse.writeDim(dExp, s"$outDir/dim_niveau_experience")
    Warehouse.writeDim(dDate, s"$outDir/dim_date")
    Warehouse.writeDim(dSkill, s"$outDir/dim_skill")
    Warehouse.writeFactPartitioned(fact.filter(col("ym").isNotNull),
      s"$outDir/fact_offre", "ym", "job_url")
    bridge.write.mode("overwrite").parquet(s"$outDir/offre_skill")
    bad.write.mode("overwrite").json(s"$outDir/quarantine")

    Result(raw.count(), offers.count(), bad.count(),
      s.read.parquet(s"$outDir/fact_offre").count(),
      s.read.parquet(s"$outDir/offre_skill").count())
  }
}
