package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All loaders are plain parquet scans so Catalyst predicate pushdown /
  * column pruning reach the file format (verify via
  * `.explain("formatted")` → PushedFilters / ReadSchema). The only
  * normalization done here is the `events.ts` nanosecond repair, which is
  * a projection (no shuffle, stays in whole-stage codegen).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  // fact tables are NOT fanned out: their consumers filter/aggregate
  // immediately, and an extra exchange of full rows costs more than the
  // single-task map work it parallelizes (measured: +13% bench total) —
  // map-side partial aggregation already compacts before the shuffle
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** Fan a narrow scan out to all cores when the file layout cannot:
    * the testdata tables are single-file SINGLE-ROW-GROUP parquet, i.e.
    * unsplittable — every scan is one task, and the heavy per-row work
    * of the corpus consumers (shingling, 16x md5 signatures, quantized
    * dots) would run single-threaded before the first shuffle. An
    * explicit-count repartition (which AQE does NOT coalesce away,
    * unlike column-only repartitions) of the raw (id, text) rows costs
    * <1 MB of shuffle and buys full-width map parallelism. No-op when
    * the scan already has enough splits — i.e. on any real multi-file
    * table at cluster scale.
    */
  private[graft] def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  // corpus tables: every consumer does heavy per-row compute
  def documents(s: SparkSession, d: String): DataFrame =
    fanOut(table(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    fanOut(table(s, d, "embeddings"))

  /** events.ts has shipped as parquet TIMESTAMP(NANOS, adjusted=false)
    * (which Spark's reader rejects outright) in some testdata
    * generations and TIMESTAMP(MICROS, adjusted=false) in others, so the
    * repair is type-conditional on the scanned schema:
    *  - nanos: with `spark.sql.legacy.parquet.nanosAsLong` the column
    *    arrives as an int64 of epoch-nanos; convert with integer
    *    division (a double division would lose precision above
    *    2^53 ns ≈ 1970+104d);
    *  - NTZ micros: cast to session-TZ TIMESTAMP (inferTimestampNTZ is
    *    also disabled session-wide, which makes this a no-op branch).
    * Session TZ is UTC so the resulting TIMESTAMP behaves identically to
    * the naive value DuckDB sees either way.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val t = table(s, d, "events")
    t.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        t.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        t.withColumn("ts", col("ts").cast("timestamp"))
      case _ => t
    }
  }

  /** Register every testdata table as a temp view so `spark.sql(...)`
    * works directly — the ad-hoc/SQL-gateway entry point next to the
    * typed loaders. Views go through the SAME loaders (events gets its
    * nanosecond repair, corpus tables their fan-out), so SQL users and
    * DataFrame users see identical tables.
    */
  def createViews(s: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = n match {
        case "events" => events(s, dir)
        case "documents" => documents(s, dir)
        case "embeddings" => embeddings(s, dir)
        case other => table(s, dir, other)
      }
      df.createOrReplaceTempView(n)
    }
}
