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
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS, adjusted=false), which Spark's
    * reader rejects outright. With `spark.sql.legacy.parquet.nanosAsLong`
    * it arrives as an int64 of epoch-nanos; convert with integer division
    * (a double division would lose precision above 2^53 ns ≈ 1970+104d).
    * Session TZ is UTC so the resulting TIMESTAMP behaves identically to
    * the naive value DuckDB sees.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}
