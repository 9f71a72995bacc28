package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract (see SURVEY.md §7): the full operator registry exposed
  * as name -> implementation plus the DuckDB oracle SQL per query.
  */
object SparkEntry {

  /** Flagship query on sf0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q1_agg").fn(Graft.tune(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. `Graft.tune`
    * defends against a driver-built session missing the nanos/UTC confs.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q =>
      q.name -> ((s: SparkSession, d: String) => q.fn(Graft.tune(s), d))).toMap

  /** DuckDB-runnable oracle SQL per query (keys match `queries`). */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.sql.map(q.name -> _)).toMap
}
