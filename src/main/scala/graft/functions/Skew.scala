package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffle joins (SURVEY.md §6).
  *
  * AQE's skew-join splitting handles sort-merge joins after the fact;
  * salting is the PROACTIVE form for the pathological case — one hot key
  * holding a double-digit share of a 100 TB fact — and the only form
  * that works when the skewed side must also aggregate on the key.
  *
  * The salt is deterministic (hash of a row-identity column, never
  * rand()): retried tasks must re-salt identically or shuffle retries
  * silently duplicate/lose rows.
  */
object Skew {

  /** Equi-join `big` (skewed) with `small` on `key`, spreading each hot
    * key over `nSalts` reducers: big rows get salt = pmod(hash(idCol)),
    * small rows are replicated once per salt. Result equals
    * `big.join(small, key)` exactly; the shuffle for any single key
    * fans out nSalts-wide.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      idCol: String, nSalts: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(hash(col(idCol)), lit(nSalts)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. For algebraic aggregates this is what
    * map-side combine already does; the explicit form is for when a hot
    * key's PARTIALS still overload one reducer (e.g. collect-like or
    * high-cardinality-state aggregates).
    */
  def saltedCount(df: DataFrame, key: Column, idCol: Column,
      nSalts: Int): DataFrame =
    df.groupBy(key.as("k"), pmod(hash(idCol), lit(nSalts)).as("_salt"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_n")).as("n"))
}
