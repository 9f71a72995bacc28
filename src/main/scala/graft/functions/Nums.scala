package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-parity numeric helpers (SURVEY.md §5).
  *
  * Hash-compared results must never carry float non-determinism: Spark and
  * DuckDB may sum doubles in different orders. Both engines implement
  * exact decimal arithmetic, so money-style aggregates are computed in
  * DECIMAL and only the *final* value is cast to DOUBLE (identical bits on
  * both sides). Precisions are chosen so products stay below DECIMAL(38)
  * in BOTH engines' widening rules (Spark p1+p2+1 / DuckDB p1+p2):
  * P(14,4) x F(8,6) -> (23,10); x F(8,6) again -> (32,16): exact.
  */
object Nums {
  val P = DecimalType(14, 4) // prices, quantities (< 10^10)
  val F = DecimalType(8, 6)  // factors like (1 - discount)

  /** price/quantity operand */
  def decp(c: Column): Column = c.cast(P)

  /** small-factor operand */
  def decf(c: Column): Column = c.cast(F)

  /** exact decimal sum surfaced as double */
  def dsum(c: Column): Column = sum(c).cast("double")

  /** exact mean: decimal sum -> double, divided by count as double */
  def davg(c: Column): Column =
    sum(c).cast("double") / count(lit(1)).cast("double")

  // SQL-side twins (DuckDB syntax) for building oracle strings.
  // The DECIMAL->DOUBLE hop goes through VARCHAR: DuckDB casts wide
  // decimals to double as (double)int128 / 10^scale — TWO roundings, up
  // to an ulp off — while Spark's BigDecimal.doubleValue is correctly
  // rounded. A decimal's text form parses correctly-rounded in both.
  def sqlDecp(e: String): String = s"CAST($e AS DECIMAL(14,4))"
  def sqlDecf(e: String): String = s"CAST($e AS DECIMAL(8,6))"
  def sqlDsum(e: String): String =
    s"CAST(CAST(SUM($e) AS VARCHAR) AS DOUBLE)"
  def sqlDavg(e: String): String =
    s"(${sqlDsum(e)} / CAST(COUNT(*) AS DOUBLE))"
}
