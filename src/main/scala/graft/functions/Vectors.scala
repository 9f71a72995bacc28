package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float>`.
  *
  * Cross-engine float parity trick: multiplying a float by 2^20 and
  * flooring is EXACT in IEEE arithmetic (the mantissa is unchanged by a
  * power-of-two scale), so `floor(x * 2^20)` produces the same BIGINT in
  * Spark and DuckDB bit-for-bit. All dot products are then exact integer
  * sums — order-independent, so distributed partial aggregation cannot
  * produce a different result than a single-threaded oracle. Final
  * cosine = int/sqrt(int)*sqrt(int) in doubles is IEEE-deterministic.
  *
  * At 100 TB this matters twice over: reproducible reductions regardless
  * of partitioning, and integer SIMD instead of FP accumulation.
  */
object Vectors {
  /** 2^20 fixed-point scale: |x| <= ~8 keeps |q| < 2^23, so a 64-dim dot
    * stays < 2^52 — exact in BIGINT and exactly representable in double.
    */
  val Scale = 1048576L

  /** array<float> -> array<bigint> fixed-point quantization. */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * lit(Scale)).cast("long"))

  /** SQL twin over an embedding list expression. */
  def sqlQuantize(e: String): String =
    s"list_transform($e, x -> CAST(floor(CAST(x AS DOUBLE) * $Scale) AS BIGINT))"

  /** Exact integer dot product of two quantized vectors, via the native
    * codegen'd [[graft.plans.LongDot]] expression (registered by
    * `Graft.tune`). The composable `aggregate(zip_with(...))` fold
    * computes identical bits but runs interpreted — 20x slower on
    * all-pairs joins.
    */
  def dotQ(a: Column, b: Column): Column =
    call_function(graft.plans.LongDot.FnName, a, b)

  /** SQL twin: exact integer dot via list comprehension over positions.
    * `dim` is the (fixed) embedding width.
    */
  def sqlDotQ(a: String, b: String, dim: Int): String =
    s"CAST(list_sum(list_transform(generate_series(1, $dim), i -> $a[i] * $b[i])) AS BIGINT)"

  /** cosine from exact integer dot/norms — bit-identical across engines. */
  def cosineQ(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  def sqlCosineQ(dot: String, na: String, nb: String): String =
    s"(CAST($dot AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE))))"
}
