package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All 48 SimHash bit sources packed into one BIGINT with codegen.
  *
  * The SimHash signature derives bit j from the parity of a hex char of
  * the token's salted md5: chars 1..32 of md5(tok) for bits 0..31, chars
  * 1..16 of md5("#:" + tok) for bits 32..47 (operators/Dedup.scala).
  * Written compositionally that is 48 separate
  * `ascii(substring(h, j, 1)) % 2` columns — 48 string slices PER ROW in
  * the hot aggregate. This expression computes the identical bits in one
  * pass over the two digests' bytes (hex chars are ASCII, so
  * `ascii(c) % 2 == byte & 1`); the per-bit vote then becomes an integer
  * `(packed >> j) & 1` that stays in whole-stage codegen.
  *
  * The DuckDB oracle keeps the explicit ascii(substr(...)) form — the
  * VALUES are identical, only the evaluation strategy differs.
  */
case class HexParityBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${HexParityBits.FnName} requires two string arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    var p = 0L
    var j = 0
    val n1 = math.min(x.length, 32)
    while (j < n1) { p |= (x(j) & 1L) << j; j += 1 }
    j = 0
    val n2 = math.min(y.length, 16)
    while (j < n2) { p |= (y(j) & 1L) << (32 + j); j += 1 }
    p
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ab = ctx.freshName("ab")
      val bb = ctx.freshName("bb")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      s"""
         |byte[] $ab = $a.getBytes();
         |byte[] $bb = $b.getBytes();
         |long $p = 0L;
         |int n1$p = java.lang.Math.min($ab.length, 32);
         |for (int $j = 0; $j < n1$p; $j++) {
         |  $p |= ((long) ($ab[$j] & 1)) << $j;
         |}
         |int n2$p = java.lang.Math.min($bb.length, 16);
         |for (int $j = 0; $j < n2$p; $j++) {
         |  $p |= ((long) ($bb[$j] & 1)) << (32 + $j);
         |}
         |${ev.value} = $p;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HexParityBits =
    copy(left = newLeft, right = newRight)
}

object HexParityBits {
  val FnName = "graft_hex_parity"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => HexParityBits(exprs(0), exprs(1)), "built-in")
}
