package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two `array<bigint>` columns as a native
  * Catalyst expression WITH whole-stage codegen.
  *
  * Why it exists: the composable route —
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` — is a higher-order
  * function, which Spark evaluates interpreted (one closure call + boxed
  * Long per element). On the all-pairs similarity paths that is the hot
  * loop: sf0.1 spends 40+ s there. This expression compiles to a tight
  * primitive `long` loop over the two `ArrayData` (2M pairs x 64 dims
  * drops to ~2 s), and at cluster scale keeps the surrounding join
  * stage inside one WholeStageCodegen span.
  *
  * Semantics match the interpreted fold exactly: integer multiply-add is
  * associative, so result bits are independent of evaluation strategy
  * (this is why [[graft.functions.Vectors]] quantizes floats first).
  * Like the fold (`zip_with` pads, `+` null-propagates), a length
  * mismatch or a null element yields NULL — and when the input types
  * prove containsNull=false, the generated loop carries no per-element
  * null checks at all.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  /** NULL can arise from mismatched lengths even for non-null inputs. */
  override def nullable: Boolean = true

  private def mayContainNulls: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  })

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${LongDot.FnName} requires two array<bigint> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // per-element null checks only when the types can't rule nulls out
      val guard =
        if (mayContainNulls)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $guard
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

object LongDot {
  val FnName = "graft_long_dot"

  /** Idempotent session registration; afterwards
    * `expr("graft_long_dot(a, b)")` works in any DataFrame/SQL plan.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => LongDot(exprs(0), exprs(1)), "built-in")
}
