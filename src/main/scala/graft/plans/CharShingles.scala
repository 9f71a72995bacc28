package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sliding character n-grams over a string as a native codegen'd
  * expression — the [[WordShingles]] pattern applied to the char level.
  *
  * Bit-for-bit equivalent to the composable form
  * `transform(sequence(1, greatest(length(s)-n+1, 1)), i -> substr(s, i, n))`
  * (including the whole-string shingle for short inputs and the `[""]`
  * result for an empty string) — but that chain evaluates interpreted
  * with a sequence array and a boxed Substring per position, and it is
  * the innermost map work of every char-n-gram Jaccard pass. This is
  * one loop of `substringSQL` calls (the same character-based substring
  * the Substring expression uses, so multi-byte text agrees) inside
  * whole-stage codegen.
  */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_char_shingles requires string and n >= 1, got " +
        s"${child.dataType.sql}, n=$n")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  protected override def nullSafeEval(input: Any): Any =
    CharShingles.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.plans.CharShingles.shingle($s, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {

  /** out[i] = substringSQL(s, i+1, n) for i in 0 until max(chars-n+1, 1).
    * Called from generated code.
    */
  def shingle(s: UTF8String, n: Int): ArrayData = {
    val chars = s.numChars()
    val m = math.max(chars - n + 1, 1)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = s.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  val FnName = "graft_char_shingles"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName,
      exprs => CharShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int]),
      "built-in")
}
