package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sliding word k-grams over an `array<string>` as a native codegen'd
  * expression.
  *
  * Bit-for-bit equivalent to the composable form
  * `transform(sequence(1, greatest(n-k+1, 1)), i -> array_join(slice(tk, i, k), " "))`
  * (including the short-array whole-doc shingle and the `[""]` result
  * for an empty token array) — but that chain is three nested
  * higher-order functions evaluated interpreted, with a sequence array,
  * k-element slice copy, and boxed join per position. This is one tight
  * loop over the backing `ArrayData` and stays inside whole-stage
  * codegen, which matters because shingling is the innermost map work
  * of every MinHash/fingerprint pass over the corpus.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_word_shingles requires array<string> and k >= 1, got " +
        s"${child.dataType.sql}, k=$k")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** shared by eval and the generated code */
  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    WordShingles.shingle(arr, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.plans.WordShingles.shingle($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  /** One pass: out[i] = join(arr[i .. min(i+k,n)-1], " ") for
    * i in 0 until max(n-k+1, 1). Called from generated code.
    */
  def shingle(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val m = math.max(n - k + 1, 1)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val len = math.min(k, n - i)
      if (len <= 0) {
        out(i) = UTF8String.EMPTY_UTF8
      } else {
        val parts = new Array[UTF8String](len)
        var j = 0
        while (j < len) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(Space, parts: _*)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  val FnName = "graft_word_shingles"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName,
      exprs => WordShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int]),
      "built-in")
}
