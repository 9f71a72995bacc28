package graft.plans

import java.util.zip.Deflater

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_deflate_len(text)` -> INT: the DEFLATE-compressed size of a
  * string's UTF-8 bytes — the primitive behind the compression-ratio
  * quality signal large-corpus curation pipelines use (a document that
  * compresses far below typical prose is boilerplate/repetition; one
  * that doesn't compress at all is likely binary junk or ciphertext).
  * Complements [[graft.operators.TextAnalysis]]'s exact-repetition
  * scores: DEFLATE's LZ77 window catches long-range and approximate
  * redundancy that n-gram ratios miss.
  *
  * Deterministic for a fixed level on a given JVM (java.util.zip wraps
  * the JDK's bundled zlib; level [[Level]] pinned, no header
  * variability with the raw-deflate constructor disabled — we keep the
  * zlib wrapper, its 2+4 bytes are constant). Per-row cost is linear
  * in the text; the expression allocates one Deflater per eval — fine
  * on projection paths; pool per-thread if profiling ever flags it.
  * No DuckDB twin exists, so queries over it are rows-only + spec.
  */
object DeflateLen {

  val FnName = "graft_deflate_len"

  /** zlib level 6: the default speed/ratio trade, pinned for
    * determinism across sessions.
    */
  val Level = 6

  def deflateLen(bytes: Array[Byte]): Int = {
    val d = new Deflater(Level)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => DeflateLenExpr(exprs(0)), "built-in")
}

case class DeflateLenExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")

  override def prettyName: String = DeflateLen.FnName
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(v: Any): Any =
    DeflateLen.deflateLen(v.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(
      newChild: Expression): DeflateLenExpr = copy(child = newChild)
}
