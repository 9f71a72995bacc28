package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Count-Min Sketch as a MERGEABLE-SUMMARIES API (Cormode &
  * Muthukrishnan 2005) — the frequency twin of [[HllSketch]]'s
  * distinct-count tier:
  *
  *  - `graft_cms_sketch(col)`      aggregate -> BINARY counter matrix,
  *  - `graft_cms_merge(sketch)`    aggregate -> BINARY (elementwise SUM),
  *  - `graft_cms_est(sketch, key)` scalar    -> BIGINT upper-bound count.
  *
  * Where HLL registers merge by MAX, CMS counters merge by ADDITION —
  * still commutative/associative, so sketches are independent of
  * partitioning and merge order (spec-pinned: merged daily sketches are
  * BIT-IDENTICAL to a direct weekly sketch). The 100 TB story is the
  * same: persist one [[Depth]]x[[Width]] long matrix (~16 KiB) per
  * day/tenant ONCE, answer any coarser per-key frequency rollup by
  * adding blobs — never rescanning events. Estimates are one-sided:
  * est >= true count always, and exceeds it by ~2N/W with probability
  * decaying geometrically in [[Depth]] (the min over rows).
  *
  * Row hashes derive from one FNV-1a/splitmix pass ([[HllSketch.hash64]])
  * split into (h1, h2) halves, g_i = h1 + i*h2 — the standard
  * pairwise-independent family, deterministic everywhere, no engine
  * hash() (SURVEY §5).
  */
object CmsSketch {

  val SketchFn = "graft_cms_sketch"
  val MergeFn = "graft_cms_merge"
  val EstFn = "graft_cms_est"
  val DotFn = "graft_cms_dot"

  /** Hash rows (min over these bounds the overestimate tail). */
  val Depth = 4
  /** Counters per row (eps ~= e/Width relative error on the mass). */
  val Width = 512

  val Bytes: Int = Depth * Width * 8

  /** Counter index of `key` in hash row `i`. */
  def index(key: String, i: Int): Int = {
    val h = HllSketch.hash64(key)
    val h1 = h & 0xffffffffL
    val h2 = (h >>> 32) | 1L // odd, so rows differ for every key
    (((h1 + i * h2) & Long.MaxValue) % Width).toInt
  }

  private def counter(buf: Array[Byte], i: Int, j: Int): Long = {
    var v = 0L
    var k = (i * Width + j) * 8
    val end = k + 8
    while (k < end) { v = (v << 8) | (buf(k) & 0xffL); k += 1 }
    v
  }

  private def setCounter(buf: Array[Byte], i: Int, j: Int, v: Long): Unit = {
    var k = (i * Width + j) * 8 + 7
    var x = v
    val end = (i * Width + j) * 8
    while (k >= end) { buf(k) = (x & 0xffL).toByte; x >>>= 8; k -= 1 }
  }

  def add(buf: Array[Byte], key: String, n: Long): Unit = {
    var i = 0
    while (i < Depth) {
      val j = index(key, i)
      setCounter(buf, i, j, counter(buf, i, j) + n)
      i += 1
    }
  }

  def mergeInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b.clone()
    require(a.length == b.length,
      s"cannot merge CMS sketches of different geometry " +
        s"(${a.length} vs ${b.length} bytes)")
    var i = 0
    while (i < Depth) {
      var j = 0
      while (j < Width) {
        setCounter(a, i, j, counter(a, i, j) + counter(b, i, j))
        j += 1
      }
      i += 1
    }
    a
  }

  /** Sketch inner product (AGMS/CMS join-size estimation, Cormode &
    * Muthukrishnan §4.2): per hash row, sum counter products; take the
    * min across rows. Every term of the true inner product lands in
    * matching counters, and collision cross-terms are non-negative —
    * so the estimate is a one-sided UPPER bound on |A ⋈ B| with error
    * ~N_a*N_b/Width per row. Two 16 KiB blobs answer the planner
    * question "how big would this join be" without running the join.
    */
  def innerProduct(a: Array[Byte], b: Array[Byte]): Long = {
    if (a.isEmpty || b.isEmpty) return 0L
    require(a.length == b.length,
      s"cannot dot CMS sketches of different geometry " +
        s"(${a.length} vs ${b.length} bytes)")
    var best = Long.MaxValue
    var i = 0
    while (i < Depth) {
      // counters are bounded only by stream mass, so a row sum can
      // exceed Long range at scale; an overflowed (wrapped) row would
      // win the min and destroy the one-sided upper-bound guarantee.
      // Saturate the row to Long.MaxValue instead — a saturated row can
      // never win the min unless every row saturated, in which case
      // MaxValue is still an honest upper bound.
      var dot = 0L
      var overflow = false
      var j = 0
      while (j < Width && !overflow) {
        try dot = Math.addExact(dot,
          Math.multiplyExact(counter(a, i, j), counter(b, i, j)))
        catch { case _: ArithmeticException => overflow = true }
        j += 1
      }
      val row = if (overflow) Long.MaxValue else dot
      if (row < best) best = row
      i += 1
    }
    best
  }

  def estimate(buf: Array[Byte], key: String): Long = {
    if (buf.isEmpty) return 0L
    var best = Long.MaxValue
    var i = 0
    while (i < Depth) {
      val c = counter(buf, i, index(key, i))
      if (c < best) best = c
      i += 1
    }
    best
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      SketchFn,
      exprs => CmsSketchAgg(exprs(0)).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MergeFn,
      exprs => CmsMergeAgg(exprs(0)).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      EstFn, exprs => CmsEstimate(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotFn, exprs => CmsInnerProduct(exprs(0), exprs(1)), "built-in")
  }
}

/** Build a Depth x Width CMS counter matrix over a string column. */
case class CmsSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")

  override def prettyName: String = CmsSketch.SketchFn
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](CmsSketch.Bytes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) CmsSketch.add(buf, v.toString, 1L)
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    CmsSketch.mergeInto(a, b)

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren.head)
}

/** Merge pre-built CMS sketches (elementwise counter addition). Starts
  * empty and adopts the first sketch's geometry; mixing geometries is a
  * hard error, not a silent wrong answer.
  */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${child.dataType.sql}")

  override def prettyName: String = CmsSketch.MergeFn
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else CmsSketch.mergeInto(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    CmsSketch.mergeInto(a, b)

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = newChildren.head)
}

/** Scalar point-frequency estimate: min over hash rows. Runs on
  * sketch-cardinality frames (per-week rows x probe keys), so
  * interpreted eval is fine — no codegen needed on this path.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${CmsSketch.EstFn} requires (binary sketch, string key), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def prettyName: String = CmsSketch.EstFn
  override def dataType: DataType = LongType

  override protected def nullSafeEval(sk: Any, key: Any): Any =
    CmsSketch.estimate(sk.asInstanceOf[Array[Byte]], key.toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** Scalar join-size estimate between two sketch blobs (min-over-rows
  * counter inner product). Runs on sketch-cardinality frames.
  */
case class CmsInnerProduct(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${CmsSketch.DotFn} requires two binary sketches, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def prettyName: String = CmsSketch.DotFn
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CmsSketch.innerProduct(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsInnerProduct =
    copy(left = newLeft, right = newRight)
}
