package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** HyperLogLog as a MERGEABLE-SUMMARIES API (Flajolet et al. 2007;
  * Heule et al. "HyperLogLog in Practice" for the bias regime
  * boundaries): three composable pieces instead of one opaque
  * `approx_count_distinct` —
  *
  *  - `graft_hll_sketch(col, p)`  aggregate -> BINARY register array,
  *  - `graft_hll_merge(sketch)`   aggregate -> BINARY (elementwise max),
  *  - `graft_hll_est(sketch)`     scalar    -> BIGINT estimate.
  *
  * The split is the 100 TB point: persist per-partition (per-day,
  * per-tenant) sketches ONCE, then answer any coarser distinct-count
  * rollup by merging 2^p-byte blobs — no rescan of the corpus. Register
  * max-merge is commutative/associative/idempotent, so estimates are
  * independent of partitioning, merge order, and retry duplication
  * (the property the rollup spec pins: merged daily sketches are
  * BIT-IDENTICAL to a direct weekly sketch).
  *
  * Hashing is FNV-1a 64 with a splitmix64 finalizer — deterministic
  * everywhere, no engine hash() involved (SURVEY §5: engine hashes are
  * not portable; this one is ours).
  */
object HllSketch {

  val SketchFn = "graft_hll_sketch"
  val MergeFn = "graft_hll_merge"
  val EstFn = "graft_hll_est"
  val UnionFn = "graft_hll_union"

  /** FNV-1a 64 over UTF-8 bytes + splitmix64 finalizer (FNV's low-bit
    * diffusion alone is too weak for register selection).
    */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // splitmix64 finalizer
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Standard HLL estimate over a register array, with the small-range
    * linear-counting correction (the only regime the testdata hits
    * aside from the raw formula; the 2^64 large-range correction is
    * unreachable with 64-bit hashes in practice).
    */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -(regs(i) & 0xff).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.round(corrected)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      SketchFn,
      exprs => HllSketchAgg(exprs(0),
        p = exprs(1).eval().asInstanceOf[Int]).toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MergeFn,
      exprs => HllMergeAgg(exprs(0)).toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      EstFn, exprs => HllEstimate(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      UnionFn, exprs => HllUnion(exprs(0), exprs(1)), "built-in")
  }
}

/** Build a 2^p-register HLL sketch of a string column. */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"graft_hll_sketch precision $p not in [4,16]")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.sql}")

  override def prettyName: String = HllSketch.SketchFn
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) return buf
    val h = HllSketch.hash64(v.toString)
    val bucket = (h >>> (64 - p)).toInt
    // rank = leading zeros of the remaining 64-p bits, +1; capped so it
    // fits a byte with huge headroom
    val rest = h << p
    val rank = (if (rest == 0L) 64 - p
                else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if ((buf(bucket) & 0xff) < rank) buf(bucket) = rank.toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren.head)
}

/** Merge pre-built HLL sketches (elementwise register max). The buffer
  * starts empty and adopts the first sketch's width, so one merge
  * function serves any precision; mixing widths is a hard error, not a
  * silent wrong answer.
  */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${child.dataType.sql}")

  override def prettyName: String = HllSketch.MergeFn
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def mergeInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b.clone()
    require(a.length == b.length,
      s"cannot merge HLL sketches of different precision " +
        s"(${a.length} vs ${b.length} registers)")
    var i = 0
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else mergeInto(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    mergeInto(a, b)

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = newChildren.head)
}

/** Scalar UNION of two sketch blobs (elementwise register max) — the
  * sketch-algebra piece that unlocks set arithmetic on persisted
  * sketches: |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B) by
  * inclusion-exclusion, all from blobs, no rescan. Register max is
  * idempotent, so union of a sketch with itself is itself.
  */
case class HllUnion(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${HllSketch.UnionFn} requires two binary sketches, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def prettyName: String = HllSketch.UnionFn
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (ra, rb) = (a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    if (ra.isEmpty) return rb.clone()
    if (rb.isEmpty) return ra.clone()
    require(ra.length == rb.length,
      s"cannot union HLL sketches of different precision " +
        s"(${ra.length} vs ${rb.length} registers)")
    val out = ra.clone()
    var i = 0
    while (i < out.length) {
      if ((rb(i) & 0xff) > (out(i) & 0xff)) out(i) = rb(i)
      i += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllUnion =
    copy(left = newLeft, right = newRight)
}

/** Scalar estimate over a sketch blob. Runs on sketch-cardinality
  * frames (per-day/week rows), so interpreted eval is fine — no
  * codegen needed on this path.
  */
case class HllEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${HllSketch.EstFn} requires a binary sketch column, " +
        s"got ${child.dataType.sql}")

  override def prettyName: String = HllSketch.EstFn
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val regs = input.asInstanceOf[Array[Byte]]
    if (regs.isEmpty) 0L else HllSketch.estimate(regs)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HllEstimate = copy(child = newChild)
}
