package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Bloom filter as an explicit, broadcastable JOIN-PRUNING summary
  * (Bloom 1970; the manual form of runtime row-level join filtering):
  *
  *  - `graft_bloom_agg(key, log2bits)` aggregate -> BINARY bit array,
  *  - `graft_bloom_merge(bf)`          aggregate -> BINARY (bitwise OR),
  *  - `graft_bloom_contains(bf, key)`  scalar    -> BOOLEAN.
  *
  * The 100 TB scenario this exists for: a fact-dim join where the
  * FILTERED dim is still too big to broadcast (a shuffle join), but
  * its KEY SET summarizes into a few hundred KiB. Broadcasting the
  * bloom and filtering the fact BEFORE its Exchange means the shuffle
  * carries only rows that can possibly match (true matches + the fp
  * tail), not the whole fact table — the join itself then discards
  * false positives, so the RESULT is exactly the plain join's
  * (no-false-negatives is structural: every inserted key sets all its
  * bits, so a member can never read back 0). Spark's AQE injects this
  * rewrite when its heuristics fire; the explicit operator makes the
  * plan available unconditionally and feeds from any key-set frame.
  *
  * Merge is bitwise OR — commutative, associative, idempotent — so
  * blobs are independent of partitioning and merge order, and partial
  * blooms (per-partition, per-day) union into exactly the bloom of the
  * union of their key sets (spec-pinned bit-identical). Geometry is
  * per-call: `log2bits` sizes the array (20 -> 2^20 bits = 128 KiB);
  * [[K]] hash probes per key from the same split-hash family as the
  * CMS tier ([[HllSketch.hash64]]) — deterministic everywhere, no
  * engine hash(). FP rate ~ (1 - e^(-K*n/m))^K: 128 KiB holds ~100k
  * keys at <1% fp; scale log2bits with the key count, never with the
  * fact side.
  */
object BloomFilter {

  val AggFn = "graft_bloom_agg"
  val MergeFn = "graft_bloom_merge"
  val ContainsFn = "graft_bloom_contains"

  /** Hash probes per key. */
  val K = 5

  /** Bit indices of `key` in an `m`-bit filter (double hashing). */
  private def probe(key: String, i: Int, mBits: Long): Long = {
    val h = HllSketch.hash64(key)
    val h1 = h & 0xffffffffL
    val h2 = (h >>> 32) | 1L
    ((h1 + i * h2) & Long.MaxValue) % mBits
  }

  def add(buf: Array[Byte], key: String): Unit = {
    val m = buf.length.toLong * 8
    var i = 0
    while (i < K) {
      val b = probe(key, i, m)
      buf((b >>> 3).toInt) = (buf((b >>> 3).toInt) | (1 << (b & 7)).toByte).toByte
      i += 1
    }
  }

  def contains(buf: Array[Byte], key: String): Boolean = {
    if (buf.isEmpty) return false
    val m = buf.length.toLong * 8
    var i = 0
    while (i < K) {
      val b = probe(key, i, m)
      if ((buf((b >>> 3).toInt) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }

  def mergeInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b.clone()
    require(a.length == b.length,
      s"cannot OR bloom filters of different geometry " +
        s"(${a.length} vs ${b.length} bytes)")
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      AggFn, exprs => BloomAgg(exprs(0),
        if (exprs.length > 1) exprs(1) else Literal(20))
        .toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MergeFn,
      exprs => BloomMergeAgg(exprs(0)).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ContainsFn, exprs => BloomContains(exprs(0), exprs(1)), "built-in")
  }
}

/** Build a 2^log2bits-bit bloom filter over a string key column. */
case class BloomAgg(
    child: Expression,
    log2bits: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child, log2bits)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key column, got ${child.dataType.sql}")
    else if (!log2bits.foldable || log2bits.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName log2bits must be an int literal")
    else {
      val b = log2bits.eval().asInstanceOf[Int]
      if (b >= 3 && b <= 33) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName log2bits must be in [3, 33], got $b")
    }

  private lazy val bytes = 1 << (log2bits.eval().asInstanceOf[Int] - 3)

  override def prettyName: String = BloomFilter.AggFn
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](bytes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomFilter.add(buf, v.toString)
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    BloomFilter.mergeInto(a, b)

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(b: Array[Byte]): Array[Byte] = b

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren(0), log2bits = newChildren(1))
}

/** Union pre-built bloom blobs (bitwise OR; geometry mismatch is a
  * hard error, not a silent wrong answer).
  */
case class BloomMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary bloom column, got ${child.dataType.sql}")

  override def prettyName: String = BloomFilter.MergeFn
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else BloomFilter.mergeInto(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    BloomFilter.mergeInto(a, b)

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(b: Array[Byte]): Array[Byte] = b

  override def withNewMutableAggBufferOffset(offset: Int): BloomMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomMergeAgg =
    copy(child = newChildren.head)
}

/** Membership probe. Runs per fact row in the pruning filter — kept
  * CodegenFallback because the K probes over a broadcast blob are
  * array reads (the surrounding Filter/scan stage still codegens);
  * promote to doGenCode if profiling ever flags it.
  */
case class BloomContains(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${BloomFilter.ContainsFn} requires (binary bloom, string key), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override def prettyName: String = BloomFilter.ContainsFn
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(bf: Any, key: Any): Any =
    BloomFilter.contains(bf.asInstanceOf[Array[Byte]], key.toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
