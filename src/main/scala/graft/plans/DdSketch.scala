package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** DDSketch — mergeable QUANTILES with a relative-error guarantee
  * (Masson, Rim & Lee, "DDSketch: a fast and fully-mergeable quantile
  * sketch with relative-error guarantees", VLDB 2019) — completing the
  * mergeable-summaries tier: [[HllSketch]] answers distinct-count,
  * [[CmsSketch]] frequency, [[SpaceSavingTopK]] top-k, this answers
  * "what is the p95".
  *
  *  - `graft_dds_sketch(x)`       aggregate -> BINARY bucket histogram,
  *  - `graft_dds_merge(sk)`       aggregate -> BINARY (bucket-wise SUM),
  *  - `graft_dds_quantile(sk, q)` scalar    -> DOUBLE estimate.
  *
  * A value v>0 lands in bucket ceil(ln v / ln gamma); the bucket's
  * midpoint 2*gamma^i/(gamma+1) is within [[Alpha]] RELATIVE error of
  * every value it holds, so any quantile estimate is within Alpha of
  * the true order statistic's VALUE (not its rank) — the guarantee that
  * matters for latency/price tails, where p99 is orders of magnitude
  * from p50 and an absolute-error sketch wastes all its resolution on
  * the body. Negative values bucket a mirrored store; zeros count
  * separately.
  *
  * Merge is bucket-wise addition — commutative and associative — and
  * blobs serialize in CANONICAL bucket order, so sketches are
  * bit-identical regardless of partitioning, merge order, or
  * daily-vs-direct construction (spec-pinned, like the CMS/HLL tiers).
  * Unlike KLL/t-digest there is NO sampling and NO centroid drift:
  * determinism is structural, which is what lets the parquet sketch
  * store answer any later rollup exactly as a rescan would have.
  *
  * Size: bucket count is bounded by the DATA'S DYNAMIC RANGE, not its
  * cardinality — one bucket per 2% step on the log scale, so a store
  * spanning 12 decades costs ~1400 buckets (~17 KiB); the absolute
  * ceiling over all finite doubles is ~36k buckets per sign. No
  * collapse pass: collapsing lowest buckets (the paper's bounded-size
  * variant) would make blobs depend on arrival order, and the
  * bit-identical-merge contract is worth more here than the last
  * factor of dynamic-range in the bound.
  */
object DdSketch {

  val SketchFn = "graft_dds_sketch"
  val MergeFn = "graft_dds_merge"
  val QuantileFn = "graft_dds_quantile"

  /** Relative-error bound on quantile VALUES. */
  val Alpha = 0.01
  val Gamma: Double = (1 + Alpha) / (1 - Alpha)
  private val LnGamma = math.log(Gamma)

  /** Mutable aggregation state: three stores. Keys are bucket indices. */
  final class State(
      var zero: Long,
      val pos: scala.collection.mutable.LongMap[Long],
      val neg: scala.collection.mutable.LongMap[Long]) {
    def total: Long = zero + pos.values.sum + neg.values.sum
  }

  def emptyState: State = new State(0L,
    scala.collection.mutable.LongMap.empty, scala.collection.mutable.LongMap.empty)

  def bucket(mag: Double): Int = math.ceil(math.log(mag) / LnGamma).toInt

  /** Bucket midpoint: within Alpha relative error of any member. */
  def mid(idx: Int): Double = 2.0 * math.pow(Gamma, idx) / (Gamma + 1)

  def add(st: State, v: Double): Unit = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) return
    if (v == 0.0) st.zero += 1
    else if (v > 0) { val b = bucket(v); st.pos(b) = st.pos.getOrElse(b.toLong, 0L) + 1 }
    else { val b = bucket(-v); st.neg(b) = st.neg.getOrElse(b.toLong, 0L) + 1 }
  }

  def mergeInto(a: State, b: State): State = {
    a.zero += b.zero
    b.pos.foreach { case (k, n) => a.pos(k) = a.pos.getOrElse(k, 0L) + n }
    b.neg.foreach { case (k, n) => a.neg(k) = a.neg.getOrElse(k, 0L) + n }
    a
  }

  /** Canonical bytes: counts first, zero, then each store's (idx,count)
    * pairs sorted ascending by bucket index — insertion-order-free, so
    * equal histograms give equal blobs.
    */
  def serialize(st: State): Array[Byte] = {
    val ps = st.pos.toArray.sortBy(_._1)
    val ns = st.neg.toArray.sortBy(_._1)
    val buf = ByteBuffer.allocate(4 + 4 + 8 + (ps.length + ns.length) * 12)
    buf.putInt(ps.length).putInt(ns.length).putLong(st.zero)
    ps.foreach { case (k, n) => buf.putInt(k.toInt); buf.putLong(n) }
    ns.foreach { case (k, n) => buf.putInt(k.toInt); buf.putLong(n) }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val st = emptyState
    if (bytes.isEmpty) return st
    val buf = ByteBuffer.wrap(bytes)
    val np = buf.getInt; val nn = buf.getInt
    st.zero = buf.getLong
    var i = 0
    while (i < np) { val k = buf.getInt; st.pos(k.toLong) = buf.getLong; i += 1 }
    i = 0
    while (i < nn) { val k = buf.getInt; st.neg(k.toLong) = buf.getLong; i += 1 }
    st
  }

  /** Quantile estimate: walk stores in value order (most-negative
    * first) to the bucket holding rank ceil(q*n). Null (NaN here; the
    * expression maps it to SQL NULL) on an empty sketch.
    */
  def quantile(bytes: Array[Byte], q: Double): Double = {
    val st = deserialize(bytes)
    val n = st.total
    if (n == 0L) return Double.NaN
    val qq = math.min(1.0, math.max(0.0, q))
    val rank = math.max(1L, math.ceil(qq * n).toLong)
    var cum = 0L
    // negatives: larger bucket index = larger magnitude = smaller value
    val negs = st.neg.toArray.sortBy(-_._1)
    var i = 0
    while (i < negs.length) {
      cum += negs(i)._2
      if (cum >= rank) return -mid(negs(i)._1.toInt)
      i += 1
    }
    cum += st.zero
    if (cum >= rank) return 0.0
    val poss = st.pos.toArray.sortBy(_._1)
    i = 0
    while (i < poss.length) {
      cum += poss(i)._2
      if (cum >= rank) return mid(poss(i)._1.toInt)
      i += 1
    }
    mid(poss.last._1.toInt) // unreachable (rank <= n)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      SketchFn,
      exprs => DdSketchAgg(exprs(0)).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MergeFn,
      exprs => DdMergeAgg(exprs(0)).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      QuantileFn, exprs => DdQuantile(exprs(0), exprs(1)), "built-in")
  }
}

/** Build a DDSketch histogram over a double column. */
case class DdSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DdSketch.State] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double column, got ${child.dataType.sql}")

  override def prettyName: String = DdSketch.SketchFn
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): DdSketch.State = DdSketch.emptyState

  override def update(st: DdSketch.State, input: InternalRow): DdSketch.State = {
    val v = child.eval(input)
    if (v != null) DdSketch.add(st, v.asInstanceOf[Double])
    st
  }

  override def merge(a: DdSketch.State, b: DdSketch.State): DdSketch.State =
    DdSketch.mergeInto(a, b)

  override def eval(st: DdSketch.State): Any = DdSketch.serialize(st)
  override def serialize(st: DdSketch.State): Array[Byte] = DdSketch.serialize(st)
  override def deserialize(bytes: Array[Byte]): DdSketch.State =
    DdSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): DdSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DdSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DdSketchAgg =
    copy(child = newChildren.head)
}

/** Merge pre-built DDSketch blobs (bucket-wise count addition). */
case class DdMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DdSketch.State] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${child.dataType.sql}")

  override def prettyName: String = DdSketch.MergeFn
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): DdSketch.State = DdSketch.emptyState

  override def update(st: DdSketch.State, input: InternalRow): DdSketch.State = {
    val v = child.eval(input)
    if (v == null) st
    else DdSketch.mergeInto(st,
      DdSketch.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: DdSketch.State, b: DdSketch.State): DdSketch.State =
    DdSketch.mergeInto(a, b)

  override def eval(st: DdSketch.State): Any = DdSketch.serialize(st)
  override def serialize(st: DdSketch.State): Array[Byte] = DdSketch.serialize(st)
  override def deserialize(bytes: Array[Byte]): DdSketch.State =
    DdSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): DdMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DdMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DdMergeAgg =
    copy(child = newChildren.head)
}

/** Scalar quantile estimate from a sketch blob. NULL on an empty
  * sketch (a quantile of nothing, unlike a count of nothing, has no
  * zero). Runs on sketch-cardinality frames — interpreted eval is fine.
  */
case class DdQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${DdSketch.QuantileFn} requires (binary sketch, double q), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def prettyName: String = DdSketch.QuantileFn
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(sk: Any, q: Any): Any = {
    val v = DdSketch.quantile(
      sk.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])
    if (java.lang.Double.isNaN(v)) null else v
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DdQuantile =
    copy(left = newLeft, right = newRight)
}
