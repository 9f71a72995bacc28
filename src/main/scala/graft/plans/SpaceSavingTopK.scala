package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving (Metwally et al., "Efficient Computation of Frequent and
  * Top-k Elements in Data Streams") heavy-hitters sketch as a Spark
  * `TypedImperativeAggregate`.
  *
  * Why: an exact `top_tokens` shuffles every distinct term. At 100 TB
  * the term dictionary itself is huge; this sketch keeps a BOUNDED
  * `capacity`-entry buffer per partition, merges buffers on the single
  * final reduce, and guarantees any term with frequency > N/capacity
  * survives, with per-term error <= the reported `err`. Partial
  * aggregation happens map-side exactly like built-in aggregates — this
  * is the same integration pattern Spark uses for HLL sketches.
  *
  * Output: array<struct<term, cnt, err>> of the top k by estimated
  * count (term as tie-break, so results are deterministic).
  *
  * Merges follow the mergeable-summaries rule (Agarwal et al.,
  * "Mergeable Summaries"): when a merge truncates the combined buffer
  * back to capacity, the largest dropped count becomes the buffer's
  * `floor` — any absent term may have occurred up to `floor` times, so
  * later insertions start from it as (floor+1, floor). Without this the
  * post-merge `err` underestimates and the "frequency > N/capacity
  * survives" guarantee silently breaks.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingTopK.Buf] {

  import SpaceSavingTopK.Buf

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_sketch requires a string column, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(SpaceSavingTopK.entryType)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val term = v.toString
    val m = buf.m
    m.get(term) match {
      case Some((c, e)) => m.update(term, (c + 1, e))
      case None if m.size < capacity =>
        // an absent term may have been dropped by an earlier merge
        // truncation: it starts from the floor, not from zero
        m.update(term, (buf.floor + 1, buf.floor))
      case None =>
        // evict the minimum-count entry; inherit its count (at least
        // the truncation floor) as error
        val (mt, (mc, _)) = m.minBy { case (t, (c, _)) => (c, t) }
        val base = math.max(mc, buf.floor)
        m.remove(mt)
        m.update(term, (base + 1, base))
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val m = a.m
    b.m.foreach { case (t, (c, e)) =>
      m.get(t) match {
        case Some((c0, e0)) => m.update(t, (c0 + c, e0 + e))
        case None => m.update(t, (c, e))
      }
    }
    a.floor = math.max(a.floor, b.floor)
    if (m.size > capacity) {
      // truncate back to capacity, keeping the largest estimates; the
      // largest DROPPED count becomes the floor (mergeable-summaries
      // rule) so the dropped mass stays accounted in later err values
      val sorted = m.toSeq.sortBy { case (t, (c, _)) => (-c, t) }
      val dropped = sorted.drop(capacity)
      a.floor = math.max(a.floor, dropped.map(_._2._1).max)
      m.clear()
      sorted.take(capacity).foreach { case (t, ce) => m.update(t, ce) }
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val top = buf.m.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(k)
    new GenericArrayData(top.map { case (t, (c, e)) =>
      InternalRow(UTF8String.fromString(t), c, e)
    }.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.floor)
    out.writeInt(buf.m.size)
    buf.m.foreach { case (t, (c, e)) =>
      val bytes = t.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Buf()
    buf.floor = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val tb = new Array[Byte](len); in.readFully(tb)
      buf.m.update(new String(tb, "UTF-8"), (in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
}

object SpaceSavingTopK {
  /** Sketch state: term -> (cnt, err) plus the merge-truncation floor
    * (the largest count ever dropped from this buffer — an upper bound
    * on any absent term's true frequency).
    */
  final class Buf(
      val m: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty,
      var floor: Long = 0L)

  val entryType: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false)))

  val FnName = "graft_topk_sketch"

  /** Register as `graft_topk_sketch(col, k, capacity)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName,
      exprs => SpaceSavingTopK(exprs(0),
        k = exprs(1).eval().asInstanceOf[Int],
        capacity = exprs(2).eval().asInstanceOf[Int]).toAggregateExpression(),
      "built-in")
}
