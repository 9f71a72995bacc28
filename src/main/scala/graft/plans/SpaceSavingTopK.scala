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
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  type Buf = mutable.HashMap[String, (Long, Long)] // term -> (cnt, err)

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_sketch requires a string column, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(SpaceSavingTopK.entryType)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buf = mutable.HashMap.empty

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val term = v.toString
    buf.get(term) match {
      case Some((c, e)) => buf.update(term, (c + 1, e))
      case None if buf.size < capacity => buf.update(term, (1L, 0L))
      case None =>
        // evict the minimum-count entry; inherit its count as error
        val (mt, (mc, _)) = buf.minBy { case (t, (c, _)) => (c, t) }
        buf.remove(mt)
        buf.update(term, (mc + 1, mc))
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (t, (c, e)) =>
      a.get(t) match {
        case Some((c0, e0)) => a.update(t, (c0 + c, e0 + e))
        case None => a.update(t, (c, e))
      }
    }
    if (a.size > capacity) {
      // truncate back to capacity, keeping the largest estimates
      val keep = a.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(capacity)
      a.clear()
      keep.foreach { case (t, ce) => a.update(t, ce) }
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val top = buf.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(k)
    new GenericArrayData(top.map { case (t, (c, e)) =>
      InternalRow(UTF8String.fromString(t), c, e)
    }.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, (c, e)) =>
      val bytes = t.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf: Buf = mutable.HashMap.empty
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val tb = new Array[Byte](len); in.readFully(tb)
      buf.update(new String(tb, "UTF-8"), (in.readLong(), in.readLong()))
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
