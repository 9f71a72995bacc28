package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Whole-operator as-of join (left outer, most-recent-`<=`) as a custom
  * Catalyst operator: logical node + planner strategy + physical merge
  * exec, the (c)-tier extension route of the design brief.
  *
  * Why a custom exec when [[graft.operators.Temporal.asofJoin]] already
  * composes the same answer from a tagged union + `last(ignoreNulls)`
  * window (re-expressing the reference's latest-calendar-row lookup,
  * /root/reference/spark_pipeline/insert_to_postgres.py:150-166)?
  * The compositional form pays for generality three times: the union
  * materializes BOTH relations into one shuffle, every probe-side row
  * carries null-padded build-side columns through the sort, and the
  * window machinery buffers frames it never revisits. This operator
  * keeps the sides apart — each shuffles only itself, clustered on its
  * own key and sorted (key, time) — then a single forward merge pass
  * per partition matches each left row to the latest right row at or
  * before it. O(|L| + |R|) per partition, zero buffering beyond one
  * candidate row, and both children's exchanges are the narrowest
  * possible. At 100 TB that is the difference between shuffling
  * |L| + |R| wide tagged rows and shuffling each side's own columns.
  *
  * Match semantics (identical to the compositional twin and the DuckDB
  * `ASOF LEFT JOIN` oracle): rows join when keys are equal and
  * `right.time <= left.time`, taking the right row with the greatest
  * such time; unmatched left rows emit nulls. SQL equality — a null
  * key or time never matches, but null-keyed LEFT rows are still
  * emitted (outer side).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long] = None,
    forward: Boolean = false)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]; injected per-session
  * (idempotently) by [[AsOfJoinPlan.asof]] and cluster-wide by
  * [[graft.GraftExtensions]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinNode =>
      AsOfJoinExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.toleranceUs, j.forward,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join. Requirements do the heavy lifting: both
  * children arrive hash-clustered on their join key (EnsureRequirements
  * co-partitions the two ClusteredDistributions exactly as it does for
  * a shuffled equi-join) and sorted by (key, time), so the operator
  * itself is a single streaming pass — no row buffering, no state
  * beyond the last same-key right row seen.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // direction = the TIME sort order both sides arrive in: ascending for
  // backward (latest <=), descending for forward (earliest >=) — the
  // merge pass below is direction-agnostic given the flipped comparison
  private def timeDir = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, timeDir),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, timeDir))

  /** One output row per left row, in the left child's order/partitions. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val tol = toleranceUs
    val fwd = forward
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      val rBuf = rIt.buffered
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // Copies of the most recent right row whose key could still match:
      // only same-key consumes copy; stale-key rows are drained in place.
      var matchKey: UnsafeRow = null
      var matchRow: InternalRow = null
      var matchTime = 0L // valid only when tol is set (LongType enforced)
      lIt.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTim = lTimeProj(lRow)
        if (!lKey.anyNull && !lTim.anyNull) {
          var done = false
          while (!done && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            // null right keys sort first and can never match: drain them
            val c = if (rKey.anyNull) -1 else keyOrd.compare(rKey, lKey)
            if (c > 0) {
              done = true
            } else if (c < 0) {
              rBuf.next() // stale key: no future left row can match it
            } else {
              val rTim = rTimeProj(rBuf.head)
              // in forward mode both sides scan time-DESCENDING and the
              // candidate rule flips: advance while rTim >= lTim, the
              // last copy = earliest right row at-or-after lTim
              val cmp = timeOrd.compare(rTim, lTim)
              if (rTim.anyNull) {
                rBuf.next() // null time never matches
              } else if (if (fwd) cmp >= 0 else cmp <= 0) {
                matchKey = rKey.copy()
                if (tol.isDefined) matchTime = rTim.getLong(0)
                matchRow = rBuf.next().copy()
              } else {
                done = true // first same-key row beyond lTime: stop
              }
            }
          }
        }
        val hit = matchRow != null && !lKey.anyNull && !lTim.anyNull &&
          keyOrd.compare(matchKey, lKey) == 0 &&
          tol.forall { t =>
            val gap = if (fwd) matchTime - lTim.getLong(0)
                      else lTim.getLong(0) - matchTime
            gap <= t
          }
        joined(lRow, if (hit) matchRow else nullRight)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {

  /** Idempotent per-session strategy registration (the public
    * `experimental` hook, no extensions conf needed). Synchronized:
    * Verify/driver harnesses build queries from a thread pool and the
    * check-then-append would otherwise race to a double registration.
    */
  def ensureStrategy(s: SparkSession): Unit = synchronized {
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsOfJoinStrategy
    }
  }

  /** As-of join `left` to `right` (left outer): for each left row, the
    * right row with the same key and — backward (default) — the
    * greatest `rightTime <= leftTime`, or — `forward = true` — the
    * smallest `rightTime >= leftTime`. `toleranceUs` bounds the match's
    * time gap (pandas merge_asof tolerance; requires LongType time
    * columns); a latest/earliest candidate beyond it yields no match.
    * Column-name API; both frames keep all their columns.
    */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           toleranceUs: Option[Long] = None,
           forward: Boolean = false): DataFrame = {
    val s = left.sparkSession
    ensureStrategy(s)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${p.output.map(_.name).mkString(", ")}"))
    val lt = attr(lPlan, leftTime)
    val rt = attr(rPlan, rightTime)
    if (toleranceUs.isDefined) {
      require(lt.dataType == org.apache.spark.sql.types.LongType &&
        rt.dataType == org.apache.spark.sql.types.LongType,
        "toleranceUs requires LongType (epoch micros) time columns")
      require(toleranceUs.get >= 0, "tolerance must be non-negative")
    }
    PlanBridge.ofRows(s, AsOfJoinNode(lPlan, rPlan,
      Seq(attr(lPlan, leftKey)), Seq(attr(rPlan, rightKey)),
      lt, rt, toleranceUs, forward))
  }
}
