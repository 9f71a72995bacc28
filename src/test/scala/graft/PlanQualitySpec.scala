package graft

import graft.operators.{Analytics, StarSchema}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the properties §6 promises (pushdown,
  * pruning, broadcast dims) must stay visible in the physical plan.
  */
class PlanQualitySpec extends AnyFunSuite {
  import SharedSpark._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.sparkPlan.toString

  test("q1: shipdate filter pushed into the parquet scan") {
    val p = plan(Analytics.q1(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("q1: scan pruned to referenced columns only") {
    val p = plan(Analytics.q1(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"unpruned scan: $readSchema")
  }

  test("q5: dimension joins broadcast") {
    val p = plan(Analytics.q5(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2000))
  }

  test("fact_star_join: dims broadcast, fact side never shuffles pre-join") {
    val p = plan(StarSchema.factStarJoin(spark, sf))
    // >= 2: the two dim joins, plus Keys.denseIds' tiny offset joins
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("skill extract: vocabulary join broadcast") {
    val p = plan(operators.SkillExtract.skillExtractPhrase(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("sampling reads ids and labels, never document bodies") {
    val p = plan(operators.Curation.sampleStratified(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("text"), s"unpruned scan: $readSchema")
  }

  test("range_join_bucketed: bucket equi-join, never a nested-loop product") {
    val p = plan(operators.Stats.rangeJoinBucketed(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("gap_fill_ffill: calendar spine broadcast against the daily agg") {
    val p = plan(operators.Stats.gapFillFfill(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("tfidf: documents scan pruned to id and text") {
    val p = plan(operators.Stats.tfidfTopTerms(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("source") && !readSchema.contains("lang"),
      s"unpruned scan: $readSchema")
  }

  test("asof_join_native: custom exec, no window machinery, no union") {
    val p = plan(operators.Temporal.asofJoinNative(spark, sf))
    assert(p.contains("AsOfJoin"), p.take(2000))
    assert(!p.contains("Window") && !p.contains("Union"), p.take(2000))
  }

  test("no unpartitioned (single-task) window in any registered query") {
    import org.apache.spark.sql.execution.window.WindowExec
    SparkEntry.queries.foreach { case (name, fn) =>
      val bad = fn(spark, sf).queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$name plans a global window — every row funnels through one task")
    }
  }
}
