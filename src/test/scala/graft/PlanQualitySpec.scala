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
