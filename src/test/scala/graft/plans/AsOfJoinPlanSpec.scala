package graft.plans

import graft.SharedSpark
import graft.operators.Temporal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The custom AsOfJoinNode/Strategy/Exec route must (a) actually plan as
  * AsOfJoinExec, (b) agree row-for-row with the compositional
  * tagged-union window twin on the real tables, and (c) agree with a
  * plain-Scala reference on generated inputs covering unmatched keys,
  * time ties, duplicate left timestamps, empty sides, and null keys.
  */
class AsOfJoinPlanSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("asof_join_native plans through AsOfJoinExec") {
    val df = Temporal.asofJoinNative(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
  }

  test("native exec equals the compositional window twin on sf0.001") {
    val a = Temporal.asofJoin(spark, sf).collect()
    val b = Temporal.asofJoinNative(spark, sf).collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  test("native exec equals a plain-Scala as-of on generated inputs") {
    val leftGen = for {
      k <- Gen.choose(0L, 6L)
      t <- Gen.choose(0L, 30L)
    } yield (k, t)
    val rightGen = for {
      k <- Gen.choose(0L, 4L) // keys 5,6 exist only on the left: unmatched
      t <- Gen.choose(0L, 30L)
    } yield (k, t)

    val lefts = sample(leftGen, 400).zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, t) }
    val rights = sample(rightGen, 120).distinct // unique (k,t): defined match
      .map { case (k, t) => (k, t, k * 1000 + t) }

    val lDf = lefts.toDF("lid", "k", "t")
    val rDf = rights.toDF("rk", "rt", "payload")
    val got = AsOfJoinPlan.asof(lDf, rDf, "k", "rk", "t", "rt")
      .select("lid", "rt", "payload").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

    val expected = lefts.map { case (lid, k, t) =>
      val m = rights.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption
      (lid, m.map(_._2), m.map(_._3))
    }.toSet
    assert(got === expected)
  }

  test("tolerance and forward modes equal plain-Scala on generated inputs") {
    val leftGen = for {
      k <- Gen.choose(0L, 6L)
      t <- Gen.choose(0L, 30L)
    } yield (k, t)
    val rightGen = for {
      k <- Gen.choose(0L, 4L)
      t <- Gen.choose(0L, 30L)
    } yield (k, t)
    val lefts = sample(leftGen, 300).zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, t) }
    val rights = sample(rightGen, 100).distinct
      .map { case (k, t) => (k, t, k * 1000 + t) }
    val lDf = lefts.toDF("lid", "k", "t")
    val rDf = rights.toDF("rk", "rt", "payload")

    def run(tol: Option[Long], fwd: Boolean) =
      AsOfJoinPlan.asof(lDf, rDf, "k", "rk", "t", "rt", tol, fwd)
        .select("lid", "payload").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    for (tol <- Seq(Some(0L), Some(3L), Some(100L)); fwd <- Seq(false, true)) {
      val got = run(tol, fwd)
      lefts.foreach { case (lid, k, t) =>
        val cands = rights.filter(r => r._1 == k &&
          (if (fwd) r._2 >= t else r._2 <= t) &&
          tol.forall(x => (if (fwd) r._2 - t else t - r._2) <= x))
        val expect =
          if (fwd) cands.sortBy(_._2).headOption.map(_._3)
          else cands.sortBy(_._2).lastOption.map(_._3)
        assert(got(lid) === expect, s"lid=$lid tol=$tol fwd=$fwd")
      }
    }
  }

  test("null left keys stay emitted but unmatched; empty right side is safe") {
    val lDf = Seq((1L, Option(5L), 10L), (2L, Option.empty[Long], 10L))
      .toDF("lid", "k", "t")
    val rDf = Seq((5L, 1L, 42L)).toDF("rk", "rt", "payload")
    val out = AsOfJoinPlan.asof(lDf, rDf, "k", "rk", "t", "rt")
      .orderBy("lid").select("lid", "payload").collect()
    assert(out === Array(Row(1L, 42L), Row(2L, null)))

    val empty = AsOfJoinPlan.asof(lDf, rDf.filter(lit(false)),
      "k", "rk", "t", "rt").select("lid", "payload").collect()
    assert(empty.map(_.getLong(0)).sorted === Array(1L, 2L))
    assert(empty.forall(_.isNullAt(1)))
  }
}
