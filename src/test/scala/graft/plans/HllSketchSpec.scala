package graft.plans

import graft.SharedSpark
import graft.operators.Analytics
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The guarantees that make the HLL tier trustworthy: mergeability is
  * EXACT (merged partial sketches are bit-identical to one direct
  * sketch — estimates can't drift with partitioning or rollup shape),
  * and the estimate tracks exact distinct within the p=12 error regime.
  */
class HllSketchSpec extends AnyFunSuite {
  import SharedSpark._

  test("merged daily sketches are bit-identical to the direct weekly sketch") {
    val e = Tables.events(spark, sf)
      .select(col("user_id").cast("string").as("u"),
        to_date(col("ts")).as("day"),
        expr("datediff(to_date(ts), DATE '1970-01-01') div 7").as("week"))
    val viaDaily = e.groupBy("week", "day")
      .agg(expr("graft_hll_sketch(u, 12)").as("sk"))
      .groupBy("week").agg(expr("graft_hll_merge(sk)").as("sk"))
    val direct = e.groupBy("week")
      .agg(expr("graft_hll_sketch(u, 12)").as("sk"))
    val joined = viaDaily.as("a")
      .join(direct.as("b"), col("a.week") === col("b.week"))
      .select(col("a.sk").as("ska"), col("b.sk").as("skb")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1)))
    }
  }

  test("estimate tracks exact distinct within the p=12 error regime") {
    val exact = Tables.events(spark, sf)
      .groupBy(expr("datediff(to_date(ts), DATE '1970-01-01') div 7")
        .as("week"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Analytics.approxDistinctSketchRollup(spark, sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (w, est) = (r.getLong(0), r.getLong(2))
      val truth = exact(w)
      // p=12 standard error is 1.04/sqrt(4096) ~ 1.6%; allow 5 sigma
      assert(math.abs(est - truth).toDouble / truth < 0.08,
        s"week $w: est $est vs exact $truth")
    }
  }

  test("sketch estimates are invariant under repartitioning") {
    val a = Analytics.approxDistinctSketchRollup(spark, sf)
      .collect().map(_.toSeq)
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try {
      val b = Analytics.approxDistinctSketchRollup(spark, sf)
        .collect().map(_.toSeq)
      assert(a.toSeq === b.toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", "32")
  }

  test("merging sketches of different precision is a hard error") {
    import spark.implicits._
    val df = Seq(("a", 1), ("b", 2)).toDF("v", "g")
    // precision must be foldable — non-literal p is rejected when the
    // plan is built (function resolution eval()s the p argument)
    assertThrows[Exception](df.groupBy("g")
      .agg(expr("graft_hll_sketch(v, CASE WHEN g = 1 THEN 8 ELSE 10 END)"))
      .collect())
    val s8 = df.agg(expr("graft_hll_sketch(v, 8)").as("sk"))
    val s10 = df.agg(expr("graft_hll_sketch(v, 10)").as("sk"))
    assertThrows[Exception](
      s8.union(s10).agg(expr("graft_hll_merge(sk)")).collect())
  }

  test("empty input yields estimate 0; nulls are ignored") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("v")
      .agg(expr("graft_hll_est(graft_hll_sketch(v, 12))"))
      .collect()(0).getLong(0)
    assert(empty === 0L)
    val withNulls = Seq(Some("x"), None, Some("y"), None)
      .toDF("v")
      .agg(expr("graft_hll_est(graft_hll_sketch(v, 12))"))
      .collect()(0).getLong(0)
    assert(withNulls === 2L)
  }
}
