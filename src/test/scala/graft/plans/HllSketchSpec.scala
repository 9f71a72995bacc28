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

  test("hll_intersect_users: inclusion-exclusion overlap tracks exact intersections") {
    val out = Analytics.hllIntersectUsers(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(expr("datediff(to_date(ts), DATE '1970-01-01') div 7").as("week"),
        col("event_type"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    out.foreach { r =>
      val w = r.getLong(0)
      val viewers = ev.filter(e => e._1 == w && e._2 == "view").map(_._3).toSet
      val buyers = ev.filter(e => e._1 == w && e._2 == "purchase").map(_._3).toSet
      val exact = (viewers & buyers).size
      // p=12 inclusion-exclusion compounds three estimates' error;
      // generous 5x-sigma style bound against the union size
      val union = (viewers | buyers).size.toDouble
      assert(math.abs(r.getLong(3) - exact) <= math.max(3.0, 0.10 * union),
        s"week $w: overlap_est ${r.getLong(3)} vs exact $exact")
    }
  }

  test("hll_union is idempotent, commutative, and equals the direct union sketch") {
    import spark.implicits._
    val df = (0 until 300).map(i => (s"u$i", i % 2)).toDF("v", "half")
    val halves = df.groupBy("half")
      .agg(expr("graft_hll_sketch(v, 10)").as("sk"))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    val direct = df.agg(expr("graft_hll_sketch(v, 10)").as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val unioned = Seq((halves(0), halves(1))).toDF("a", "b")
      .select(expr("graft_hll_union(a, b)").as("u"),
        expr("graft_hll_union(b, a)").as("u2"),
        expr("graft_hll_union(a, a)").as("self"))
      .collect()(0)
    assert(java.util.Arrays.equals(unioned.getAs[Array[Byte]](0), direct))
    assert(java.util.Arrays.equals(unioned.getAs[Array[Byte]](1), direct))
    assert(java.util.Arrays.equals(unioned.getAs[Array[Byte]](2), halves(0)))
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

  test("rolling_actives_sketch tracks the exact 7-day rolling distinct within HLL error") {
    import graft.operators.Stats
    val approx = Stats.rollingActivesSketch(spark, sf).collect()
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    val exact = Stats.rollingActiveUsers(spark, sf).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    assert(approx.nonEmpty)
    approx.foreach { case (d, est) =>
      val t = exact(d)
      assert(math.abs(est - t) <= math.max(3.0, 0.05 * t),
        s"day $d: est=$est exact=$t drifts past the HLL bound")
    }
  }
}
