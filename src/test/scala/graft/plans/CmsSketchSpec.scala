package graft.plans

import graft.SharedSpark
import graft.operators.Analytics
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The guarantees that make the CMS tier trustworthy: counter-addition
  * mergeability is EXACT (merged partials bit-identical to one direct
  * sketch), the estimate is one-sided (never undercounts), and on a
  * low-cardinality key domain (5 event types vs 4x512 counters) it is
  * exact — so the weekly rollup can be pinned to true counts.
  */
class CmsSketchSpec extends AnyFunSuite {
  import SharedSpark._

  test("merged daily sketches are bit-identical to the direct weekly sketch") {
    val e = Tables.events(spark, sf)
      .select(col("event_type").as("k"), to_date(col("ts")).as("day"),
        expr("datediff(to_date(ts), DATE '1970-01-01') div 7").as("week"))
    val viaDaily = e.groupBy("week", "day")
      .agg(expr("graft_cms_sketch(k)").as("sk"))
      .groupBy("week").agg(expr("graft_cms_merge(sk)").as("sk"))
    val direct = e.groupBy("week")
      .agg(expr("graft_cms_sketch(k)").as("sk"))
    val joined = viaDaily.as("a")
      .join(direct.as("b"), col("a.week") === col("b.week"))
      .select(col("a.sk").as("ska"), col("b.sk").as("skb")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1)))
    }
  }

  test("weekly rollup estimates equal exact counts on the 5-type domain") {
    val exact = Tables.events(spark, sf)
      .groupBy(expr("datediff(to_date(ts), DATE '1970-01-01') div 7")
        .as("week"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val approx = Analytics.cmsCountRollup(spark, sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val truth = exact((r.getLong(0), r.getString(2)))
      val est = r.getLong(3)
      assert(est >= truth, s"CMS undercounted: $r vs $truth")
      // 5 keys in 4x512 counters: a collision in ALL 4 rows is the only
      // way to overcount — assert exactness on this domain
      assert(est === truth, s"unexpected collision overcount: $r vs $truth")
    }
  }

  test("sketch store: blobs round-trip through parquet and roll up from disk") {
    // the architecture the mergeable tiers exist for: persist per-day
    // blobs ONCE, answer any later rollup from the store — proven
    // end-to-end through a real parquet write/read
    val dir = java.nio.file.Files.createTempDirectory("sketch_store").toString
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("graft_cms_sketch(event_type)").as("cms"),
        expr("graft_hll_sketch(CAST(user_id AS STRING), 12)").as("hll"))
    daily.write.mode("overwrite").parquet(s"$dir/daily_sketches")

    val store = spark.read.parquet(s"$dir/daily_sketches")
    val fromStore = store
      .groupBy(expr("datediff(day, DATE '1970-01-01') div 7").as("week"))
      .agg(expr("graft_cms_merge(cms)").as("cms"),
        expr("graft_hll_merge(hll)").as("hll"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2))).toMap
    val direct = Tables.events(spark, sf)
      .groupBy(expr("datediff(to_date(ts), DATE '1970-01-01') div 7").as("week"))
      .agg(expr("graft_cms_sketch(event_type)").as("cms"),
        expr("graft_hll_sketch(CAST(user_id AS STRING), 12)").as("hll"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2))).toMap
    assert(fromStore.keySet === direct.keySet && fromStore.nonEmpty)
    fromStore.foreach { case (w, (cms, hll)) =>
      assert(java.util.Arrays.equals(cms, direct(w)._1),
        s"CMS blob drift through the store for week $w")
      assert(java.util.Arrays.equals(hll, direct(w)._2),
        s"HLL blob drift through the store for week $w")
    }
  }

  test("sketch estimates are invariant under repartitioning") {
    val a = Analytics.cmsCountRollup(spark, sf).collect().map(_.toSeq)
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try {
      val b = Analytics.cmsCountRollup(spark, sf).collect().map(_.toSeq)
      assert(a.toSeq === b.toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", "32")
  }

  test("estimate bound holds for a key absent from the stream") {
    import spark.implicits._
    val est = Seq("a", "b", "a").toDF("v")
      .agg(expr("graft_cms_est(graft_cms_sketch(v), 'zzz-not-present')"))
      .collect()(0).getLong(0)
    // absent key may only collide upward, and with 3 rows of mass in
    // 4x512 counters it must read 0 here
    assert(est === 0L)
    val present = Seq("a", "b", "a").toDF("v")
      .agg(expr("graft_cms_est(graft_cms_sketch(v), 'a')"))
      .collect()(0).getLong(0)
    assert(present === 2L)
  }

  test("join_size_estimate upper-bounds the exact join cardinality, within CMS error") {
    val r = Analytics.joinSizeEstimate(spark, sf).collect()(0)
    val (est, nA, nB) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val exact = Tables.orders(spark, sf).select(col("o_custkey").as("k"))
      .join(Tables.events(spark, sf).select(col("user_id").as("k")), Seq("k"))
      .count()
    assert(est >= exact, s"CMS dot undercounted: $est < $exact")
    // per-row expected collision mass is nA*nB/Width; min over Depth
    // rows — allow a loose 4x of the single-row expectation
    val slack = 4.0 * nA.toDouble * nB.toDouble / CmsSketch.Width
    assert(est - exact <= slack, s"est $est vs exact $exact (slack $slack)")
  }

  test("empty input estimates 0; nulls are ignored; geometry mismatch is a hard error") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("v")
      .agg(expr("graft_cms_est(graft_cms_sketch(v), 'x')"))
      .collect()(0).getLong(0)
    assert(empty === 0L)
    val withNulls = Seq(Some("x"), None, Some("x"), None).toDF("v")
      .agg(expr("graft_cms_est(graft_cms_sketch(v), 'x')"))
      .collect()(0).getLong(0)
    assert(withNulls === 2L)
    val cms = Seq("a").toDF("v").agg(expr("graft_cms_sketch(v)").as("sk"))
    val hll = Seq("a").toDF("v").agg(expr("graft_hll_sketch(v, 8)").as("sk"))
    assertThrows[Exception](
      cms.union(hll).agg(expr("graft_cms_merge(sk)")).collect())
  }
}
