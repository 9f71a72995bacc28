package graft.plans

import graft.SharedSpark
import graft.operators.Stats
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The guarantees that make the DDSketch quantile tier trustworthy:
  * bucket-addition mergeability is EXACT (merged partials bit-identical
  * to one direct sketch, independent of partitioning), and every
  * quantile estimate is within Alpha RELATIVE error of the true order
  * statistic's value — checked against exact percentile_disc here.
  */
class DdSketchSpec extends AnyFunSuite {
  import SharedSpark._

  test("merged daily sketches are bit-identical to the direct weekly sketch") {
    val o = Tables.orders(spark, sf)
      .select(col("o_totalprice").as("x"),
        to_date(col("o_orderdate")).as("day"),
        expr("datediff(to_date(o_orderdate), DATE '1970-01-01') div 7")
          .as("week"))
    val viaDaily = o.groupBy("week", "day")
      .agg(expr("graft_dds_sketch(x)").as("sk"))
      .groupBy("week").agg(expr("graft_dds_merge(sk)").as("sk"))
    val direct = o.groupBy("week")
      .agg(expr("graft_dds_sketch(x)").as("sk"))
    val joined = viaDaily.as("a")
      .join(direct.as("b"), col("a.week") === col("b.week"))
      .select(col("a.sk"), col("b.sk")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1)))
    }
  }

  test("quantile estimates are within the relative-error guarantee of exact order statistics") {
    val rows = Stats.quantileSketchRollup(spark, sf).collect()
    assert(rows.nonEmpty)
    // exact percentile_disc per week: value at row ceil(q*n) sorted asc
    val exact = Tables.orders(spark, sf)
      .groupBy(expr("datediff(to_date(o_orderdate), DATE '1970-01-01') div 7")
        .as("week"))
      .agg(sort_array(collect_list(col("o_totalprice"))).as("xs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def disc(xs: Seq[Double], q: Double): Double =
      xs(math.max(1, math.ceil(q * xs.length).toInt) - 1)
    rows.foreach { r =>
      val xs = exact(r.getLong(0))
      Seq(0.5 -> r.getDouble(2), 0.95 -> r.getDouble(3),
        0.99 -> r.getDouble(4)).foreach { case (q, est) =>
        val truth = disc(xs, q)
        assert(math.abs(est - truth) <= DdSketch.Alpha * math.abs(truth),
          s"p$q off by more than alpha: est=$est exact=$truth " +
            s"week=${r.getLong(0)} n=${xs.length}")
      }
    }
  }

  test("sketch blobs are invariant under repartitioning") {
    val base = Tables.orders(spark, sf)
    val a = base.agg(expr("graft_dds_sketch(o_totalprice)"))
      .collect()(0).getAs[Array[Byte]](0)
    val b = base.repartition(7, col("o_orderkey"))
      .agg(expr("graft_dds_sketch(o_totalprice)"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("signed and zero values route to the right stores; nulls/NaN are ignored") {
    import spark.implicits._
    val df = Seq[java.lang.Double](-100.0, -1.0, 0.0, 0.0, 1.0, 100.0,
      null, Double.NaN).toDF("x")
    val sk = df.agg(expr("graft_dds_sketch(x)")).collect()(0)
      .getAs[Array[Byte]](0)
    val st = DdSketch.deserialize(sk)
    assert(st.zero === 2L)
    assert(st.pos.values.sum === 2L && st.neg.values.sum === 2L)
    // median of {-100,-1,0,0,1,100} = 0 exactly (the zero store)
    val q = df.agg(expr("graft_dds_sketch(x)").as("sk"))
      .select(expr("graft_dds_quantile(sk, 0.5D)"),
        expr("graft_dds_quantile(sk, 0.01D)"),
        expr("graft_dds_quantile(sk, 1.0D)")).collect()(0)
    assert(q.getDouble(0) === 0.0)
    assert(math.abs(q.getDouble(1) + 100.0) <= 1.0) // most-negative bucket
    assert(math.abs(q.getDouble(2) - 100.0) <= 1.0)
  }

  test("empty sketch quantile is NULL; empty input merges harmlessly") {
    import spark.implicits._
    val empty = Seq.empty[Double].toDF("x")
      .agg(expr("graft_dds_sketch(x)").as("sk"))
    val q = empty.select(expr("graft_dds_quantile(sk, 0.5D)")).collect()(0)
    assert(q.isNullAt(0))
    val merged = empty.union(empty).agg(expr("graft_dds_merge(sk)").as("m"))
      .select(expr("graft_dds_quantile(m, 0.5D)")).collect()(0)
    assert(merged.isNullAt(0))
  }

  test("blobs round-trip through a parquet store and roll up from disk") {
    val dir = java.nio.file.Files.createTempDirectory("dds_store").toString
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(expr("graft_dds_sketch(o_totalprice)").as("sk"))
    daily.write.mode("overwrite").parquet(s"$dir/daily")
    val fromStore = spark.read.parquet(s"$dir/daily")
      .agg(expr("graft_dds_merge(sk)")).collect()(0).getAs[Array[Byte]](0)
    val direct = Tables.orders(spark, sf)
      .agg(expr("graft_dds_sketch(o_totalprice)"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(fromStore, direct))
  }
}
