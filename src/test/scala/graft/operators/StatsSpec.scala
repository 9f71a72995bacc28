package graft.operators

import graft.SharedSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the Stats suite beyond the DuckDB hash gate:
  * mathematical properties that must hold at any scale, plus a naive
  * cross-check of the bucketed range join (the oracle checks values;
  * this checks the bucketing rewrite against the definition).
  */
class StatsSpec extends AnyFunSuite {
  import SharedSpark._

  test("percentile_group: percentiles are ordered and are actual group values") {
    val out = Stats.percentileGroup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p90 && p90 <= p99, s"unordered percentiles in $r")
    }
    // p50 of each group is a genuine member value of that group
    val prices = Tables.orders(spark, sf)
      .select(lower(trim(col("o_orderpriority"))).as("prio"),
        col("o_totalprice").cast("decimal(14,4)").cast("double").as("p"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSet)
    out.foreach(r => assert(prices(r.getString(0)).contains(r.getDouble(1))))
  }

  test("histogram_bins: counts sum to the table count, bounds respected") {
    val out = Stats.histogramBins(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    assert(out.map(_.getLong(2)).sum === total)
    out.foreach { r =>
      assert(r.getDouble(1) === r.getLong(0) * 25000.0)
    }
  }

  test("gap_fill_ffill: complete spine, zero-count gaps, ffill non-null after first day") {
    val out = Stats.gapFillFfill(spark, sf)
    val ev = Tables.events(spark, sf)
    val nTypes = ev.select("event_type").distinct().count()
    val days = ev.agg(datediff(to_date(max(col("ts"))), to_date(min(col("ts"))))).head.getInt(0) + 1
    assert(out.count() === nTypes * days)
    assert(out.filter(col("gap") && col("n_events") =!= 0).count() === 0)
    // once a type has data, every later spine day carries a filled value
    val rows = out.collect().groupBy(_.getString(0))
    rows.values.foreach { rs =>
      val afterFirst = rs.sortBy(_.getDate(1).toString).dropWhile(_.getBoolean(4))
      assert(afterFirst.forall(!_.isNullAt(3)))
    }
  }

  test("range_join_bucketed equals the naive theta-join definition") {
    val fast = Stats.rangeJoinBucketed(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("t"),
        col("event_type"))
    val naive = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("iv_id"), col("t").as("s"))
      .crossJoin(ev.select(col("t")))
      .filter(col("t") >= col("s") && col("t") < col("s") + 3600000000L)
      .groupBy("iv_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast.nonEmpty)
    fast.foreach(r => assert(naive(r.getLong(0)) === r.getLong(1)))
    assert(fast.length === naive.size)
  }

  test("mode_per_group: one row per group, count equals the true max") {
    val out = Stats.modePerGroup(spark, sf).collect()
    val counts = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(lower(trim(col("c_mktsegment"))).as("seg"),
        lower(trim(col("o_orderpriority"))).as("prio"))
      .count().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).max)
    assert(out.map(_.getString(0)).distinct.length === out.length)
    out.foreach(r => assert(r.getLong(2) === counts(r.getString(0))))
  }

  test("anomaly_zscore: z sums to ~0 per type, flag matches |z| >= 2") {
    val out = Stats.anomalyZscore(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).values.foreach { rs =>
      assert(math.abs(rs.map(_.getDouble(3)).sum) < 1e-9 * rs.length)
    }
    out.foreach(r => assert(r.getBoolean(4) === (math.abs(r.getDouble(3)) >= 2.0)))
  }

  test("approx_quantile tracks the exact percentiles within GK accuracy") {
    val exact = Stats.percentileGroup(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val approx = Stats.approxQuantile(spark, sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val qs = r.getSeq[Double](1)
      val (p50, p90, p99) = exact(r.getString(0))
      // accuracy 10000 => rank error <= n/10000; sf0.001 groups are a few
      // hundred rows, so the sketch must be exact-to-near-exact here
      assert(math.abs(qs(0) - p50) / p50 < 0.05, s"p50 off in $r")
      assert(math.abs(qs(1) - p90) / p90 < 0.05, s"p90 off in $r")
      assert(math.abs(qs(2) - p99) / p99 < 0.05, s"p99 off in $r")
    }
  }

  test("tfidf_top_terms: ranks 1..3 per doc, score is exactly tf/df") {
    val out = Stats.tfidfTopTerms(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getInt(5)).sorted.sameElements(1 to rs.length))
    }
    out.foreach { r =>
      assert(r.getDouble(4) === r.getLong(2).toDouble / r.getLong(3).toDouble)
    }
  }
}
