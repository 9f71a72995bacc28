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

  test("range_join_topk equals the naive definition (incl. cell-crossing windows)") {
    val W = 3600000000L
    val out = Stats.rangeJoinTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("t"),
        col("event_type"), col("value").cast("decimal(14,4)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        BigDecimal(r.getDecimal(3))))
    // the dup path must actually be exercised: some window crosses a cell
    val cellUs = W * 8
    assert(ev.exists(e => e._3 == "error" &&
      e._2 / cellUs != (e._2 + W - 1) / cellUs))
    val expected = ev.filter(_._3 == "error").flatMap { case (ivId, s, _, _) =>
      ev.filter(p => p._2 >= s && p._2 < s + W)
        .sortBy(p => (-p._4, p._2, p._1))
        .take(3).zipWithIndex
        .map { case (p, i) => (ivId, i + 1) -> p._1 }
    }.toMap
    assert(expected.nonEmpty)
    assert(out === expected)
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

  test("corr_exact: r in [-1,1] and matches a plain-Scala Pearson") {
    val rows = Stats.corrExact(spark, sf).collect()
    assert(rows.length === 3) // A/N/R return flags
    val raw = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"))
      .collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val v = r.getAs[Double]("r")
      assert(v >= -1.0 && v <= 1.0)
      assert(r.getAs[Long]("n") === raw(r.getAs[String]("flag")).length.toLong)
      val xs = raw(r.getAs[String]("flag"))
      val n = xs.length.toDouble
      val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
      val sxy = xs.map(p => p._1 * p._2).sum
      val sxx = xs.map(p => p._1 * p._1).sum
      val syy = xs.map(p => p._2 * p._2).sum
      val expected = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      // the reference sums doubles (ordering noise); exact-moment r must
      // sit within float-accumulation distance of it
      assert(math.abs(v - expected) < 1e-9, s"r=$v expected=$expected")
    }
  }

  test("window_rank_suite: quartiles balanced, pct_rank/cume bounded and monotone") {
    val rows = Stats.windowRankSuite(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("seg")).foreach { case (_, g) =>
      val byBal = g.sortBy(r => (-r.getAs[Double]("bal"), r.getAs[Long]("c_custkey")))
      // quartile sizes differ by at most 1; ranks are non-decreasing in order
      val sizes = byBal.groupBy(_.getAs[Int]("quartile")).values.map(_.size)
      assert(sizes.max - sizes.min <= 1)
      byBal.foreach { r =>
        val pr = r.getAs[Double]("pct_rank")
        val cd = r.getAs[Double]("cume")
        assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0 && cd >= pr)
      }
      assert(byBal.map(_.getAs[Int]("quartile")).toSeq === byBal.map(_.getAs[Int]("quartile")).toSeq.sorted)
    }
  }

  test("histogram_equidepth: bins balanced within 1, ranges ordered, mass conserved") {
    val rows = Stats.histogramEquidepth(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === Tables.orders(spark, sf).count())
    rows.groupBy(_.getAs[Int]("yr")).foreach { case (_, g) =>
      val ns = g.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1, s"unbalanced bins: ${ns.toSeq}")
      val sorted = g.sortBy(_.getAs[Int]("bin"))
      sorted.sliding(2).foreach {
        // ties may straddle a boundary, so hi(k) == lo(k+1) is legal
        case Array(a, b) =>
          assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
        case _ => ()
      }
    }
  }

  test("approx_quantile tracks the exact percentiles within GK accuracy") {
    val exact = Stats.percentileGroup(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val approx = Stats.approxQuantile(spark, sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val qs = Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val (p50, p90, p99) = exact(r.getString(0))
      // accuracy 10000 => rank error <= n/10000; sf0.001 groups are a few
      // hundred rows, so the sketch must be exact-to-near-exact here
      assert(math.abs(qs(0) - p50) / p50 < 0.05, s"p50 off in $r")
      assert(math.abs(qs(1) - p90) / p90 < 0.05, s"p90 off in $r")
      assert(math.abs(qs(2) - p99) / p99 < 0.05, s"p99 off in $r")
    }
  }

  test("rolling_active_users equals brute-force trailing-7d distinct") {
    val pairs = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val maxDay = pairs.map(_._2).maxBy(_.toEpochDay)
    val out = Stats.rollingActiveUsers(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { case (wday, n) =>
      val expect = pairs.collect {
        case (u, d) if !d.isAfter(wday) && !d.isBefore(wday.minusDays(6)) => u
      }.distinct.length.toLong
      assert(n === expect, s"window $wday")
    }
    assert(!out.keySet.exists(_.isAfter(maxDay)))
  }

  test("mad_per_group: med and mad are genuine selected values, robust identity") {
    val t = Tables.orders(spark, sf)
      .select(lower(trim(col("o_orderpriority"))).as("prio"),
        col("o_totalprice").cast("decimal(14,4)").cast("double").as("p"))
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1))).toMap
    val out = Stats.madPerGroup(spark, sf).collect()
    assert(out.map(_.getString(0)).toSet === t.keySet)
    out.foreach { r =>
      val (prio, med, mad, n) =
        (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3))
      val xs = t(prio)
      assert(n === xs.length)
      assert(xs.contains(med), "median is a group member")
      assert(mad >= 0 && xs.map(x => math.abs(x - med)).contains(mad),
        "mad is an actual deviation value")
      // lower-median: at least half the group lies within mad of med
      assert(xs.count(x => math.abs(x - med) <= mad) >= (xs.length + 1) / 2)
    }
  }

  test("window_value_suite: frame edges are the partition extremes") {
    val out = Stats.windowValueSuite(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).values.foreach { rs =>
      val bals = rs.map(_.getDouble(2))
      rs.foreach { r =>
        assert(r.getDouble(5) === bals.max, "top_bal is the partition max")
        assert(r.getDouble(6) === bals.min, "bottom_bal is the partition min")
      }
      // exactly one row per partition has no predecessor/successor
      // (lag/lead default -1 marks the partition edges)
      assert(rs.count(_.getDouble(3) === -1.0) === 1)
      assert(rs.count(_.getDouble(4) === -1.0) === 1)
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

  test("cumulative_users: complete monotone curve saturating at total distinct users") {
    val out = Stats.cumulativeUsers(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    val totalUsers = ev.select("user_id").distinct().count()
    val days = ev.agg(datediff(to_date(max(col("ts"))),
      to_date(min(col("ts"))))).head.getInt(0) + 1
    assert(out.length === days, "spine incomplete")
    assert(out.map(_.getLong(1)).sum === totalUsers)
    assert(out.last.getLong(2) === totalUsers)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(2) === a.getLong(2) + b.getLong(1), "curve not cumulative")
      case _ => ()
    }
  }

  test("dau_wau_stickiness: dau <= wau, ratio in (0, 1], wau matches rolling actives") {
    val out = Stats.dauWauStickiness(spark, sf).collect()
    assert(out.nonEmpty)
    val wau = Stats.rollingActiveUsers(spark, sf).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    out.foreach { r =>
      val (d, dau, w, st) = (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getDouble(3))
      assert(dau <= w, s"DAU exceeds WAU in $r")
      assert(st > 0.0 && st <= 1.0)
      assert(st === dau.toDouble / w.toDouble)
      assert(wau(d) === w)
    }
  }

  test("regression_slope matches Spark's built-in OLS within FP tolerance") {
    val out = Stats.regressionSlope(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0,
      s"r2 out of [0,1] in $r"))
    // the engine's regr_slope/regr_intercept accumulate doubles (not
    // hash-portable, but a fine numerical cross-check of the formula)
    val ref = Tables.orders(spark, sf)
      .select(lower(trim(col("o_orderpriority"))).as("prio"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("double").as("x"),
        col("o_totalprice").cast("decimal(14,4)").cast("double").as("y"))
      .groupBy("prio")
      .agg(regr_slope(col("y"), col("x")).as("slope"),
        regr_intercept(col("y"), col("x")).as("b0"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    out.foreach { r =>
      val (s0, b0) = ref(r.getString(0))
      assert(math.abs(r.getDouble(2) - s0) <= 1e-6 * math.max(1.0, math.abs(s0)))
      assert(math.abs(r.getDouble(3) - b0) <= 1e-6 * math.max(1.0, math.abs(b0)))
    }
  }

  test("winsorize_clip equals a plain-Scala winsorization per group") {
    val out = Stats.winsorizeClip(spark, sf).collect()
    val groups = Tables.orders(spark, sf)
      .select(lower(trim(col("o_orderpriority"))).as("prio"),
        col("o_totalprice").cast("decimal(14,4)").as("p"))
      .collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDecimal(1)).sortBy(_.doubleValue)).toMap
    out.foreach { r =>
      val vs = groups(r.getString(0))
      val n = vs.length
      val p05 = vs((5 * n + 99) / 100 - 1)
      val p95 = vs((95 * n + 99) / 100 - 1)
      assert(r.getLong(1) === n.toLong)
      assert(r.getDouble(5) === p05.doubleValue && r.getDouble(6) === p95.doubleValue)
      assert(r.getLong(2) === vs.count(_.compareTo(p05) < 0).toLong)
      assert(r.getLong(3) === vs.count(_.compareTo(p95) > 0).toLong)
      val wsum = vs.map(v => if (v.compareTo(p05) < 0) p05
        else if (v.compareTo(p95) > 0) p95 else v)
        .reduce(_.add(_))
      assert(r.getDouble(4) === wsum.doubleValue)
    }
  }
}
