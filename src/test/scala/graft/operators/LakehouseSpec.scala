package graft.operators

import graft.SharedSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lakehouse-suite invariants beyond the DuckDB hash gate: the CDC
  * merge is cross-checked against a plain-Scala changelog fold (the
  * semantic definition of MERGE), and the skipping index against the
  * layout properties that make data skipping work at all.
  */
class LakehouseSpec extends AnyFunSuite {
  import SharedSpark._

  test("cdc_merge_apply equals a plain-Scala last-writer-wins fold") {
    val out = Lakehouse.cdcMergeApply(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap

    val base = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal").cast("decimal(14,4)"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val offset = Lakehouse.keyOffset(spark, sf)
    val lastOp = Tables.events(spark, sf)
      .select(col("user_id") + offset, col("event_type"),
        col("value").cast("decimal(14,4)"), unix_micros(col("ts")), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDecimal(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1).view
      .mapValues(_.maxBy(e => (e._4, e._5))).toMap

    val expected = scala.collection.mutable.Map.empty[Long, (Double, String)]
    base.foreach { case (k, v) =>
      lastOp.get(k) match {
        case None => expected(k) = (v.doubleValue, "unchanged")
        case Some((_, "error", _, _, _)) => () // tombstoned
        case Some((_, _, nv, _, _)) => expected(k) = (nv.doubleValue, "updated")
      }
    }
    lastOp.foreach { case (k, (_, et, nv, _, _)) =>
      if (!base.contains(k) && et != "error") expected(k) = (nv.doubleValue, "inserted")
    }
    assert(out === expected.toMap)
    // the synthetic keyspace must exercise all three MERGE cases
    val kinds = out.values.map(_._2).toSet
    assert(kinds === Set("unchanged", "updated", "inserted"))
  }

  test("snapshot_diff_cdf: applying the feed to the base reproduces the new snapshot") {
    val base = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal").cast("decimal(14,4)").cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val target = Lakehouse.cdcMergeApply(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cdf = Lakehouse.snapshotDiffCdf(spark, sf).collect()

    val replayed = scala.collection.mutable.Map(base.toSeq: _*)
    cdf.foreach { r =>
      r.getString(1) match {
        case "I" | "U" => replayed(r.getLong(0)) = r.getDouble(3)
        case "D" => replayed.remove(r.getLong(0))
      }
    }
    assert(replayed.toMap === target)
    // the feed is minimal: no op row for an unchanged key
    cdf.foreach { r =>
      val k = r.getLong(0)
      assert(base.get(k) != target.get(k), s"non-minimal CDF row $r")
    }
    assert(cdf.map(_.getString(1)).toSet === Set("I", "U", "D"))
  }

  test("compaction_plan: bins partition the file list in order, mass conserved") {
    val plan = Lakehouse.compactionPlan(spark, sf).collect()
    val stats = Lakehouse.dataSkippingStats(spark, sf).collect()
    val totalByLayout = stats.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    plan.groupBy(_.getString(0)).foreach { case (layout, bins) =>
      assert(bins.map(_.getLong(3)).sum === totalByLayout(layout))
      assert(bins.map(_.getLong(2)).sum === 32L, "every file assigned once")
      // bins cover contiguous, non-overlapping file ranges in order
      val sorted = bins.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(5) < b.getLong(4), "bin file ranges overlap")
        case _ => ()
      }
      // a non-final bin closes when its cumulative mass crosses the
      // target, so it can fall short only by less than one file
      val maxFile = stats.filter(_.getString(0) == layout)
        .map(_.getLong(2)).max
      sorted.dropRight(1).foreach(b =>
        assert(b.getLong(3) > Lakehouse.CompactTargetRows - maxFile,
          s"undersized non-final bin in $layout: $b"))
    }
  }

  test("data_skipping_stats: ranged layout skips, hashed layout cannot") {
    val rows = Lakehouse.dataSkippingStats(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    val (ranged, hashed) = rows.partition(_.getString(0) == "date_ranged")
    assert(ranged.map(_.getLong(2)).sum === total)
    assert(hashed.map(_.getLong(2)).sum === total)

    // a date-clustered layout must skip most files for a 1-of-N-years
    // probe; a hashed layout's files straddle the span and skip (at
    // most a small-sample fluke of) nothing — the whole point of
    // clustering the write path
    val skippedR = ranged.count(_.getBoolean(5))
    val skippedH = hashed.count(_.getBoolean(5))
    assert(skippedR.toDouble / ranged.length >= 0.5,
      s"date-ranged layout skipped only $skippedR/${ranged.length} files")
    assert(skippedH.toDouble / hashed.length <= 0.2,
      s"key-hashed layout unexpectedly skippable: $skippedH/${hashed.length}")
    assert(skippedH < skippedR)
    // ranged files are genuinely range-partitioned: non-overlapping dates
    val spans = ranged.sortBy(_.getLong(1))
      .map(r => (r.getDate(3).toString, r.getDate(4).toString))
    spans.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, "overlapping file ranges")
      case _ => ()
    }
  }

  test("cdc_time_travel algebra: cut >= max replays the full merge, cut < min is the base") {
    import org.apache.spark.sql.functions._
    val full = Lakehouse.cdcTimeTravelAt(spark, sf, Long.MaxValue)
      .collect().map(_.toSeq)
    val merged = Lakehouse.cdcMergeApply(spark, sf).collect().map(_.toSeq)
    assert(full.toSeq === merged.toSeq, "cut at +inf must equal the merge")
    val atBase = Lakehouse.cdcTimeTravelAt(spark, sf, Long.MinValue).collect()
    val base = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal").cast("double"))
      .orderBy("c_custkey").collect()
    assert(atBase.length === base.length)
    atBase.zip(base).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0) &&
        a.getDouble(1) === b.getDouble(1) && a.getString(2) === "unchanged")
    }
    // the registered midpoint cut sits strictly between the extremes
    val mid = Lakehouse.cdcTimeTravel(spark, sf).collect()
    val changedMid = mid.count(_.getString(2) != "unchanged")
    val changedFull = merged.count(_(2) != "unchanged")
    assert(changedMid > 0 && changedMid <= changedFull)
  }
}
