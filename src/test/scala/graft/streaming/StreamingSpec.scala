package graft.streaming

import graft.SharedSpark
import graft.operators.Temporal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twins must agree with their batch operators: every window
  * the stream emits (append mode emits once the watermark passes) must
  * equal the batch result for that window exactly.
  */
class StreamingSpec extends AnyFunSuite {
  import SharedSpark._

  test("streaming TV divergence windows match the batch closed form") {
    val streamed = Streaming.runToMemory(
      Streaming.sourceDivergenceStream(spark, sf), "tv_stream").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(streamed.nonEmpty, "watermark never released any window")
    // recompute every emitted window with the same integer closed form
    // from the batch table: gap terms |c*B - b*n|, absent-baseline mass
    // (B - covered)*n, one final division
    val rows = graft.sources.Tables.events(spark, sf)
      .select(date_format(col("ts"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"))
      .groupBy("hour", "event_type").agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val base = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val btot = base.values.sum
    val byHour = rows.groupBy(_._1)
    streamed.foreach { case (hour, (nW, tv)) =>
      val cs = byHour(hour).map(r => r._2 -> r._3)
      val n = cs.map(_._2).sum
      assert(n === nW, s"window $hour count")
      val gap = cs.map { case (t, c) =>
        math.abs(c * btot - base.getOrElse(t, 0L) * n) }.sum
      val covered = cs.map { case (t, _) => base.getOrElse(t, 0L) }.sum
      val expected = (gap + (btot - covered) * n).toDouble /
        (2L * n * btot).toDouble
      assert(tv === expected, s"window $hour tv")
    }
  }

  test("streaming events_hourly emits exactly the batch windows") {
    val streamed = Streaming.runToMemory(
      Streaming.eventsHourlyStream(spark, sf), "hourly_stream").collect()
      .map(r => (r.getAs[String]("hour"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    assert(streamed.nonEmpty, "watermark never released any window")
    val batch = Temporal.eventsHourly(spark, sf).collect()
      .map(r => (r.getAs[String]("hour"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    streamed.foreach { case (k, v) =>
      assert(batch.get(k).contains(v), s"window $k: stream=$v batch=${batch.get(k)}")
    }
  }

  test("streaming sessionize emits sessions that match the batch twin") {
    val streamed = Streaming.runToMemory(
      Streaming.sessionizeStream(spark, sf), "sess_stream").collect()
    assert(streamed.nonEmpty, "watermark never released any session")
    val batch = Temporal.sessionize(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    streamed.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"))
      val got = (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))
      assert(batch.get(key).contains(got),
        s"session $key: stream=$got batch=${batch.get(key)}")
    }
  }

  test("streaming dedup keeps exactly one event per key") {
    val out = Streaming.runToMemory(
      Streaming.dedupStream(spark, sf), "dedup_stream").collect()
    assert(out.nonEmpty)
    val keys = out.map(r =>
      (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    // one survivor per key, and the key set is exactly the batch one
    assert(keys.length === keys.distinct.length, "duplicate key emitted")
    val batchKeys = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(keys.toSet === batchKeys)
  }

  test("stream-stream interval join emits exactly the batch interval pairs") {
    val out = Streaming.runToMemory(
      Streaming.rangeJoinStream(spark, sf), "range_stream").collect()
      .map(r => (r.getAs[Long]("iv_id"), r.getAs[Long]("event_id"))).toSet
    assert(out.nonEmpty)
    // batch definition of the same pairs (the range_join_bucketed
    // pre-aggregation relation)
    val ev = graft.sources.Tables.events(spark, sf)
    val iv = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("iv_id"), col("ts").as("iv_ts"))
    val batch = iv.join(ev.select(col("event_id"), col("ts")),
        expr("ts >= iv_ts AND ts < iv_ts + INTERVAL 1 HOUR"))
      .select(col("iv_id"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === batch)
  }

  test("stream-static enrichment join equals the batch join, stateless") {
    val streamDf = Streaming.enrichStream(spark, sf)
    val out = Streaming.runToMemory(streamDf, "enrich_stream").collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("user_id"), r.getAs[String]("segment")))
    assert(out.nonEmpty)
    assert(out.length === out.map(_._1).distinct.length)
    val batch = Streaming.enrichBatch(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("user_id"), r.getAs[String]("segment"))).toMap
    assert(out.length === batch.size)
    out.foreach { case (id, v) =>
      assert(batch.get(id).contains(v), s"event $id: stream=$v batch=${batch.get(id)}")
    }
    // every event found its dimension row (keys are a subset by data)
    assert(out.forall(_._2._2 != null))
  }

  test("custom mapGroupsWithState tracker converges to the batch per-user totals") {
    val out = Streaming.runToMemory(
      Streaming.userActivityStream(spark, sf), "activity_stream", "update")
      .collect()
    assert(out.nonEmpty)
    // update mode emits the running state each batch: the LAST emission
    // per user (max n_events — the counter is monotone) is the final state
    val finalState = out.groupBy(_.getAs[Long]("user_id")).map {
      case (u, rows) => u -> rows.map(r =>
        (r.getAs[Long]("n_events"), r.getAs[Long]("last_us"))).maxBy(_._1)
    }
    val batch = Streaming.userActivityBatch(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("last_us"))).toMap
    assert(finalState.keySet === batch.keySet)
    finalState.foreach { case (u, st) =>
      assert(batch(u) === st, s"user $u: stream=$st batch=${batch(u)}")
    }
  }

  test("streaming new-user detector emits each user exactly once, matching batch") {
    val out = Streaming.runToMemory(
      Streaming.newUsersStream(spark, sf), "new_users_stream").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("first_us"))
    assert(out.nonEmpty)
    // exactly-once per user
    assert(out.map(_._1).distinct.length === out.length)
    val batch = Streaming.newUsersBatch(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("first_us")).toMap
    assert(out.toMap === batch)
  }

  test("streaming funnel emits each conversion once, matching the batch window") {
    val out = Streaming.runToMemory(
      Streaming.funnelStream(spark, sf), "funnel_stream").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("first_view_us"), r.getAs[Long]("purchase_us"),
          r.getAs[Long]("delay_us"))))
    assert(out.nonEmpty, "no conversions detected")
    // exactly-once per user, delays inside the window, purchase ≥ view
    assert(out.map(_._1).distinct.length === out.length)
    out.foreach { case (_, (v, p, d)) =>
      assert(p >= v && d === p - v)
      assert(d <= graft.operators.Temporal.ConvWindowUs)
    }
    val batch = Streaming.funnelBatch(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("first_view_us"), r.getAs[Long]("purchase_us"),
          r.getAs[Long]("delay_us")))).toMap
    assert(out.toMap === batch)
  }

  test("streaming funnel converts a same-instant view+purchase pair (tie-break)") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import spark.implicits._
    // a single-instant corpus: the batch twin counts purchase at
    // t >= first_view INCLUSIVE, so the stream must too — and with the
    // purchase row written BEFORE the view row, a timestamp-only sort
    // would process purchase first and miss the conversion
    val t0 = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z"))
    val t1 = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:01Z"))
    val rows = Seq(
      (1L, "purchase", t0), (1L, "view", t0), // tie → must convert, delay 0
      (2L, "purchase", t0), (2L, "view", t1)  // purchase strictly first → no
    ).toDF("user_id", "event_type", "ts")
    val dir = Files.createTempDirectory("graft_funnel_tie").toString
    val tmp = Files.createTempDirectory("graft_funnel_tie_w").toString
    rows.coalesce(1).write.mode("overwrite").parquet(tmp)
    val f = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(f.toPath, Paths.get(dir, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val out = Streaming.runToMemory(
      Streaming.funnelStream(spark, dir), "funnel_tie_stream").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("delay_us")).toMap
    assert(out === Map(1L -> 0L))
  }

  test("streaming top-k sketch windows equal the batch sketch") {
    val streamed = Streaming.runToMemory(
      Streaming.topkStream(spark, sf), "topk_stream").collect()
      .map(r => r.getAs[String]("hour") ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.toString)).toMap
    assert(streamed.nonEmpty, "watermark never released any window")
    val batch = Streaming.topkBatch(spark, sf).collect()
      .map(r => r.getAs[String]("hour") ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.toString)).toMap
    streamed.foreach { case (h, top) =>
      assert(batch.get(h).contains(top),
        s"hour $h: stream=$top batch=${batch.get(h)}")
    }
  }

  test("streaming daily CMS sketches are bit-identical to the batch sketches") {
    val streamed = Streaming.runToMemory(
      Streaming.cmsDailyStream(spark, sf), "cms_stream").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(streamed.nonEmpty, "watermark never released any day")
    val batch = Streaming.cmsDailyBatch(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    streamed.foreach { case (d, sk) =>
      assert(batch.contains(d), s"day $d missing from batch")
      assert(java.util.Arrays.equals(sk, batch(d)),
        s"day $d: streamed sketch differs from batch")
    }
    // the streamed blobs answer the rollup question without any rescan
    streamed.values.foreach(sk =>
      assert(sk.length === graft.plans.CmsSketch.Bytes))
  }

  test("streaming daily DDSketches are bit-identical to the batch sketches") {
    val streamed = Streaming.runToMemory(
      Streaming.ddsDailyStream(spark, sf), "dds_stream").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(streamed.nonEmpty, "watermark never released any day")
    val batch = Streaming.ddsDailyBatch(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    streamed.foreach { case (d, sk) =>
      assert(batch.contains(d), s"day $d missing from batch")
      assert(java.util.Arrays.equals(sk, batch(d)),
        s"day $d: streamed sketch differs from batch")
    }
    // and a quantile read off a streamed blob obeys the alpha bound
    val someDay = streamed.keys.min
    import spark.implicits._
    val est = Seq(streamed(someDay)).toDF("sk")
      .select(expr("graft_dds_quantile(sk, 0.5D)")).collect()(0).getDouble(0)
    val exact = graft.sources.Tables.events(spark, sf)
      .filter(date_format(col("ts"), "yyyy-MM-dd") === someDay)
      .select("value").collect().map(_.getDouble(0)).sorted
    val truth = exact(math.max(1, math.ceil(0.5 * exact.length).toInt) - 1)
    assert(math.abs(est - truth) <=
      graft.plans.DdSketch.Alpha * math.abs(truth) + 1e-12)
  }

  test("streaming transition detector matches the batch pair counts exactly") {
    val out = Streaming.runToMemory(
      Streaming.transitionsStream(spark, sf), "trans_stream")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"))
        -> r.getAs[Long]("n")).toMap
    assert(out.nonEmpty, "no transitions detected")
    val batch = Streaming.transitionsBatch(spark, sf).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"))
        -> r.getAs[Long]("n")).toMap
    assert(out === batch)
    // the pair total is events minus users (one lead loss per user)
    val ev = graft.sources.Tables.events(spark, sf)
    assert(out.values.sum ===
      ev.count() - ev.select("user_id").distinct().count())
  }

  test("streaming as-of join matches the batch as-of pair-for-pair") {
    def key(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("o_orderkey")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("o_t_us")).map(_.longValue))
    val streamed = Streaming.runToMemory(
      Streaming.asofStream(spark, sf), "asof_stream")
      .collect().map(key).toMap
    val batch = Temporal.asofJoin(spark, sf)
      .collect().map(key).toMap
    assert(streamed.nonEmpty, "as-of stream emitted nothing")
    assert(streamed.size === batch.size)
    batch.foreach { case (eid, m) =>
      assert(streamed(eid) === m, s"event $eid: ${streamed(eid)} != $m")
    }
  }

  test("as-of cursor advances monotonically across late micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // tagged rows: (key, t, tie, tag) — tag 0 = order (tie = okey),
    // tag 1 = event (tie = event_id)
    val in = MemoryStream[(Long, Long, Long, Int)]
    val q = Streaming.asofPairsOf(in.toDS())
      .writeStream.format("memory").queryName("late_asof")
      .outputMode("append").start()
    def matches() = spark.table("late_asof").collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("o_orderkey")).map(_.longValue))
      .toMap
    try {
      in.addData((1L, 10L, 100L, 0), (1L, 20L, 1L, 1)) // O1@10, E1@20
      q.processAllAvailable()
      in.addData((1L, 30L, 200L, 0)) // O2@30 — cursor advances, no emit
      q.processAllAvailable()
      // LATE event E2@25: its true match O1 was superseded and
      // discarded — the DOCUMENTED forward-ordering residual is a
      // null match, never a match against the newer O2
      in.addData((1L, 25L, 2L, 1))
      q.processAllAvailable()
      // LATE order O0@15 + event E3@40: the cursor must NOT regress
      // to O0 — E3 matches O2, and so does the state going forward
      in.addData((1L, 15L, 50L, 0), (1L, 40L, 3L, 1))
      q.processAllAvailable()
      // same-instant tie: an order AT the event's timestamp matches
      in.addData((1L, 50L, 300L, 0), (1L, 50L, 4L, 1))
      q.processAllAvailable()
    } finally q.stop()
    val m = matches()
    assert(m(1L) === Some(100L), "in-batch as-of pair broken")
    assert(m(2L) === None, s"late event matched the FUTURE order: ${m(2L)}")
    assert(m(3L) === Some(200L), s"cursor regressed to the late order: ${m(3L)}")
    assert(m(4L) === Some(300L), "same-instant order did not match")
  }

  test("streaming range-topk equals the batch cell sweep pair-for-pair") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000L // epoch seconds
    // 180 events over 10 h (spans two 8 h sweep cells), every 13th an
    // interval opener; two out-of-order rows land in batch 2 with
    // event times INSIDE batch 1's span (but past its watermark, so the
    // engine keeps them and the cell state must merge them in order)
    def row(i: Long, sec: Long, vu: Long, iv: Boolean) = (i, sec, vu, iv)
    val main = (0L until 180L).map(i =>
      row(i, base + i * 200, (i * 37) % 500 + 1, i % 13 == 0))
    val late = Seq(row(500L, base + 15000, 777L, false),
      row(501L, base + 15500, 888L, true))
    val sentinel = Seq(row(999L, base + 36000 + 3 * 3600, 1L, false))
    val all = main ++ late ++ sentinel

    val in = MemoryStream[(Long, java.time.Instant, Long, Boolean)]
    val q = Streaming.rangeTopkHitsOf(
        in.toDF().toDF("id", "ts", "vu", "iv"))
      .writeStream.format("memory").queryName("range_topk_stream")
      .outputMode("append").start()
    def emitted() = spark.table("range_topk_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // timeout-driven emissions land in a NO-DATA micro-batch after the
    // watermark advances; processAllAvailable does not wait for it, so
    // settle by polling until the emitted set stops changing
    def settled[T](read: () => T): T = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var prev = read()
      var stable = 0
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val cur = read()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      prev
    }
    def feed(rs: Seq[(Long, Long, Long, Boolean)]): Unit = {
      in.addData(rs.map { case (i, sec, vu, iv) =>
        (i, java.time.Instant.ofEpochSecond(sec), vu, iv) })
      q.processAllAvailable()
    }
    // the batch operator's own core over the same rows (sentinel
    // included) — pair-for-pair, rank-for-rank
    val batch = graft.operators.Stats.rangeTopkHitsOn(
        all.toDF("id", "sec", "vu", "iv")
          .select(col("id"), (col("sec") * 1000000L).as("t"),
            col("vu"), col("iv")))
      .collect().map(h => (h.iv_id, h.rk, h.event_id)).toSet
    assert(batch.nonEmpty)
    try {
      feed(main.filter(_._1 < 90))
      // watermark after batch 1 = max ts (base+17800) - 1 h: exactly
      // the intervals whose WINDOW END the watermark passed are final
      val wm1 = base + 89 * 200 - 3600
      val expect1 = main.filter(r => r._4 && r._2 + 3600 <= wm1)
        .map(_._1).toSet
      val got1 = settled(() => emitted().map(_._1))
      assert(got1 === expect1,
        s"batch-1 emissions not watermark-gated: $got1")
      feed(main.filter(_._1 >= 90) ++ late)
      feed(sentinel) // pushes the watermark past every window end
      val fin = settled(() => emitted())
      assert(fin === batch,
        s"stream-batch divergence: stream-only=${fin -- batch} " +
          s"batch-only=${batch -- fin}")
      // the late interval (id 501) is in the final set — state merged it
      assert(fin.exists(_._1 === 501L), "late interval never emitted")
    } finally q.stop()
  }

  test("transition cursor never regresses under a late micro-batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, java.time.Instant, Long)]
    val q = Streaming.transitionPairsOf(in.toDS())
      .writeStream.format("memory").queryName("late_trans")
      .outputMode("append").start()
    def at(sec: Long) = java.time.Instant.ofEpochSecond(sec)
    try {
      in.addData((1L, "a", at(10), 1L), (1L, "c", at(30), 3L))
      q.processAllAvailable()
      // batch 2 is entirely LATE: one event between a and c. It must
      // pair as (b, c) against the SORTED chain — a blind prepend of
      // the carried cursor would emit the reversed (c, b)
      in.addData((1L, "b", at(20), 2L))
      q.processAllAvailable()
      // batch 3: the cursor must still be c@30 (max), not the late
      // b@20 — d pairs against c, never against b
      in.addData((1L, "d", at(40), 4L))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("late_trans").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(pairs.count(_ == ("a", "c")) === 1) // batch 1, final on emit
    assert(pairs.contains(("b", "c")), "late event paired out of order")
    assert(pairs.contains(("c", "d")),
      "cursor regressed to the late event")
    assert(!pairs.contains(("c", "b")) && !pairs.contains(("b", "d")),
      s"stale-cursor pairs emitted: $pairs")
  }
}
