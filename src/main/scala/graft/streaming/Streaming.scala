package graft.streaming

import graft.functions.Nums._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming twins of the batch temporal operators
  * (SURVEY.md §2G): same aggregation logic declared over `readStream`,
  * with event-time watermarks bounding state.
  *
  * At production scale these run against a file/queue source with
  * `trigger(AvailableNow)` for catch-up or continuous micro-batches for
  * tailing; state size is bounded by the watermark delay (1 h for the
  * hourly windows, 30 min gap + delay for sessions), so executors hold
  * O(active windows), never O(history).
  */
object Streaming {

  /** Streaming scan of the events table: explicit schema (required by
    * file streaming sources), nanosecond repair identical to the batch
    * loader.
    */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val path = Tables.path(dir, "events")
    val schema = s.read.parquet(path).schema // metadata-only driver read
    // file streaming sources require a directory: stream the sf dir with
    // a glob filter selecting the events table file
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    // same type-conditional ts repair as the batch loader (Tables.events)
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Tumbling-hour counts with a 1 h watermark — the streaming twin of
    * `events_hourly`. In append mode a window emits exactly once, when
    * the watermark passes its end.
    */
  def eventsHourlyStream(s: SparkSession, dir: String): DataFrame =
    eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(decp(col("value"))).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows (30 min gap) per user — the streaming twin of
    * `sessionize`, using Spark's native `session_window` (merging
    * event-time windows with watermark-bounded state) instead of a
    * custom mapGroupsWithState: the built-in operator handles late
    * merges and state eviction.
    */
  def sessionizeStream(s: SparkSession, dir: String): DataFrame =
    eventsStream(s, dir)
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        dsum(decp(col("value"))).as("sum_value"))
      .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup — the streaming twin of `dedup_exact_key`:
    * first event per (user_id, event_type) survives, with
    * `dropDuplicatesWithinWatermark` bounding the dedup state to the
    * watermark horizon (an unbounded-key streaming dedup would
    * accumulate state forever; within-watermark is the shape that runs
    * indefinitely at ingest scale).
    */
  def dedupStream(s: SparkSession, dir: String): DataFrame =
    eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("event_id"), col("user_id"), col("event_type"))

  /** Streaming heavy-hitters — the [[graft.plans.SpaceSavingTopK]]
    * sketch inside a windowed streaming aggregation: per-hour top-5
    * users by event count. The sketch is a TypedImperativeAggregate,
    * so Spark keeps ONE bounded buffer per open window as streaming
    * state and merges partials exactly as in batch — the state size is
    * `capacity` entries per window regardless of key cardinality,
    * which is what lets a top-k run indefinitely over an unbounded
    * stream (an exact groupBy-count twin would hold every key ever
    * seen). Capacity 256 exceeds the testdata's per-hour cardinality,
    * so counts are exact here and the spec can compare against the
    * batch sketch verbatim.
    */
  def topkStream(s: SparkSession, dir: String): DataFrame =
    eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(call_function(graft.plans.SpaceSavingTopK.FnName,
        col("user_id").cast("string"), lit(5), lit(256)).as("top_users"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("top_users"))

  /** Batch twin of [[topkStream]] (same plan over the batch loader). */
  def topkBatch(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(call_function(graft.plans.SpaceSavingTopK.FnName,
        col("user_id").cast("string"), lit(5), lit(256)).as("top_users"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("top_users"))

  /** Streaming mergeable summaries — the [[graft.plans.CmsSketch]]
    * tier maintained incrementally: per-day Count-Min sketches of the
    * event-type frequency vector, built inside a windowed streaming
    * aggregation. The sketch is a TypedImperativeAggregate whose merge
    * is counter ADDITION, so micro-batch partials fold into the window
    * state exactly as batch partials do — the emitted blob is
    * BIT-IDENTICAL to the batch sketch of the same day (spec-pinned).
    * This is the ingest architecture the sketch tier exists for: the
    * stream keeps one 16 KiB buffer per open day, the warehouse stores
    * blobs, and any later rollup ([[graft.operators.Analytics
    * .cmsCountRollup]]) merges blobs without ever rescanning events.
    */
  def cmsDailyStream(s: SparkSession, dir: String): DataFrame =
    eventsStream(s, dir)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(expr(s"${graft.plans.CmsSketch.SketchFn}(event_type)").as("sk"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"), col("sk"))

  /** Batch twin of [[cmsDailyStream]] (same plan over the batch loader). */
  def cmsDailyBatch(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(expr(s"${graft.plans.CmsSketch.SketchFn}(event_type)").as("sk"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"), col("sk"))

  /** Streaming DDSketch quantiles — [[graft.plans.DdSketch]]'s tier
    * maintained incrementally: per-day value sketches built inside a
    * windowed streaming aggregation. Bucket-addition merge makes
    * micro-batch partials fold into the window state exactly as batch
    * partials do, and the canonical blob serialization makes the
    * emitted sketch BIT-IDENTICAL to the batch sketch of the same day
    * (spec-pinned) — so a stream can feed the same parquet sketch
    * store the batch rollup reads, and p95-over-any-window stays a
    * blob-merge question. State per open day is bounded by the value
    * distribution's dynamic range, not by row count.
    */
  def ddsDailyStream(s: SparkSession, dir: String): DataFrame =
    eventsStream(s, dir)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(expr(s"${graft.plans.DdSketch.SketchFn}(value)").as("sk"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"), col("sk"))

  /** Batch twin of [[ddsDailyStream]] (same plan over the batch loader). */
  def ddsDailyBatch(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(expr(s"${graft.plans.DdSketch.SketchFn}(value)").as("sk"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"), col("sk"))

  /** Stream-stream interval join — the streaming twin of
    * `range_join_bucketed`'s blast-radius query: pair every 'error'
    * event with the events in the hour after it, as the pairs arrive.
    * Structured Streaming requires an EQUALITY predicate on
    * stream-stream joins (state is keyed by it), so the same time-bucket
    * rewrite the batch operator uses for shuffle locality serves here as
    * the state key: intervals explode to their <= 2 covering hour
    * buckets, probes carry their bucket, the exact range predicate
    * verifies. Both sides carry watermarks and the join condition bounds
    * event-time distance, so buffered state evicts once the watermark
    * passes an interval's end — O(events per horizon) state, which is
    * what lets the join run indefinitely. Emits raw pairs (append-mode
    * safe); per-interval aggregation happens downstream as in batch.
    */
  def rangeJoinStream(s: SparkSession, dir: String): DataFrame = {
    val W = 3600000000L // 1 h in micros — bucket width == interval length
    val iv = eventsStream(s, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("iv_id"), col("ts").as("iv_ts"))
      .withWatermark("iv_ts", "1 hour")
      .withColumn("b", explode(array_distinct(array(
        expr(s"unix_micros(iv_ts) div ${W}L"),
        expr(s"(unix_micros(iv_ts) + ${W}L - 1) div ${W}L")))))
    val pr = eventsStream(s, dir)
      .select(col("event_id"), col("ts"))
      .withWatermark("ts", "1 hour")
      .withColumn("b", expr(s"unix_micros(ts) div ${W}L"))
    iv.join(pr, iv("b") === pr("b") &&
        expr("ts >= iv_ts AND ts < iv_ts + INTERVAL 1 HOUR"))
      .select(col("iv_id"), col("event_id"),
        unix_micros(col("iv_ts")).as("iv_us"), unix_micros(col("ts")).as("us"))
  }

  /** Stream-static enrichment join — the streaming twin of the
    * fact-dim broadcast join: each micro-batch of events joins the
    * static customer dimension on the user key. Stream-static equi-joins
    * are STATELESS (no watermark, no state store): the static side is
    * (re)broadcast and each batch row passes through once, which is why
    * this is the canonical shape for attaching dimensions at ingest
    * instead of paying the join on every downstream query. The static
    * side re-resolves per batch, so slowly-changing dims pick up updates
    * between micro-batches.
    */
  def enrichStream(s: SparkSession, dir: String): DataFrame =
    eventsStream(s, dir).join(
      broadcast(enrichDim(s, dir)), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("segment"))

  /** Batch twin of [[enrichStream]] (same join over the batch loader). */
  def enrichBatch(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).join(
      broadcast(enrichDim(s, dir)), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("segment"))

  private def enrichDim(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))

  /** Per-user activity state carried by [[UserActivity]] rows. */
  case class UserActivity(user_id: Long, n_events: Long, last_us: Long)

  /** Custom keyed streaming state — the `mapGroupsWithState` tier for
    * semantics no built-in operator expresses: a per-user running
    * activity tracker (event count + last-seen time) that emits its
    * updated state every micro-batch and EVICTS idle users via
    * event-time timeout (watermark + 1 h past last activity). This is
    * the (d)-tier streaming extension point: `session_window`,
    * `dropDuplicatesWithinWatermark` etc. cover the standard shapes
    * (and are preferred — see `sessionizeStream`); custom state is for
    * the rest, and the timeout discipline is what keeps state bounded
    * on an unbounded key space. Typed `Dataset` API throughout —
    * `GroupState[UserActivity]` is a case-class encoder, not a Row.
    */
  def userActivityStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import s.implicits._
    def track(userId: Long, rows: Iterator[(Long, java.time.Instant)],
        state: GroupState[UserActivity]): Iterator[UserActivity] = {
      if (state.hasTimedOut) {
        state.remove() // idle past the horizon: drop the key's state
        Iterator.empty
      } else {
        val prev = state.getOption.getOrElse(UserActivity(userId, 0L, 0L))
        var n = prev.n_events
        var last = prev.last_us
        rows.foreach { case (_, t) =>
          n += 1
          last = math.max(last, t.getEpochSecond * 1000000L + t.getNano / 1000L)
        }
        val next = UserActivity(userId, n, last)
        state.update(next)
        // time out 1 h (event time) after the last activity
        state.setTimeoutTimestamp(last / 1000L + 3600L * 1000L)
        Iterator.single(next)
      }
    }
    eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      // the WATERMARKED column itself must flow into the stateful
      // operator (a derived long would orphan the watermark)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.time.Instant)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout())(track)
      .toDF()
  }

  /** Batch twin of [[userActivityStream]]'s FINAL state per user. */
  def userActivityBatch(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(unix_micros(col("ts"))).as("last_us"))

  /** First-seen marker emitted once per user by [[newUsersStream]]. */
  case class NewUser(user_id: Long, first_us: Long)

  /** Streaming new-user detector — the streaming twin of the batch
    * `dau_new_returning` split's "new" side: emit exactly ONE row per
    * user, on the micro-batch where the user is first seen, carrying
    * their first event time. Keyed state is the seen-set itself
    * (one tiny row per known user), which is the irreducible cost of
    * exact first-seen semantics on an unbounded key space — a
    * production deployment bounds it with a state-TTL re-emission
    * contract or swaps the state for a Bloom filter when approximate
    * "new" is acceptable (both documented trades, not defaults).
    * Append mode: a user's row is final the moment it is emitted.
    */
  def newUsersStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import s.implicits._
    def seen(userId: Long, rows: Iterator[(Long, java.time.Instant)],
        state: GroupState[NewUser]): Iterator[NewUser] = {
      val batchMin = rows.map { case (_, t) =>
        t.getEpochSecond * 1000000L + t.getNano / 1000L
      }.minOption
      (state.getOption, batchMin) match {
        case (Some(_), _) | (_, None) => Iterator.empty // already known
        case (None, Some(first)) =>
          val nu = NewUser(userId, first)
          state.update(nu)
          Iterator.single(nu)
      }
    }
    eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"))
      .as[(Long, java.time.Instant)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout())(seen)
      .toDF()
  }

  /** Batch twin of [[newUsersStream]]: first event time per user. */
  def newUsersBatch(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("first_us"))

  case class FunnelState(firstView: Long, done: Boolean)
  case class FunnelHit(user_id: Long, first_view_us: Long,
    purchase_us: Long, delay_us: Long)

  /** Streaming windowed-funnel detector — the stateful twin of
    * `funnel_windowed`'s batch flags: per user, ONE row the moment a
    * purchase lands within [[graft.operators.Temporal.ConvWindowUs]]
    * of their first view (Append mode — the conversion is final on
    * emit; the first eligible purchase is by construction the minimum
    * one, so stream and batch agree on the row). Keyed state is two
    * numbers per user (first view + done flag) — O(users), the
    * irreducible exact-funnel state, bounded in production by a
    * state-TTL on dormant users. Within a micro-batch events process
    * in event-time order, so intra-batch disorder is handled exactly;
    * a purchase arriving in an EARLIER batch than a retro-dated view
    * is the documented residual trade (the batch key re-derives truth
    * offline — the streaming row is the low-latency signal; the
    * lakehouse closure is [[ManifestCdf.reconcileFunnel]], which tails
    * the event table's CDF and repairs a user-keyed funnel table per
    * version, the reconcileTransitions pattern).
    */
  def funnelStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import s.implicits._
    val W = graft.operators.Temporal.ConvWindowUs
    def step(u: Long, rows: Iterator[(Long, String, java.time.Instant)],
        state: GroupState[FunnelState]): Iterator[FunnelHit] = {
      var st = state.getOption.getOrElse(FunnelState(Long.MaxValue, false))
      if (st.done) return Iterator.empty
      // Tie-break same-microsecond events with view BEFORE purchase:
      // the batch twin counts a purchase at t >= first_view inclusive,
      // so a view/purchase pair sharing an instant must convert here
      // too — timestamp-only ordering could process purchase first and
      // silently miss it.
      val evs = rows.map { case (_, tpe, t) =>
        (tpe, t.getEpochSecond * 1000000L + t.getNano / 1000L)
      }.toSeq.sortBy(e => (e._2, if (e._1 == "view") 0 else 1))
      var out: Option[FunnelHit] = None
      evs.foreach { case (tpe, t) =>
        if (tpe == "view" && t < st.firstView)
          st = st.copy(firstView = t)
        else if (tpe == "purchase" && !st.done &&
          st.firstView != Long.MaxValue && t >= st.firstView &&
          t - st.firstView <= W) {
          out = Some(FunnelHit(u, st.firstView, t, t - st.firstView))
          st = st.copy(done = true)
        }
      }
      state.update(st)
      out.iterator
    }
    eventsStream(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[(Long, String, java.time.Instant)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout())(step)
      .toDF()
  }

  /** Batch twin of [[funnelStream]]: users whose first purchase at or
    * after their first view landed within the window. */
  def funnelBatch(s: SparkSession, dir: String): DataFrame = {
    val W = graft.operators.Temporal.ConvWindowUs
    graft.operators.Temporal.timeToConvert(s, dir)
      .filter(col("converted") &&
        col("first_purchase_us") - col("first_view_us") <= W)
      .select(col("user_id"), col("first_view_us"),
        col("first_purchase_us").as("purchase_us"),
        (col("first_purchase_us") - col("first_view_us")).as("delay_us"))
  }

  /** Drive a streaming DF to completion against an in-memory sink and
    * return the materialized table (test/dev harness; production would
    * `writeStream` to files/Kafka with the same plan).
    */
  /** Streaming distribution-drift monitor — the streaming twin of
    * `source_divergence_tv`, re-pointed at the event stream: per
    * tumbling hour, the total-variation distance between the window's
    * event-type distribution and a broadcast static baseline (the
    * batch table's overall distribution). Same transcendental-free
    * arithmetic as the batch key: every gap term |c·B − b·n_w| is
    * exact integer, absent-baseline mass folds into the closed form
    * (B − covered)·n_w, one division per window at the end.
    *
    * Shape: a stateless broadcast enrich (baseline counts + 1-row
    * total) BEFORE the watermark, then Spark 4's chained windowed
    * aggregations — (window, type) counts feeding a same-window
    * reduce via `window_time` — so state per open window is
    * |type universe| rows, never event-cardinality. At ingest scale
    * this is the drift alarm that pages before a bad source poisons a
    * training mix: TV spikes the moment a window's distribution leaves
    * the baseline.
    */
  def sourceDivergenceStream(s: SparkSession, dir: String): DataFrame = {
    val baseCounts = Tables.events(s, dir)
      .groupBy("event_type").agg(count(lit(1)).as("b"))
    val btot = baseCounts.agg(sum(col("b")).as("btot"))
    val pw = eventsStream(s, dir)
      .crossJoin(broadcast(btot))
      .join(broadcast(baseCounts), Seq("event_type"), "left")
      .withColumn("b", coalesce(col("b"), lit(0L)))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"), first(col("b")).as("b"),
        first(col("btot")).as("btot"))
    pw.groupBy(window(window_time(col("w")), "1 hour").as("w2"))
      .agg(sum(col("c")).as("n_w"), first(col("btot")).as("btot"),
        collect_list(struct(col("c"), col("b"))).as("xs"))
      .select(
        date_format(col("w2.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("n_w"),
        ((expr("aggregate(xs, 0L, (acc, x) -> acc + abs(x.c * btot - x.b * n_w))") +
          (col("btot") - expr("aggregate(xs, 0L, (acc, x) -> acc + x.b)")) * col("n_w"))
          .cast("double") /
          (lit(2L) * col("n_w") * col("btot")).cast("double")).as("tv_distance"))
  }

  case class TransState(lastType: String, t: Long, eid: Long)
  case class TransPair(from_type: String, to_type: String)

  /** Streaming transition detector — the stateful twin of
    * `event_transitions`' pair counts: per user the keyed state is the
    * LAST event seen (type + time + id — the irreducible O(users)
    * residue of a sequence operator), and each micro-batch emits the
    * (from → to) pairs its events close, including the one bridging
    * the previous batch's tail. Intra-batch disorder is handled
    * exactly (events sort by the batch twin's total order (t,
    * event_id) before pairing — the funnelStream tie lesson), and the
    * carried state joins that sort rather than being blindly
    * prepended, so a batch of late (retro-dated) events pairs in its
    * true position relative to the stored cursor AND the cursor only
    * ever advances — the new state is the MAX of (t, event_id) over
    * carried state plus batch, never the batch's last event (which
    * would walk the cursor backwards under late data and make every
    * subsequent batch pair against a stale predecessor). The residual
    * is exactly the already-EMITTED pair an earlier batch closed
    * across a late event's true position — the same forward-ordering
    * trade funnelStream documents, and it now has an OPERATIONAL
    * closure: [[ManifestCdf.reconcileTransitions]] tails the event
    * table's CDF and repairs the keyed pair table per horizon (the
    * stale pair upserts away under the later-event key). Append mode:
    * a pair is final the moment its later event lands.
    */
  def transitionsStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    transitionPairsOf(eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[(Long, String, java.time.Instant, Long)])
  }

  /** Stateful core of [[transitionsStream]] over any (user, type, ts,
    * id) stream — separated so specs can drive EXACT micro-batch
    * boundaries (late-data batches) through a MemoryStream.
    */
  def transitionPairsOf(
      ds: org.apache.spark.sql.Dataset[(Long, String, java.time.Instant, Long)])
      : DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import ds.sparkSession.implicits._
    def step(userId: Long,
        rows: Iterator[(Long, String, java.time.Instant, Long)],
        state: GroupState[TransState]): Iterator[TransPair] = {
      val evs = rows.map { case (_, et, ts, eid) =>
        (et, ts.getEpochSecond * 1000000L + ts.getNano / 1000L, eid)
      }.toSeq.sortBy(e => (e._2, e._3))
      if (evs.isEmpty) Iterator.empty
      else {
        // the carried state SORTS INTO the chain (not a blind prepend)
        // and the cursor advances to the chain's max, so late events
        // pair correctly against it and the state never regresses
        val chain = (state.getOption
          .map(st => (st.lastType, st.t, st.eid)).toSeq ++ evs)
          .sortBy(e => (e._2, e._3))
        val last = chain.last
        state.update(TransState(last._1, last._2, last._3))
        chain.sliding(2).collect {
          case Seq(a, b) => TransPair(a._1, b._1)
        }
      }
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout())(step)
      .toDF()
  }

  /** Batch twin of [[transitionsStream]]: (from, to) pair counts by
    * the same (t, event_id) total order. */
  def transitionsBatch(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type").as("from_type"),
        unix_micros(col("ts")).as("t"), col("event_id"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
  }

  case class AsofOrder(t: Long, okey: Long)
  case class AsofMatch(event_id: Long, user_id: Long, ts_us: Long,
      o_orderkey: Option[Long], o_t_us: Option[Long])

  /** Streaming as-of join — the stateful twin of `asof_join` (Flink's
    * event-time temporal join shape): the keyed state is the LATEST
    * order seen per user (the irreducible O(keys) residue — an as-of
    * match needs nothing older), and each micro-batch emits one match
    * row per event against the order chain. Orders and events arrive
    * as a tagged union of two file streams; within a batch the chain
    * sorts by the batch twin's exact total order (t, tag, tie) — an
    * order at the same instant as an event sorts first and so matches
    * it, and same-(user, t) orders apply in okey order so the max-okey
    * tie-break reproduces the batch pre-dedup. The carried state sorts
    * INTO the chain and only ever advances (the transitionsStream
    * cursor rule), so late events pair against the newest order at or
    * before them that the stream still holds; an event retro-dated
    * before an order that was already superseded in an EARLIER batch
    * is the same documented forward-ordering residual as
    * transitionsStream (closed operationally by the same CDF
    * reconciliation pattern — [[ManifestCdf.reconcileTransitions]]).
    * Append mode: a match is final the moment its event lands.
    */
  def asofStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import s.implicits._
    val odSchema = s.read.parquet(Tables.path(dir, "orders")).schema
    val odRaw = s.readStream.schema(odSchema)
      .option("pathGlobFilter", "orders.parquet")
      .parquet(dir)
    val odTs = odSchema("o_orderdate").dataType match {
      case org.apache.spark.sql.types.LongType =>
        odRaw.withColumn("o_orderdate",
          timestamp_micros(expr("o_orderdate DIV 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        odRaw.withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      case _ => odRaw
    }
    val od = odTs.select(col("o_custkey").as("k"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
      col("o_orderkey").as("tie"), lit(0).as("tag"))
    val ev = eventsStream(s, dir)
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("t"),
        col("event_id").as("tie"), lit(1).as("tag"))
    import s.implicits._
    asofPairsOf(od.unionByName(ev).as[(Long, Long, Long, Int)])
  }

  /** Stateful core of [[asofStream]] over any tagged (key, t, tie,
    * tag) union stream (tag 0 = order row with tie = okey, tag 1 =
    * event row with tie = event_id) — separated so specs can drive
    * EXACT micro-batch boundaries (late orders, late events) through a
    * MemoryStream.
    */
  def asofPairsOf(ds: org.apache.spark.sql.Dataset[(Long, Long, Long, Int)])
      : DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import ds.sparkSession.implicits._
    def step(k: Long, rows: Iterator[(Long, Long, Long, Int)],
        state: GroupState[AsofOrder]): Iterator[AsofMatch] = {
      val carried = state.getOption.map(o => (o.t, o.okey, 0)).toSeq
      val chain = (carried ++ rows.map(r => (r._2, r._3, r._4)))
        .sortBy(e => (e._1, e._3, e._2)) // (t, tag, tie) — batch order
      var cur: Option[(Long, Long)] = None
      val out = Seq.newBuilder[AsofMatch]
      chain.foreach { case (t, tie, tag) =>
        if (tag == 0) cur = Some((t, tie))
        else out += AsofMatch(tie, k, t, cur.map(_._2), cur.map(_._1))
      }
      cur.foreach { case (t, okey) => state.update(AsofOrder(t, okey)) }
      out.result().iterator
    }
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout())(step)
      .toDF()
  }

  /** Buffered cell rows carried as [[rangeTopkStream]]'s keyed state. */
  case class RjBuf(rows: Seq[graft.operators.Stats.RjIn])

  /** Streaming top-k range join — the streaming twin of
    * `range_join_topk`'s cell sweep (the scale-safe, output-capped
    * variant; `streaming_range_join` already twins the pair-emitting
    * audit form). The batch operator hashes events into
    * [[graft.operators.Stats.RjCellUs]] time cells (probes in a cell's
    * first interval-length duplicated into the predecessor, so every
    * window is locally complete) and sweeps each cell with two monotone
    * pointers + an ordered multiset. Here the CELL IS THE STREAMING
    * STATE KEY: rows buffer per cell, and an interval's exact top-k is
    * emitted the moment the event-time watermark passes its window end
    * (s + 1 h) — at that point the watermark guarantees no in-contract
    * probe for the window can still arrive, so the emission is final
    * (append-mode safe) and runs through the BATCH operator's own
    * [[graft.operators.Stats.sweepCell]], making stream/batch agreement
    * structural rather than re-implemented. State per cell is bounded
    * by the horizon: rows older than one interval length behind the
    * watermark finalize (intervals) or can no longer match a pending or
    * future interval (probes), so they drop; event-time timeouts
    * re-visit a cell when its earliest pending window closes even if no
    * new rows arrive for it. Data later than the watermark is dropped
    * by the engine — the same documented residual as every twin here,
    * closed operationally by batch re-derivation.
    */
  def rangeTopkStream(s: SparkSession, dir: String): DataFrame =
    rangeTopkHitsOf(eventsStream(s, dir)
      .select(col("event_id").as("id"), col("ts"),
        (decp(col("value")) * lit(10000)).cast("long").as("vu"),
        (col("event_type") === "error").as("iv")))

  /** Stateful core of [[rangeTopkStream]] over any (id, ts, vu, iv)
    * event stream — separated so specs can drive EXACT micro-batch
    * boundaries (late probes, watermark-gated finality) through a
    * MemoryStream. Emits the batch sweep's (iv_id, rk, event_id) hits.
    */
  def rangeTopkHitsOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.operators.Stats
    val s = ev.sparkSession
    import s.implicits._
    val C = Stats.RjCellUs
    val RU = Stats.RangeUs
    // same home + predecessor-duplicate mapping as the batch operator
    // (duplicates never open intervals)
    val home = ev.withColumn("cell", expr(s"unix_micros(ts) div ${C}L"))
    val dup = ev.filter(expr(s"unix_micros(ts) % ${C}L") < lit(RU))
      .withColumn("cell", expr(s"unix_micros(ts) div ${C}L") - 1)
      .withColumn("iv", lit(false))
    def step(cell: Long,
        rows: Iterator[(Long, java.time.Instant, Long, Long, Boolean)],
        state: GroupState[RjBuf]): Iterator[Stats.RjHit] = {
      val incoming = rows.map { case (_, ts, id, vu, iv) =>
        Stats.RjIn(cell,
          ts.getEpochSecond * 1000000L + ts.getNano / 1000L, vu, id, iv)
      }.toSeq
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // carried rows sort INTO the batch's (t, id) per-cell order
      val merged = (state.getOption.map(_.rows).getOrElse(Seq.empty)
        ++ incoming).sortBy(r => (r.t, r.id))
      // an interval is FINAL once the watermark passes its window end;
      // its probes are all present (anything still in flight has
      // event time >= watermark >= window end)
      val finalIds =
        merged.collect { case r if r.iv && r.t + RU <= wmUs => r.id }.toSet
      val hits: Iterator[Stats.RjHit] =
        if (finalIds.isEmpty) Iterator.empty
        else Stats.sweepCell(merged.toIndexedSeq)
          .filter(h => finalIds(h.iv_id))
      // retention: a row with t + RU <= watermark is either an emitted
      // interval or a probe no pending/future interval (all with
      // s > wm - RU) can reach — drop both; emitted ids can never
      // re-emit because their rows are exactly the dropped ones
      val keep = merged.filter(_.t + RU > wmUs)
      if (keep.isEmpty) state.remove()
      else {
        state.update(RjBuf(keep))
        // revisit when the earliest kept row expires (ceil to ms; must
        // sit strictly past the current watermark)
        state.setTimeoutTimestamp(
          math.max((keep.map(_.t).min + RU + 999L) / 1000L,
            state.getCurrentWatermarkMs() + 1L))
      }
      hits
    }
    home.unionByName(dup)
      .withWatermark("ts", "1 hour")
      // the WATERMARKED column itself flows into the stateful operator
      .select(col("cell"), col("ts"), col("id"), col("vu"), col("iv"))
      .as[(Long, java.time.Instant, Long, Long, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout())(step)
      .toDF()
  }

  def runToMemory(df: DataFrame, name: String,
      mode: String = "append"): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
