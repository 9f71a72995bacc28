package graft

import graft.operators.{Analytics, Chunking, Curation, Inference, Similarity, StarSchema, TextAnalysis}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the properties §6 promises (pushdown,
  * pruning, broadcast dims) must stay visible in the physical plan.
  */
class PlanQualitySpec extends AnyFunSuite {
  import SharedSpark._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.sparkPlan.toString

  test("q1: shipdate filter pushed into the parquet scan") {
    val p = plan(Analytics.q1(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("q1: scan pruned to referenced columns only") {
    val p = plan(Analytics.q1(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"unpruned scan: $readSchema")
  }

  test("frozen headliners: plan-shape fingerprints match the committed pin") {
    // the machine form of three rounds of "drift was contention, not a
    // plan change" git archaeology: any operator insertion/removal/
    // reorder or join-strategy flip in a headliner's pre-AQE plan at
    // EITHER pinned SF changes its hash and fails here. After an
    // INTENTIONAL change: sbt "runMain graft.tools.PlanFingerprint"
    // and review the resource diff like a plan review.
    val pinned = graft.tools.PlanFingerprint.committed()
    assert(pinned.nonEmpty, "plan_fingerprints.txt missing — regenerate")
    val cur = graft.tools.PlanFingerprint.current(spark)
    // sf1.0 participates only when its (gitignored) data exists; the
    // committed pin may carry sf1.0 rows this checkout cannot re-derive
    val haveSfs = cur.keySet.map(_._1)
    assert(haveSfs.contains("sf0.001") && haveSfs.contains("sf0.1"))
    val pinnedHere = pinned.filter { case ((l, _), _) => haveSfs(l) }
    assert(cur.keySet === pinnedHere.keySet,
      s"headliner set drifted: ${cur.keySet.diff(pinnedHere.keySet)} new, " +
        s"${pinnedHere.keySet.diff(cur.keySet)} gone")
    val drift = cur.filter { case (k, h) => pinnedHere(k) != h }.keys.toSeq
    assert(drift.isEmpty, s"plan shape changed for: ${drift.sorted}")
  }

  // The reference's literal dashboard feeds (Superset KPI cross-tabs):
  // vocab + dim_attr joins must broadcast; the only shuffles allowed are
  // the bridge/fact equi-join on id_offer and the final group-count —
  // a dashboard-path plan regression here is what the ExtraPinned
  // fingerprints make mechanical (VERDICT r11 #7).
  test("skills_by_experience / skills_by_title: bridge broadcast shape") {
    Seq(StarSchema.skillsByExperience _, StarSchema.skillsByTitle _)
      .foreach { q =>
        val p = plan(q(spark, sf))
        assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(2000))
        assert(!p.contains("CartesianProduct"), p.take(2000))
      }
  }

  test("q5: dimension joins broadcast") {
    val p = plan(Analytics.q5(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2000))
  }

  test("fact_star_join: dims broadcast, fact side never shuffles pre-join") {
    val p = plan(StarSchema.factStarJoin(spark, sf))
    // >= 2: the two dim joins, plus Keys.denseIds' tiny offset joins
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("wide_reporting_view: every dim broadcast, one fact scan, no SMJ") {
    val p = plan(StarSchema.wideReportingView(spark, sf))
    // 7 dimension joins (spine, customer, nation, region, prio, stat,
    // escalation) + denseIds' tiny offset joins — all broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 7, p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
    // exactly ONE scan reads the WIDE fact columns; every other orders
    // scan is a 1-column domain read feeding a dim (denseIds re-scans)
    val wideScans = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("orders.parquet") &&
        l.contains("o_totalprice"))
    assert(wideScans === 1, s"$wideScans wide fact scans")
  }

  test("skill extract: vocabulary join broadcast") {
    val p = plan(operators.SkillExtract.skillExtractPhrase(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("sampling reads ids and labels, never document bodies") {
    val p = plan(operators.Curation.sampleStratified(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("text"), s"unpruned scan: $readSchema")
  }

  test("range_join_bucketed: bucket equi-join, never a nested-loop product") {
    val p = plan(operators.Stats.rangeJoinBucketed(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("range_join_bucketed: probe-side fanOut survives on a few-split layout") {
    // §6 rule (measured at the round-12 gate): a broadcast join runs
    // pair PRODUCTION inside the probe SCAN's tasks, so an explosive
    // downstream over a few-split scan serializes — flat sf1.0 ran this
    // query at 48.0 s vs 5.80 s with Tables.fanOut on the narrow probe
    // rows. The repartition is the fix's load-bearing node; this pin
    // keeps a future 'redundant shuffle' cleanup from silently
    // reverting it. (The testdata events file is single-split here, so
    // fanOut MUST fire; on real multi-file layouts it no-ops by design,
    // which is why PlanFingerprint.shape treats it as transparent.)
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val fanOuts = operators.Stats.rangeJoinBucketed(spark, sf)
      .queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[RoundRobinPartitioning] => e
      }
    assert(fanOuts.nonEmpty,
      "probe-side fanOut repartition missing from range_join_bucketed's plan")
  }

  test("documents/embeddings scans: Tables.fanOut survives in a representative consumer each") {
    // PlanFingerprint.shape treats round-robin exchanges as transparent
    // (fanOut is layout-conditional, so hashing it would make the pins
    // host-dependent) — which means the fingerprint can no longer
    // detect the LOSS of a fanOut. The range_join_bucketed pin above
    // covers the events scan; these cover the other two fanOut-backed
    // scans (Tables.documents / Tables.embeddings), so a 'redundant
    // shuffle' cleanup on either is caught mechanically. Same layout
    // caveat: the testdata files are single-split, so fanOut MUST fire
    // here; on multi-file layouts it no-ops by design.
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def fanOuts(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[RoundRobinPartitioning] => e
      }
    assert(fanOuts(operators.TextAnalysis.topTokens(spark, sf)).nonEmpty,
      "documents-scan fanOut missing from top_tokens' plan")
    assert(fanOuts(operators.Dedup.dedupEmbeddingCosine(spark, sf)).nonEmpty,
      "embeddings-scan fanOut missing from dedup_embedding_cosine's plan")
  }

  test("gap_fill_ffill: calendar spine broadcast against the daily agg") {
    val p = plan(operators.Stats.gapFillFfill(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("tfidf: single corpus pass — the df branch reads the tf checkpoint, not parquet") {
    val df = operators.Stats.tfidfTopTerms(spark, sf)
    val p = plan(df)
    // the corpus scan happened ONCE while materializing the tf
    // checkpoint; the final plan (tf scores x df agg) must read the
    // checkpointed rows on both branches and never re-scan documents
    assert(!p.contains("documents.parquet"), s"df branch re-scans the corpus:\n${p.take(2000)}")
    assert(p.contains("ExistingRDD") || p.contains("LogicalRDD"), p.take(2000))
    // and the checkpointed frame carries only (doc_id, term, tf) — the
    // pruning property, enforced structurally
    assert(df.queryExecution.analyzed.collectLeaves()
      .forall(_.output.map(_.name).toSet.subsetOf(Set("doc_id", "term", "tf"))))
  }

  test("source_cosine_matrix: both branches read the tf checkpoint, dims broadcast") {
    val df = TextAnalysis.sourceCosineMatrix(spark, sf)
    val p = plan(df)
    // the (source, tok, count) compaction scanned the corpus ONCE; the
    // norm and dot branches must both read the checkpoint
    assert(!p.contains("documents.parquet"), s"re-scans the corpus:\n${p.take(2000)}")
    assert(p.contains("LogicalRDD") || p.contains("ExistingRDD"), p.take(2000))
    // norm lookups are sources-cardinality: they must broadcast
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("collocation_lift: top-k plans as TakeOrderedAndProject, no global sort") {
    val p = plan(TextAnalysis.collocationLift(spark, sf))
    // the deterministic top-50 must fold per-partition then merge on
    // the driver — a global Sort before the limit would single-task
    // the vocabulary at corpus scale
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("dedup_winnowing: fingerprint equi-join, no unbounded product") {
    val p = plan(operators.Dedup.dedupWinnowing(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // windows partition per document, never one global task
    assert(!p.contains("Window [") || !p.contains("SinglePartition"),
      p.take(2000))
  }

  test("ks_source_matrix: linear CDFs — no range join over the values frame") {
    val df = operators.Curation.ksSourceMatrix(spark, sf)
    val p = plan(df)
    // the per-source step CDFs must come from the two-phase prefix sum
    // (per-(source, bucket) windows + aggregates-only offsets), never a
    // cv <= v join that rescans a source's cells per grid row. The one
    // product is the values×sources grid cross — both sides aggregates
    // (the registry guard's bounded shape), which the residual check
    // below keeps honest
    assert(!p.contains("CartesianProduct"), p.take(2000))
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    df.queryExecution.sparkPlan.foreach {
      case j: BroadcastNestedLoopJoinExec => j.children.foreach { c =>
        assert(c.find(_.isInstanceOf[BaseAggregateExec]).nonEmpty,
          s"non-aggregate product side:\n$c")
      }
      case _ =>
    }
    // no join anywhere carries a <= residual (the old CDF formulation's
    // cv <= v rescan); the only non-equi conditions left are the strict
    // < of the bucket-offset and source-pair joins, both over
    // aggregate-compacted sides
    import org.apache.spark.sql.catalyst.expressions.LessThanOrEqual
    df.queryExecution.optimizedPlan.foreach {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.foreach(c => assert(
          c.collect { case e: LessThanOrEqual => e }.isEmpty,
          s"<= residual in join condition: $c"))
      case _ =>
    }
    // windows partition per (source, bucket), never one global task
    assert(!p.contains("Window [") || !p.contains("SinglePartition"),
      p.take(2000))
  }

  test("slo_burn_rate: trailing-24h window rides a day-bucket equi-join") {
    val p = plan(operators.Temporal.sloBurnRate(spark, sf))
    // the band self-join must key on the exploded day bucket (≤ 48-row
    // fan-in per hour), never scan |span|² via a nested-loop band
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("brand_demand_momentum: part dim broadcast into the fact join") {
    val p = plan(Analytics.brandDemandMomentum(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("hard_negatives_lsh: bucket equi-join like the index it mines from") {
    val p = plan(Similarity.hardNegativesLsh(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("lsh_bucket_stats: one corpus scan, aggregation-only after the signatures") {
    val df = operators.Dedup.lshBucketStats(spark, sf)
    val p = plan(df)
    // the monitor must price like the blocking stage it audits: a single
    // documents scan feeding the signature agg — no self-join, no
    // second corpus pass
    assert(p.split("documents.parquet", -1).length - 1 === 1,
      s"expected exactly one corpus scan:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("asof_join_native: custom exec, no window machinery, no union") {
    val p = plan(operators.Temporal.asofJoinNative(spark, sf))
    assert(p.contains("AsOfJoin"), p.take(2000))
    assert(!p.contains("Window") && !p.contains("Union"), p.take(2000))
  }

  // Queries whose plan legitimately contains a nested-loop/cartesian
  // node, each BOUNDED by construction (never corpus x corpus):
  //  - ann_*: query set hard-capped at 100 / centroids capped at IvfK,
  //    both broadcast
  //  - dedup_embedding_recall: all-pairs ground truth over a subset
  //    hard-capped at EmbRecallCap ids on BOTH sides (Cap² pairs,
  //    corpus-size-independent) — the registered dedup_embedding_cosine
  //    itself is a band equi-join, product-free
  //  - gap_fill_ffill: event-type set x calendar days spine
  //  - token_budget_mix: corpus agg x broadcast 1-row total
  private val BoundedProductQueries = Set(
    "dedup_embedding_recall", "ann_topk_bruteforce", "ann_topk_lsh",
    "ann_topk_ivf", "ann_topk_ivfpq", "ann_recall_lsh", "ann_recall_ivf",
    "ann_recall_pq", "gap_fill_ffill",
    // exact different-label truth for the hard-negative miner: the same
    // hard-capped query broadcast as ann_topk_bruteforce, O(|Q| * N)
    "hard_negatives_recall",
    // corpus x broadcast K=16 centroid argmax (the IVF assignment
    // shape, N x K by construction); the PAIR search itself is the
    // (cluster, bucket) equi-join, never a product
    "dedup_semantic",
    // the same N x K assignment pass, aggregated to K weight rows
    "cluster_balance_weights",
    "token_budget_mix",
    // corpus x broadcast 1-ROW max(doc_id) aggregate — N x 1 by
    // construction (the token_budget_mix shape)
    "vocab_growth_curve",
    // same hard-capped query broadcast as ann_topk_bruteforce (|Q| <=
    // MaxQueries regardless of corpus size), O(|Q| * N) by design
    "knn_label_vote",
    // fact x broadcast 1-ROW bloom blob (an aggregate) — N x 1 by
    // construction; the product exists precisely to avoid a shuffle
    "bloom_join_prune",
    // events x broadcast 1-ROW span midpoint — the same N x 1 shape
    "mcnemar_test",
    // aggregation over knn_label_vote's output — inherits its product
    "knn_confusion_matrix")

  test("no unbounded cartesian/nested-loop join in any registered query") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // a product join input is safe iff it is corpus-free or
    // aggregate-compacted (bounded cardinality regardless of data size)
    // — e.g. Keys.denseIds' bucket-offset self-join joins two tiny
    // aggregates; an all-pairs join over raw rows is not
    def safeSide(p: SparkPlan): Boolean =
      p.find(_.isInstanceOf[BaseAggregateExec]).nonEmpty ||
        !p.toString.contains("Scan parquet")
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!BoundedProductQueries(name)) {
        val prods = fn(spark, sf).queryExecution.sparkPlan.collect {
          case j: BroadcastNestedLoopJoinExec => j.children
          case j: CartesianProductExec => j.children
        }.flatten
        prods.foreach(side => assert(safeSide(side),
          s"$name: product join over a raw corpus-scale input"))
      }
    }
  }

  test("q17: correlated scalar subqueries decorrelate into one aggregate-join") {
    val df = Analytics.q17Correlated(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    // no scalar subquery survives optimization — Catalyst rewrote the
    // per-row subplans into aggregate joins (the only shape that scales:
    // a surviving subquery would rescan lineitem per probe row)
    assert(!opt.contains("scalar-subquery"), opt.take(2000))
    // and the two subqueries (count + sum over the same correlation key)
    // merged into ONE per-part aggregate, so lineitem is aggregated once
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val aggsOnPartkey = df.queryExecution.sparkPlan.collect {
      case a: BaseAggregateExec
        if a.groupingExpressions.exists(_.toString.contains("l_partkey")) => a
    }
    // partial + final of the same merged aggregate = 2 exec nodes
    assert(aggsOnPartkey.size <= 2,
      s"per-part subquery aggregates did not merge: ${aggsOnPartkey.size}")
  }

  test("q21: EXISTS/NOT EXISTS decorrelate into semi/anti joins") {
    val df = Analytics.q21WaitingSupplier(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("exists-subquery") && !opt.contains("Exists("),
      opt.take(2000))
    assert(opt.contains("LeftSemi") && opt.contains("LeftAnti"),
      s"predicate subqueries did not decorrelate:\n${opt.take(2000)}")
  }

  test("q4/q18: EXISTS and IN-over-HAVING decorrelate into semi joins") {
    for (df <- Seq(Analytics.q4PriorityReturns(spark, sf),
        Analytics.q18LargeOrders(spark, sf))) {
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.contains("exists-subquery") && !opt.contains("list-subquery"),
        opt.take(2000))
      assert(opt.contains("LeftSemi"),
        s"predicate subquery did not decorrelate:\n${opt.take(2000)}")
    }
  }

  test("q13: the status filter stays in the outer join's ON clause") {
    val df = Analytics.q13OrderDistribution(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    // the join must remain LeftOuter (a filter pushed to WHERE would
    // flip it inner and silently drop zero-order customers), and the
    // status predicate must sit on the orders side BELOW the join so
    // the scan prefilters, not a post-join Filter faking outer semantics
    import org.apache.spark.sql.catalyst.plans.LeftOuter
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val outer = opt.collect { case j: Join if j.joinType == LeftOuter => j }
    assert(outer.size == 1, s"expected one LeftOuter join:\n${opt.toString.take(2000)}")
    assert(outer.head.right.toString.contains("o_orderstatus"),
      s"status filter did not stay on the orders build side:\n${opt.toString.take(2000)}")
  }

  test("q22: scalar average evaluates once; NOT EXISTS becomes an anti join") {
    val df = Analytics.q22DormantBalance(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("LeftAnti"),
      s"NOT EXISTS did not decorrelate:\n${opt.take(2000)}")
    // the average is uncorrelated: it must survive as a SINGLE scalar
    // subquery (computed once, broadcast into the filter), never a
    // per-row correlated probe
    assert("scalar-subquery".r.findAllIn(opt).size <= 1, opt.take(2000))
    assert(!opt.contains("exists-subquery"), opt.take(2000))
  }

  test("q2: the join-bearing correlated scalar subquery decorrelates") {
    val df = Analytics.q2MinCostSupplier(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    // the min-subplan CONTAINS its own 4-way join chain — Catalyst must
    // still rewrite it into one per-part aggregate joined back, never a
    // per-probe-row re-run of the join chain
    assert(!opt.contains("scalar-subquery"), opt.take(2000))
  }

  test("q15: the view max evaluates as one uncorrelated scalar") {
    val df = Analytics.q15TopSupplier(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    // uncorrelated: exactly one scalar subquery node (computed once,
    // broadcast into the filter), never a correlated per-row probe
    assert("scalar-subquery".r.findAllIn(opt).size <= 1, opt.take(2000))
  }

  test("q6: all three predicates push to the lineitem scan") {
    val df = Analytics.q6(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters"), phys.take(2000))
    // date + quantity + discount bounds all reach the parquet reader
    for (c <- Seq("l_shipdate", "l_quantity", "l_discount"))
      assert(phys.replaceAll("ReadSchema.*", "").contains(c),
        s"$c missing from pushed filters:\n${phys.take(2000)}")
  }

  test("q20: both stacked rewrites fire — scalar decorrelates, IN becomes LeftSemi") {
    val df = Analytics.q20DominantSupplier(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    // inner correlated scalar → per-part aggregate join (no surviving
    // scalar-subquery), outer IN → LeftSemi (no surviving list-subquery)
    assert(!opt.contains("scalar-subquery"), opt.take(2000))
    assert(!opt.contains("list#"), opt.take(2000))
    assert(opt.contains("LeftSemi"), opt.take(2000))
  }

  test("q16: the NOT IN exclusion plans as an anti join") {
    val df = Analytics.q16SupplierPartCount(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("LeftAnti"), opt.take(2000))
  }

  test("q11: the view threshold evaluates as uncorrelated scalars, no correlation") {
    val df = Analytics.q11ImportantValue(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    // COUNT and SUM over the view are broadcast scalars computed once —
    // a correlated rewrite would show a per-row aggregate join instead
    assert("scalar-subquery".r.findAllIn(opt).size <= 2, opt.take(2000))
    assert(!opt.contains("Exists"), opt.take(2000))
  }

  test("q8/q9: every dimension broadcasts — only lineitem x orders shuffles") {
    for ((df, minBroadcasts) <- Seq(
        Analytics.q8(spark, sf) -> 4, // part, customer(x nation x region), supplier(x nation)
        Analytics.q9(spark, sf) -> 3)) { // part, supplier, nation
      val p = plan(df)
      assert("BroadcastHashJoin".r.findAllIn(p).size >= minBroadcasts,
        p.take(2000))
      // at most the single fact-fact join may shuffle
      assert("SortMergeJoin".r.findAllIn(p).size <= 1, p.take(2000))
    }
  }

  test("q12: fact filter sits below the join; one join, one aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = Analytics.q12ShipPriority(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collect { case j: Join => j }.size == 1)
    assert(opt.collect { case a: Aggregate => a }.size == 1)
    // the returnflag + date predicates must reach the lineitem scan
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters"), phys.take(2000))
    for (c <- Seq("l_returnflag", "l_shipdate"))
      assert(phys.replaceAll("ReadSchema.*", "").contains(c),
        s"$c missing from pushed filters:\n${phys.take(2000)}")
  }

  test("doc_signals_fused: five signal families in one scan, no joins or aggs") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = TextAnalysis.docSignalsFused(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    // the fused pass must stay a pure projection pipeline: separate
    // signal queries each rescan the corpus; any Join/Aggregate here
    // means the fusion silently decomposed
    assert(opt.collect { case j: Join => j }.isEmpty,
      s"fused signals plan contains a join:\n${opt.toString.take(2000)}")
    assert(opt.collect { case a: Aggregate => a }.isEmpty,
      s"fused signals plan contains an aggregate:\n${opt.toString.take(2000)}")
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected one documents scan, got $scans:\n${plan.take(2000)}")
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // at 100 TB a selectively-filtered dim joined to a fact over a
    // shuffle should ship only fact rows that can match: Spark's
    // runtime bloom-filter injection builds a bloom from the filtered
    // side and applies might_contain to the fact scan. Local datasets
    // sit under the 10 GB application-side default, so the spec lowers
    // the threshold to observe the mechanism.
    val conf = spark.conf
    val prevB = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val thrKey =
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val prevT = conf.get(thrKey)
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set(thrKey, "0")
      val li = graft.sources.Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity")
      val ord = graft.sources.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"no runtime bloom filter injected:\n${p.take(2000)}")
      assert(j.count() > 0)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      conf.set(thrKey, prevT)
    }
  }

  test("no unpartitioned (single-task) window in any registered query") {
    import org.apache.spark.sql.execution.window.WindowExec
    SparkEntry.queries.foreach { case (name, fn) =>
      val bad = fn(spark, sf).queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$name plans a global window — every row funnels through one task")
    }
  }

  test("sample_bottomk plans TakeOrderedAndProject, never a global sort") {
    val p = Curation.sampleBottomK(spark, sf).queryExecution
      .executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      "bottom-k lost its per-partition top-k plan")
  }

  test("kendall_tau: cell-pair joins broadcast with the range predicate riding them") {
    val p = Inference.kendallTau(spark, sf).queryExecution
      .executedPlan.toString
    // the nc/nd joins must be flag-keyed BroadcastHashJoins whose
    // extra condition is the (x, y) ordering — a cartesian or a
    // row-level self-join here would be the n² trap
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("chunking scans read only doc_id and text, never lang/source") {
    val p = plan(Chunking.chunkDocuments(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"unpruned scan: $readSchema")
  }

  test("chunk_dedup_exact: map-side combine (partial min/count before the shuffle)") {
    val p = plan(Chunking.chunkDedupExact(spark, sf))
    assert(p.contains("partial_min") || p.contains("partial min"),
      "argmin agg lost its partial (map-side) phase")
    import org.apache.spark.sql.execution.window.WindowExec
    assert(Chunking.chunkDedupExact(spark, sf).queryExecution.sparkPlan
      .collect { case w: WindowExec => w }.isEmpty,
      "dedup should be pure aggregation, not a window")
  }

  test("embedding_centroids: partial sums before the (label, pos) shuffle") {
    val p = plan(Similarity.embeddingCentroids(spark, sf))
    assert(p.contains("partial_sum"), "centroid sums lost map-side combine")
  }

  test("jonckheere_terpstra: linear CDFs — no <= residual over the value frame") {
    val df = operators.Inference.jonckheereTerpstra(spark, sf)
    // the per-group step CDFs ride the source-partitioned prefix sum
    // (the ks_source_matrix discipline keyed by priority); a U_ij via
    // pairwise value comparison would surface as a <= join residual
    // rescanning a group's cells per row
    import org.apache.spark.sql.catalyst.expressions.LessThanOrEqual
    df.queryExecution.optimizedPlan.foreach {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.foreach(c => assert(
          c.collect { case e: LessThanOrEqual => e }.isEmpty,
          s"<= residual crept into a JT join: $c"))
      case _ =>
    }
    assert(!plan(df).contains("CartesianProduct"))
  }

  test("silhouette_simplified: centroid side broadcasts, no product") {
    val p = plan(Similarity.silhouetteSimplified(spark, sf))
    // the labels×dims centroid frame is tiny by construction — the
    // per-dimension join must be a broadcast, never a shuffle of the
    // exploded corpus against it (or worse, a nested-loop product)
    assert(p.contains("BroadcastHashJoin"), "centroid join lost broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }
}
