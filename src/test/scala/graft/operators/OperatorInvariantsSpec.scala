package graft.operators

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the dedup/similarity/temporal operators that
  * the hash-compare oracle cannot express (the oracle proves parity;
  * these prove the parity target means what it claims).
  */
class OperatorInvariantsSpec extends AnyFunSuite {
  import SharedSpark._

  test("dedup_exact_hash partitions the corpus: copies sum to doc count") {
    val total = Dedup.dedupExactHash(spark, sf)
      .agg(sum(col("n_copies"))).head.getLong(0)
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(total === docs)
  }

  test("winnowing: coverage guarantee meets shared runs; corpus stats bounded") {
    import spark.implicits._
    // two docs sharing a 16-token run (≫ w+k−1 = 6) with different
    // surroundings MUST share fingerprints and meet in the pair stage
    val run = (1 to 16).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 $run"),
      (2L, s"b1 b2 b3 b4 b5 b6 $run b7 b8"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")).toDF("doc_id", "text")
      .localCheckpoint()
    val pairs = Dedup.dedupWinnowingFrom(Dedup.winnowFrom(docs)).collect()
    assert(pairs.length === 1)
    assert((pairs.head.getAs[Long]("a"), pairs.head.getAs[Long]("b")) ===
      ((1L, 2L)))
    assert(pairs.head.getAs[Long]("n_shared") >= Dedup.WinnowMinShared)
    // a doc shorter than one window still fingerprints (global min)
    val short = Dedup.winnowFrom(Seq((9L, "t1 t2")).toDF("doc_id", "text"))
    assert(short.count() === 1)
    // corpus profile: selection is a subset of the k-gram positions and
    // the expected-density 2/(w+1) heuristic is the right order
    val prof = Dedup.fingerprintWinnowing(spark, sf).collect()
    assert(prof.nonEmpty)
    prof.foreach { r =>
      val (nk, nf) = (r.getAs[Long]("n_kgrams"),
        r.getAs[Long]("n_fingerprints"))
      assert(nf >= 1L && nf <= nk)
      assert(r.getAs[Double]("density") === nf.toDouble / nk.toDouble)
    }
    val meanDensity = prof.map(_.getAs[Double]("density")).sum / prof.length
    assert(meanDensity > 0.1 && meanDensity <= 1.0)
  }

  test("ngram novelty: novel mass = distinct k-gram vocabulary, rates in (0,1]") {
    import graft.functions.Text
    val rows = TextAnalysis.ngramNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("novelty_rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_ngrams"))
    }
    // each distinct k-gram's first occurrence is counted exactly once
    val vocab = graft.sources.Tables.documents(spark, sf)
      .select(explode(array_distinct(Text.wordShingles(
        Text.toks(col("text")), TextAnalysis.NoveltyWidth))).as("sh"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_novel")).sum === vocab)
  }

  test("cohen kappa agrees with lang_id_ngram's confusion diagonal") {
    val conf = TextAnalysis.langIdNgram(spark, sf).collect()
    val diag = conf.filter(r =>
      r.getAs[String]("lang") === r.getAs[String]("pred_lang"))
      .map(_.getAs[Long]("n_docs")).sum
    val total = conf.map(_.getAs[Long]("n_docs")).sum
    val k = TextAnalysis.cohenKappa(spark, sf).head
    assert(k.getAs[Long]("n_agree") === diag)
    assert(k.getAs[Long]("n_docs") === total)
    val (po, pe) = (k.getAs[Double]("po"), k.getAs[Double]("pe"))
    assert(po >= 0.0 && po <= 1.0 && pe > 0.0 && pe < 1.0)
    // kappa ≤ 1 always; equals (po−pe)/(1−pe) up to float re-association
    assert(math.abs(k.getAs[Double]("kappa") - (po - pe) / (1.0 - pe))
      < 1e-12)
  }

  test("ks source matrix: all pairs present, one pair equals a direct sweep") {
    val rows = Curation.ksSourceMatrix(spark, sf).collect()
    val nSources = graft.sources.Tables.documents(spark, sf)
      .select("source").distinct().count().toInt
    assert(rows.length === nSources * (nSources - 1) / 2)
    rows.foreach { r =>
      val d = r.getAs[Double]("d_stat")
      assert(d >= 0.0 && d <= 1.0)
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
    // exactness: recompute the first pair's D from raw lengths
    val first = rows.head
    val (sa, sb) = (first.getAs[String]("source_a"),
      first.getAs[String]("source_b"))
    val lens = graft.sources.Tables.documents(spark, sf)
      .filter(col("source").isin(sa, sb))
      .select("source", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val (la, lb) = (lens.filter(_._1 == sa).map(_._2).sorted,
      lens.filter(_._1 == sb).map(_._2).sorted)
    val union = (la ++ lb).distinct.sorted
    val dNum = union.map(v =>
      math.abs(la.count(_ <= v).toLong * lb.length -
        lb.count(_ <= v).toLong * la.length)).max
    assert(first.getAs[Double]("d_stat") ===
      dNum.toDouble / (la.length.toLong * lb.length).toDouble)
  }

  test("brand momentum: full spine per brand, mass preserved, slopes finite") {
    val rows = Analytics.brandDemandMomentum(spark, sf).collect()
    assert(rows.nonEmpty)
    // the zero-filled spine gives every brand the same month count ≥ 2
    val monthCounts = rows.map(_.getAs[Long]("n_months")).toSet
    assert(monthCounts.size === 1 && monthCounts.head >= 2L)
    // zero-filling adds zeros only: total mass equals the raw corpus sum
    val direct = graft.sources.Tables.lineitem(spark, sf)
      .agg(sum(col("l_quantity").cast("decimal(14,4)")).cast("double"))
      .head.getDouble(0)
    val total = rows.map(_.getAs[Double]("total_qty")).sum
    assert(math.abs(total - direct) / direct < 1e-9)
    rows.foreach { r =>
      val sl = r.getAs[Double]("slope")
      assert(!sl.isNaN && !sl.isInfinite)
    }
  }

  test("hard negatives: labels differ, ranked within bucket, ≤ k per anchor") {
    val rows = Similarity.hardNegativesLsh(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("q_label") !== r.getAs[Int]("label"))
      assert(r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 3)
      val c = r.getAs[Double]("cos_sim")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    // per anchor: ranks are 1..m without gaps and similarity descends
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq ===
        (1 to sorted.length).toSeq)
      val sims = sorted.map(_.getAs[Double]("cos_sim")).toSeq
      assert(sims === sims.sorted.reverse)
    }
  }

  test("funnel windowed: cohorts partition converting-view users, rates in [0,1]") {
    val rows = Temporal.funnelWindowed(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (u, c) = (r.getAs[Long]("n_users"), r.getAs[Long]("n_converted"))
      assert(c >= 0L && c <= u)
      assert(r.getAs[Double]("conv_rate") === c.toDouble / u.toDouble)
    }
    // cohort weeks partition exactly the users who ever viewed
    val viewers = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum === viewers)
    // windowed conversions are a subset of unbounded conversions
    val unbounded = Temporal.timeToConvert(spark, sf)
      .filter(col("converted")).count()
    assert(rows.map(_.getAs[Long]("n_converted")).sum <= unbounded)
  }

  test("dedup_minhash_lsh pairs are ordered, verified above tau") {
    val rows = Dedup.dedupMinhashLsh(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val jac = r.getAs[Double]("jac")
      assert(jac >= 0.5 && jac <= 1.0)
      val inter = r.getAs[Long]("n_inter")
      assert(inter <= math.min(r.getAs[Long]("na"), r.getAs[Long]("nb")))
    }
  }

  test("dedup_prefix_filter equals naive all-pairs exact Jaccard (zero false negatives)") {
    import graft.functions.Text.{toks, wordShingles}
    val out = Dedup.dedupPrefixFilter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth by definition: collected shingle sets, all pairs
    val sets = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(wordShingles(toks(col("text")), 3)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val naive = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      if inter.toDouble / (sa.size + sb.size - inter) >= 0.5
    } yield (a, b)).toSet
    assert(out === naive)
    // the LSH pipeline approximates this exact set from below
    val lsh = Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(out))
  }

  test("dedup_source_matrix: canonical cells whose counts sum to the pair total") {
    val cells = Dedup.dedupSourceMatrix(spark, sf).collect()
    val totalPairs = Dedup.dedupMinhashLsh(spark, sf).count()
    assert(cells.map(_.getLong(2)).sum === totalPairs)
    cells.foreach(r => assert(r.getString(0) <= r.getString(1)))
    assert(cells.map(r => (r.getString(0), r.getString(1))).distinct.length
      === cells.length)
  }

  test("negative_samples: k per anchor, never self, in range, deterministic") {
    val out = Curation.negativeSamples(spark, sf).collect()
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(out.length === n * Curation.NNeg)
    out.foreach { r =>
      assert(r.getLong(2) !== r.getLong(0), s"self-negative in $r")
      assert(r.getLong(2) >= 0L && r.getLong(2) < n)
    }
    val again = Curation.negativeSamples(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("negative_samples_keyed: k valid corpus members per anchor, no dense-id assumption") {
    val out = Curation.negativeSamplesKeyed(spark, sf).collect()
    val ids = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.length === ids.size * Curation.NNeg)
    out.foreach { r =>
      assert(r.getLong(2) !== r.getLong(0), s"self-negative in $r")
      // negatives are real corpus KEYS (ring positions resolved back),
      // not raw ring arithmetic — the property the keyed route adds
      assert(ids.contains(r.getLong(2)), s"negative not in corpus: $r")
    }
    // each anchor draws NNeg distinct js in order
    out.grouped(Curation.NNeg).foreach { g =>
      assert(g.map(_.getLong(1)).toSeq === (0L until Curation.NNeg.toLong))
      assert(g.map(_.getLong(0)).distinct.length === 1)
    }
  }

  test("quality_compression_ratio: repetition compresses, prose doesn't, determinism holds") {
    import spark.implicits._
    val probe = Seq(
      1L -> ("lorem " * 400),
      2L -> (1 to 400).map(i => s"w${i * 2654435761L % 9973}").mkString(" "))
      .toDF("doc_id", "text")
    val r = probe.select(col("doc_id"),
      expr("graft_deflate_len(text)").cast("double")
        ./(octet_length(col("text")).cast("double")).as("ratio"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) < 0.05, s"pure repetition should crush: ${r(1L)}")
    assert(r(2L) > r(1L) * 5, s"varied text should compress far less: $r")

    val out = TextAnalysis.qualityCompressionRatio(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { row =>
      assert(row.getInt(2) > 0 && row.getInt(1) > 0)
      assert(row.getDouble(3) > 0.0 && row.getDouble(3) < 2.0)
    }
    val again = TextAnalysis.qualityCompressionRatio(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("ewma_smooth: matches the 16-tap reference recursion exactly, one window pass") {
    val out = Temporal.ewmaSmooth(spark, sf).collect()
    assert(out.nonEmpty)
    // reference: truncated EWMA recomputed per row from raw history
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val xs = rows.map(_.getLong(2))
      rows.zipWithIndex.foreach { case (r, t) =>
        val expect = (0 until 16).map { k =>
          (if (t - k >= 0) xs(t - k).toDouble else 0.0) / math.pow(2.0, k + 1)
        }.sum
        // exact dyadic arithmetic: equality, not tolerance
        assert(r.getDouble(3) === expect, s"row $t of user ${r.getLong(1)}")
      }
    }
    val plan = Temporal.ewmaSmooth(spark, sf)
      .queryExecution.executedPlan.toString
    // 16 lags share one window spec -> a single WindowExec
    assert(plan.split("\\bWindow\\b").length - 1 <= 2, plan.take(1500))
  }

  test("contrastive_pairs: labels partition cleanly, no pair is both pos and neg") {
    val out = Curation.contrastivePairs(spark, sf).collect()
    val pos = out.filter(_.getInt(2) === 1)
    val neg = out.filter(_.getInt(2) === 0)
    assert(pos.nonEmpty && neg.nonEmpty)
    assert(pos.length + neg.length === out.length)
    // positives carry their Jaccard as a soft target; negatives are 0
    pos.foreach(r => assert(r.getDouble(3) > 0.0))
    neg.foreach(r => assert(r.getDouble(3) === 0.0))
    // canonical orientation and disjointness of the two label sets
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    out.foreach(r => assert(r.getLong(0) < r.getLong(1)))
    assert(pos.map(key).toSet.intersect(neg.map(key).toSet).isEmpty)
    // the anti-join actually bounds mislabels: every positive pair of
    // the LSH list survives into the table
    assert(pos.length === Dedup.dedupMinhashLsh(spark, sf).count())
  }

  test("dedup_keep_policy: exactly one survivor per cluster, and it is the best one") {
    val out = Dedup.dedupKeepPolicy(spark, sf).collect()
    assert(out.nonEmpty)
    val stats = TextAnalysis.textQualityScore(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (Map("good" -> 2, "ok" -> 1).getOrElse(r.getString(6), 0),
          r.getInt(2))).toMap
    out.groupBy(_.getLong(1)).foreach { case (_, members) =>
      val kept = members.filter(_.getBoolean(3))
      assert(kept.length === 1, s"cluster without exactly one survivor")
      val k = kept.head
      // survivor maximizes (quality tier, n_tokens), ties to smaller id
      def key(r: org.apache.spark.sql.Row) = {
        val (t, n) = stats(r.getLong(0)); (t, n, -r.getLong(0))
      }
      members.foreach { m =>
        assert(Ordering[(Int, Int, Long)].lteq(key(m), key(k)),
          s"member $m outranks survivor $k")
        // every member maps to the cluster's kept representative
        assert(m.getLong(4) === k.getLong(0))
      }
    }
    // scope: exactly the clustered docs (the drop/remap list for them)
    assert(out.length === Dedup.dedupClusters(spark, sf).count())
  }

  test("dataset_kfold: every doc in exactly one fold, folds near-uniform, independent of split") {
    val out = Curation.datasetKfold(spark, sf).collect()
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(out.length === n)
    val sizes = out.groupBy(_.getInt(2)).view.mapValues(_.length).toMap
    assert(sizes.keySet === (0 until Curation.KFolds).toSet)
    val ideal = n.toDouble / Curation.KFolds
    sizes.values.foreach(c =>
      assert(math.abs(c - ideal) < ideal * 0.3, s"imbalanced folds: $sizes"))
    // distinct salt: fold must not be a function of the train/test split
    val split = Curation.datasetSplitHash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val crossed = out.groupBy(_.getInt(2)).values.map(g =>
      g.map(r => split(r.getLong(0))).toSet.size)
    assert(crossed.forall(_ > 1), "folds aligned with the split salt")
  }

  test("skill_association: scores bounded and consistent with raw counts") {
    val out = TextAnalysis.skillAssociation(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n <= math.min(na, nb), s"pair count exceeds a member count: $r")
      val cos = r.getDouble(5)
      assert(cos > 0.0 && cos <= 1.0, s"cosine out of range: $r")
      assert(cos === n.toDouble / math.sqrt(na.toDouble * nb.toDouble))
      // lift > 1 means the pair co-occurs MORE than independence predicts
      assert(r.getDouble(6) > 0.0)
    }
    // ordering: cosine descending
    val cosines = out.map(_.getDouble(5)).toSeq
    assert(cosines === cosines.sorted(Ordering[Double].reverse))
  }

  test("dedup_incremental: batch scope exact, matches point into the store, fp semantics hold") {
    val out = Dedup.dedupIncremental(spark, sf).collect()
    val ids = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val cut = (ids.min + ids.max) / 2
    assert(out.map(_.getLong(0)).toSet === ids.filter(_ >= cut).toSet)
    val fps = TextAnalysis.docFingerprint(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    out.foreach { r =>
      if (r.getBoolean(1)) {
        val dupOf = r.getLong(2)
        assert(dupOf < cut, s"match outside the store: $r")
        assert(fps(dupOf) === fps(r.getLong(0)),
          s"flagged dup without equal fingerprints: $r")
      } else assert(r.isNullAt(2))
    }
    // ground truth: a batch doc is flagged iff some store doc shares its fp
    val storeFps = fps.filter(_._1 < cut).values.toSet
    out.foreach(r =>
      assert(r.getBoolean(1) === storeFps.contains(fps(r.getLong(0)))))
  }

  test("revenue_share: shares in (0,1], sum to 1 per region, proportional to revenue") {
    val out = Analytics.revenueShare(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (region, rows) =>
      val shares = rows.map(_.getDouble(3))
      shares.foreach(x => assert(x > 0.0 && x <= 1.0))
      assert(math.abs(shares.sum - 1.0) < 1e-9, s"$region shares: ${shares.sum}")
      val total = rows.map(_.getDouble(2)).sum
      rows.foreach(r =>
        assert(math.abs(r.getDouble(3) - r.getDouble(2) / total) < 1e-9))
    }
  }

  test("dedup_containment dominates Jaccard on the same candidates") {
    val jac = Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jac")).toMap
    val rows = Dedup.dedupContainment(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val c = r.getAs[Double]("containment")
      assert(c >= 0.5 && c <= 1.0)
      assert(r.getAs[Long]("n_inter") <=
        math.min(r.getAs[Long]("na"), r.getAs[Long]("nb")))
      // containment >= jaccard always (min-normalized vs union-normalized)
      jac.get(key).foreach(j => assert(c >= j))
    }
    // every Jaccard-admitted pair is containment-admitted (tau_c <= tau_j)
    jac.keys.foreach(k => assert(rows.exists(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) == k)))
  }

  test("dedup_editdist: verified distances are tiny and symmetric-safe") {
    val rows = Dedup.dedupEditDistance(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val rel = r.getAs[Double]("rel_dist")
      assert(rel >= 0.0 && rel <= 0.1)
      assert(r.getAs[Int]("dist") >= 0)
    }
  }

  test("quality_repetition: fractions bounded, flag matches its inputs") {
    val rows = TextAnalysis.qualityRepetition(spark, sf).collect()
    assert(rows.nonEmpty)
    var flagged = 0
    rows.foreach { r =>
      val tf = r.getAs[Double]("top_tok_frac")
      val bf = r.getAs[Double]("dup_bigram_frac")
      assert(tf > 0.0 && tf <= 1.0 && bf >= 0.0 && bf < 1.0)
      assert(r.getAs[Long]("top_tok_cnt") <= r.getAs[Long]("n_tokens"))
      val expect = tf > 0.14 || bf > 0.065
      assert(r.getAs[Boolean]("repetitive") === expect)
      if (expect) flagged += 1
    }
    // thresholds sit at the corpus p90: the flag must neither be empty
    // nor fire on everything
    assert(flagged > 0 && flagged < rows.length)
  }

  test("sample_quality_weighted: rates ordered good >= ok >= low, good kept fully") {
    val quality = TextAnalysis.textQualityScore(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("quality")).toMap
    val kept = Curation.sampleQualityWeighted(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("quality")).toMap
    assert(kept.nonEmpty)
    // the sampler's inline quality recomputation must agree with the
    // registered quality operator
    kept.foreach { case (id, q) => assert(quality(id) === q) }
    val totals = quality.values.groupBy(identity).view.mapValues(_.size)
    val keptBy = kept.values.groupBy(identity).view.mapValues(_.size)
    def rate(q: String): Double =
      keptBy.getOrElse(q, 0).toDouble / totals.getOrElse(q, 1).toDouble
    assert(rate("good") === 1.0) // ffff threshold admits everything
    if (totals.getOrElse("ok", 0) >= 20)
      assert(rate("ok") > 0.3 && rate("ok") < 0.7)
    assert(rate("good") >= rate("ok") && rate("ok") >= rate("low"))
  }

  test("export_shards: all 16 shards hit, mass conserved, balanced") {
    val rows = Curation.exportShards(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("shard")).toSet === (0 until 16).toSet)
    val nDocs = rows.map(_.getAs[Long]("n_docs"))
    assert(nDocs.sum === graft.sources.Tables.documents(spark, sf).count())
    // uniform hash digit: no shard more than 3x the smallest at n=500
    assert(nDocs.max <= 3 * nDocs.min, s"unbalanced: ${nDocs.toSeq}")
  }

  test("constraint_check passes the clean corpus and counts injected violations") {
    val spark2 = spark
    import spark2.implicits._
    val clean = DataQuality.constraintCheck(spark, sf).collect()
    assert(clean.length === 5)
    clean.foreach { r =>
      assert(r.getAs[Boolean]("passed"), r.getAs[String]("constraint"))
      assert(r.getAs[Long]("violations") === 0L)
    }
    // corrupt frame: one null id, one duplicate id, one bad lang, one
    // inconsistent n_chars, one empty text (rows engineered so each
    // violation is independent)
    val bad = Seq(
      (Option(1L), "abc", "en", 3L),
      (Option(1L), "abcd", "en", 4L),      // duplicate doc_id
      (Option.empty[Long], "xy", "en", 2L), // null doc_id
      (Option(2L), "hello", "xx", 5L),      // lang outside domain
      (Option(3L), "hey", "fr", 99L),       // n_chars inconsistent
      (Option(4L), "", "de", 0L))           // empty text
      .toDF("doc_id", "text", "lang", "n_chars")
    val viols = DataQuality.constraintCheckDf(bad).collect()
      .map(r => r.getAs[String]("constraint") ->
        r.getAs[Long]("violations")).toMap
    assert(viols("doc_id_not_null") === 1L)
    assert(viols("doc_id_unique") === 1L)
    assert(viols("lang_in_domain") === 1L)
    assert(viols("n_chars_consistent") === 1L)
    assert(viols("text_nonempty") === 1L)
    assert(DataQuality.constraintCheckDf(bad).collect()
      .forall(!_.getAs[Boolean]("passed")))
  }

  test("key_candidate_profile: verdicts match the generator's key structure") {
    val out = DataQuality.keyCandidateProfile(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6))).toMap
    // true keys
    assert(out(("orders", "o_orderkey"))._5, "o_orderkey must be a key")
    assert(out(("documents", "doc_id"))._5, "doc_id must be a key")
    // FKs are never keys (orders fan out over 1/10th the customers)
    assert(!out(("orders", "o_custkey"))._5)
    assert(!out(("lineitem", "l_orderkey"))._5)
    // internal consistency: dup_rows = n_nonnull - n_distinct and the
    // is_key verdict is exactly the (complete AND all-distinct) predicate
    out.values.foreach { case (n, nn, nd, dup, isKey) =>
      assert(dup === nn - nd)
      assert(isKey === (nn == n && nd == n))
    }
  }

  test("ri_orphan_audit: clean star edges report zero, injected orphans counted") {
    import spark.implicits._
    // the generated star schema is referentially clean by construction
    DataQuality.riOrphanAudit(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) === 0L, s"${r.getString(0)} reported orphans")
      assert(r.getLong(3) === 0L)
    }
    // constructed edge: children 1,1,2,7,7,9 against parents {1,2,3} ->
    // 3 orphan rows (7,7,9) over 2 distinct orphan keys
    val child = Seq(1L, 1L, 2L, 7L, 7L, 9L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val row = DataQuality.edgeAudit("t.fk->p", child, "fk",
      parent, "pk", bcast = true).collect().head
    assert(row.getLong(1) === 6L)
    assert(row.getLong(2) === 3L)
    assert(row.getLong(3) === 2L)
  }

  test("incremental dedup equals the full-corpus run restricted to new docs") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf)
    val split = 250L
    val hist = Dedup.signatureStore(docs.filter(col("doc_id") < split))
    val fresh = Dedup.signatureStore(docs.filter(col("doc_id") >= split))
    val all = Dedup.signatureStore(docs)

    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("est_jac")).toMap

    // batching must not change which pairs fire: the incremental run
    // (new batch vs persisted history) equals the full run restricted
    // to pairs touching a new doc (doc_b >= split: ids order the batch)
    val full = pairs(Dedup.dedupIncremental(all, all.filter(lit(false))))
    val inc = pairs(Dedup.dedupIncremental(fresh, hist))
    assert(inc.nonEmpty)
    assert(inc === full.filter { case ((_, b), _) => b >= split })
    inc.values.foreach(j => assert(j >= 0.5 && j <= 1.0))

    // every strongly-similar exact pair is found by the estimator
    // (est err ~0.1 at k=16, so only assert well-above-threshold pairs)
    Dedup.dedupMinhashLsh(spark, sf).collect()
      .filter(r => r.getAs[Double]("jac") >= 0.7)
      .foreach { r =>
        val k = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
        assert(full.contains(k), s"strong pair $k missed")
      }
  }

  test("dedup_clusters: endpoints co-clustered, survivor is the min id") {
    val pairs = Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_survivor"))).toMap
    assert(clusters.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 === clusters(b)._1, s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min === cid, s"cluster $cid not labeled by its min id")
      members.foreach { case (doc, (_, surv)) =>
        assert(surv === (doc == cid))
      }
    }
  }

  test("dedup_simhash hamming respects the threshold") {
    Dedup.dedupSimhash(spark, sf).collect().foreach { r =>
      assert(r.getAs[Int]("hamming") >= 0 && r.getAs[Int]("hamming") <= 3)
    }
  }

  test("dedup_embedding_cosine pairs sit in [tau, 1]") {
    Dedup.dedupEmbeddingCosine(spark, sf).collect().foreach { r =>
      val c = r.getAs[Double]("cos_sim")
      assert(c >= 0.4 && c <= 1.0 + 1e-12)
    }
  }

  test("embBucketCap: dense buckets degrade to exact-signature matching") {
    import spark.implicits._
    // planted corpus: 300 exact clones of one base vector saturate
    // their 8 band buckets far past the default cap (256); a noise-1e-3
    // twin pair rides the same sign pattern. The dense branch (full-
    // signature equality) must keep the clone cluster FULLY connected
    // — the 100 TB over-density case is clone mass, and clones share
    // every plane sign — while the all-pairs branch and the dense
    // branch agree wherever both could apply.
    val rnd = new scala.util.Random(11L)
    def vec(): Array[Float] =
      Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    val b0 = vec()
    val t = vec()
    val tTwin = t.map(x => x + ((rnd.nextDouble() * 2 - 1) * 0.001).toFloat)
    val rows = (0L until 300L).map(i => (i, b0)) ++
      Seq(1000L -> t, 1001L -> tTwin)
    val dir = java.nio.file.Files.createTempDirectory("embcap").toString
    rows.toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def pairs(cfg: SimilarityConfig) =
      Dedup.dedupEmbeddingCosine(spark, dir, cfg).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs(SimilarityConfig.Default) // cap 256 binds: buckets hold 300+
    val uncapped = pairs(SimilarityConfig(embBucketCap = 1000000))
    // clone cluster fully connected through the DENSE branch
    assert(capped.count { case (a, b) => a < 300L && b < 300L } ===
      300 * 299 / 2)
    assert(capped.contains((1000L, 1001L)))
    // identical signatures mean the cap loses nothing on this corpus
    assert(capped === uncapped)
    // cap=1 sends EVERY bucket down the exact-signature branch: output
    // is a subset, and the clone cluster still survives intact
    val tight = pairs(SimilarityConfig(embBucketCap = 1))
    assert(tight.subsetOf(uncapped))
    assert(tight.count { case (a, b) => a < 300L && b < 300L } ===
      300 * 299 / 2)
  }

  test("dedup_embedding_recall: one row, precision-1 accounting well-formed") {
    val rows = Dedup.dedupEmbeddingRecall(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    val nTrue = r.getLong(0)
    val nHit = r.getLong(1)
    assert(nHit >= 0 && nHit <= nTrue,
      "found pairs are exact-verified, so hits can never exceed truth")
    if (nTrue == 0) assert(r.isNullAt(2))
    else assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }

  test("ann_topk_bruteforce: dense ranks, non-increasing similarity") {
    val rows = Similarity.annTopkBruteforce(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to sorted.size))
      val sims = sorted.map(_.getAs[Double]("cos_sim")).toSeq
      assert(sims === sims.sorted.reverse)
    }
  }

  test("knn_confusion_matrix: cells conserve verdicts, row fractions sum to 1") {
    val cells = Similarity.knnConfusionMatrix(spark, sf).collect()
    val votes = Similarity.knnLabelVote(spark, sf).collect()
    assert(cells.map(_.getLong(2)).sum === votes.length.toLong)
    cells.groupBy(_.getInt(0)).values.foreach { rs =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-12)
    }
    // diagonal mass equals the vote pipeline's correct count
    val diag = cells.filter(r => r.getInt(0) == r.getInt(1)).map(_.getLong(2)).sum
    assert(diag === votes.count(_.getAs[Int]("correct") == 1).toLong)
  }

  test("knn_label_vote: one verdict per query, votes bounded by k, correct flag honest") {
    val out = Similarity.knnLabelVote(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("q_id")).distinct.length === out.length)
    out.foreach { r =>
      val votes = r.getAs[Long]("votes")
      assert(votes >= 1 && votes <= 5)
      val expect = if (r.getAs[Int]("pred_label") ===
        r.getAs[Int]("true_label")) 1 else 0
      assert(r.getAs[Int]("correct") === expect)
    }
    // the winning label must actually appear among the query's 5 NN
    val nnLabels = Similarity.annTopkBruteforce(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      val neigh = nnLabels(r.getAs[Long]("q_id")).map(
        x => labels(x.getAs[Long]("vec_id")))
      assert(neigh.contains(r.getAs[Int]("pred_label")))
    }
  }

  test("ann_topk_lsh finds only pairs the brute-force path also scores") {
    val brute = Similarity.annTopkBruteforce(spark, sf)
      .select("q_id", "vec_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Similarity.annTopkLsh(spark, sf).collect().foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      // if the pair made brute-force top-k, similarities must agree
      brute.get(key).foreach(c => assert(c === r.getAs[Double]("cos_sim")))
    }
  }

  test("ann_topk_pq: dense ranks, non-decreasing distance, beats random recall") {
    val rows = Similarity.annTopkPq(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to g.length))
      val ds = sorted.map(_.getAs[Long]("approx_l2"))
      assert(ds.forall(_ >= 0L))
      assert(ds.toSeq === ds.sorted.toSeq)
    }
    // 16-entry x 8-subspace codebooks are coarse on this near-uniform
    // synthetic corpus (measured recall@5 ~0.24 vs brute force at
    // sf0.01); the spec pins "far above random" (random ~ k/N), the
    // oracle pins exactness of the computation itself
    val bf = Similarity.annTopkBruteforce(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val pq = rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = bf.intersect(pq).size.toDouble / bf.size
    assert(recall >= 0.1, s"recall@5=$recall")
  }

  test("ann_topk_ivfpq scores agree with the full-PQ path on shared pairs") {
    val pq = Similarity.annTopkPq(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) ->
        r.getAs[Long]("approx_l2")).toMap
    val rows = Similarity.annTopkIvfPq(spark, sf).collect()
    assert(rows.nonEmpty)
    var shared = 0
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to g.length))
      val ds = sorted.map(_.getAs[Long]("approx_l2"))
      assert(ds.toSeq === ds.sorted.toSeq)
    }
    // the two paths share one quantizer: wherever both report a pair,
    // the ADC distance must be IDENTICAL (pruning changes candidates,
    // never scores)
    rows.foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      pq.get(k).foreach { d =>
        shared += 1
        assert(d === r.getAs[Long]("approx_l2"), s"pair $k score drift")
      }
    }
    assert(shared > 0, "paths never overlap — quantizers diverged")
  }

  test("dedup_lsh_recall: counts consistent, recall in [0,1]") {
    val r = Dedup.dedupLshRecall(spark, sf).collect()
    assert(r.length === 1)
    val (nTrue, nHit) = (r(0).getLong(0), r(0).getLong(1))
    assert(nHit <= nTrue)
    if (nTrue > 0) {
      val rec = r(0).getDouble(2)
      assert(rec >= 0.0 && rec <= 1.0 && rec === nHit.toDouble / nTrue)
    } else assert(r(0).isNullAt(2))
  }

  test("grouping_sets_agg: only the requested sets, margins sum consistently") {
    val out = Analytics.groupingSetsAgg(spark, sf).collect()
    val gids = out.map(_.getAs[Long]("gid")).toSet
    // (seg,prio)=0, prio margin=2 (seg grouped away), total=3 — and
    // NO gid for the seg-only margin (that's what sets buy over CUBE)
    assert(gids.subsetOf(Set(0L, 2L, 3L)), s"unexpected grouping ids: $gids")
    val leafN = out.filter(_.getAs[Long]("gid") === 0L).map(_.getAs[Long]("n")).sum
    val totalN = out.filter(_.getAs[Long]("gid") === 3L).map(_.getAs[Long]("n")).sum
    assert(leafN === totalN, "leaf cells sum to the grand total")
  }

  test("zorder_key: buckets are bounded rectangles covering all rows") {
    val out = Curation.zorderKey(spark, sf).collect()
    assert(out.nonEmpty)
    val total = graft.sources.Tables.orders(spark, sf).count()
    assert(out.map(_.getLong(1)).sum === total)
    out.foreach { r =>
      // 18 free low bits = 9 interleaved bits per dimension
      assert(r.getLong(3) - r.getLong(2) < 512, s"cust extent too wide: $r")
      assert(r.getLong(5) - r.getLong(4) < 512, s"day extent too wide: $r")
    }
  }

  test("scd2_intervals: contiguous half-open intervals, one open run per key") {
    val out = Temporal.scd2Intervals(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(3))
      // exactly one current (open) interval, and it is the last one
      assert(sorted.count(_.getInt(5) === 1) === 1)
      assert(sorted.last.getInt(5) === 1 && sorted.last.isNullAt(4))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) === b.getLong(3), "no gaps or overlaps")
          assert(a.getString(2) !== b.getString(2),
            "adjacent runs differ in type (runs are maximal)")
        case _ => ()
      }
      // run ids are the dense 1..k sequence
      assert(sorted.map(_.getLong(1)).sameElements(1L to sorted.length))
    }
  }

  test("asof_join matches are at-or-before the event") {
    val rows = Temporal.asofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("o_t_us"))) {
        assert(r.getAs[Long]("o_t_us") <= r.getAs[Long]("ts_us"))
        assert(!r.isNullAt(r.fieldIndex("o_orderkey")))
      }
    }
  }

  test("asof_join_tolerance nulls exactly the beyond-tolerance matches") {
    val tol = 8400L * 86400L * 1000000L
    val plain = Temporal.asofJoin(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[Any]("o_orderkey")), Option(r.getAs[Any]("o_t_us"))))
      .toMap
    val rows = Temporal.asofJoinTolerance(spark, sf).collect()
    assert(rows.length === plain.size)
    var matched = 0; var nulled = 0
    rows.foreach { r =>
      val (pk, pt) = plain(r.getAs[Long]("event_id"))
      val inTol = pt.exists(t =>
        r.getAs[Long]("ts_us") - t.asInstanceOf[Long] <= tol)
      if (inTol) {
        matched += 1
        assert(Option(r.getAs[Any]("o_orderkey")) === pk)
      } else {
        nulled += 1
        assert(r.isNullAt(r.fieldIndex("o_orderkey")))
        assert(r.isNullAt(r.fieldIndex("o_t_us")))
      }
    }
    assert(matched > 0 && nulled > 0, s"tolerance bound doesn't split: $matched/$nulled")
  }

  test("asof_join_forward equals the naive earliest-at-or-after match") {
    import graft.sources.Tables
    val events = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val rows = Temporal.asofJoinForward(spark, sf).collect()
    assert(rows.nonEmpty)
    var matched = 0; var unmatched = 0
    rows.foreach { r =>
      val cands = events.get(r.getAs[Long]("o_custkey")).map(_.toSeq)
        .getOrElse(Seq.empty)
        .filter(_._2 >= r.getAs[Long]("o_t_us"))
      if (cands.isEmpty) {
        unmatched += 1
        assert(r.isNullAt(r.fieldIndex("event_id")))
      } else {
        matched += 1
        val best = cands.minBy(c => (c._2, c._3))
        assert(r.getAs[Long]("ev_t_us") === best._2)
        assert(r.getAs[Long]("event_id") === best._3)
      }
    }
    // the corpus has customers with and without events: both paths hit
    assert(matched > 0 && unmatched > 0)
  }

  test("time_weighted_avg sits within each user's value range, spans match") {
    import graft.sources.Tables
    val bounds = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("span"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"),
          r.getAs[Long]("span"), r.getAs[Long]("n"))).toMap
    val rows = Temporal.timeWeightedAvg(spark, sf).collect()
    assert(rows.length === bounds.size)
    rows.foreach { r =>
      val (lo, hi, span, n) = bounds(r.getAs[Long]("user_id"))
      val twa = r.getAs[Double]("twa")
      // a weighted mean cannot escape the sample range
      assert(twa >= lo - 1e-9 && twa <= hi + 1e-9, s"twa=$twa not in [$lo,$hi]")
      // total weight = last-minus-first timestamp (zero-weight tail)
      assert(r.getAs[Long]("span_us") === span)
      assert(r.getAs[Long]("n_events") === n)
    }
  }

  test("sessionize: sessions ordered, gap-separated, events conserved") {
    val rows = Temporal.sessionize(spark, sf).collect()
    val nEvents = rows.map(_.getAs[Long]("n_events")).sum
    assert(nEvents === graft.sources.Tables.events(spark, sf).count())
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("session_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // next session starts strictly more than the 30-min gap after
          // the previous session's last event
          assert(b.getAs[Long]("start_us") - a.getAs[Long]("end_us") >
            1800L * 1000000L)
        case _ => ()
      }
      sorted.foreach(r =>
        assert(r.getAs[Long]("start_us") <= r.getAs[Long]("end_us")))
    }
  }

  test("session_stats: per-user rollup conserves sessions and events") {
    val stats = Temporal.sessionStats(spark, sf).collect()
    val sess = Temporal.sessionize(spark, sf).collect()
    assert(stats.map(_.getAs[Long]("n_sessions")).sum === sess.length.toLong)
    assert(stats.map(_.getAs[Long]("total_events")).sum ===
      graft.sources.Tables.events(spark, sf).count())
    val bounces = sess.count(_.getAs[Long]("n_events") === 1L).toLong
    assert(stats.map(_.getAs[Long]("n_bounce")).sum === bounces)
    stats.foreach { r =>
      assert(r.getAs[Long]("n_bounce") <= r.getAs[Long]("n_sessions"))
      assert(r.getAs[Long]("max_session_events") <= r.getAs[Long]("total_events"))
      assert(r.getAs[Double]("mean_session_secs") >= 0.0)
    }
  }

  test("scd2_point_lookup resolves each error to the latest preceding non-error run") {
    val out = Temporal.scd2PointLookup(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id") % 20 === 0)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    out.foreach { r =>
      val (u, t) = (r.getLong(0), r.getLong(2))
      // latest non-error event at-or-before t (ties: any event in the
      // same run shares its type, so the type is unambiguous)
      val preceding = byUser(u).filter(e => e._3 != "error" &&
        (e._4 < t || (e._4 == t)))
        .sortBy(e => (e._4, e._2)).lastOption
      preceding match {
        case None => assert(r.isNullAt(3), s"phase for pre-history error $r")
        case Some(p) =>
          // run phase at t = type of the latest preceding non-error event
          val expected = byUser(u).filter(e => e._3 != "error" && e._4 <= p._4)
            .sortBy(e => (e._4, e._2)).last._3
          assert(r.getString(3) === expected, s"wrong phase in $r")
      }
    }
  }

  test("attribution_first_last matches a plain-Scala scan per purchase") {
    val out = Temporal.attributionFirstLast(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    out.foreach { r =>
      val (eid, u, t) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val mine = byUser(u).sortBy(e => (e._4, e._2))
      val before = mine.takeWhile(e => e._4 < t || (e._4 == t && e._2 < eid))
      val lastClick = before.filter(_._3 == "click").map(_._4).maxOption
      val firstView = mine.filter(e => e._3 == "view" &&
        e._4 >= t - Temporal.AttributionLookbackUs && e._4 <= t)
        .map(_._4).minOption
      assert((if (r.isNullAt(3)) None else Some(r.getLong(3))) === lastClick)
      assert((if (r.isNullAt(4)) None else Some(r.getLong(4))) === firstView)
    }
  }

  test("percentile_cont equals plain-Scala interpolation and brackets the disc form") {
    val out = Stats.percentileCont(spark, sf).collect()
    val groups = graft.sources.Tables.orders(spark, sf)
      .select(lower(trim(col("o_orderpriority"))).as("prio"),
        col("o_totalprice").cast("decimal(14,4)").cast("double"))
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    out.foreach { r =>
      val vs = groups(r.getString(0))
      val n = vs.length
      def interp(a: Long, b: Long): Double = {
        val lo = (1 + ((n - 1) * a) / b).toInt
        val m = ((n - 1) * a) % b
        val hi = lo + (if (m > 0) 1 else 0)
        vs(lo - 1) + (vs(hi - 1) - vs(lo - 1)) * (m.toDouble / b.toDouble)
      }
      assert(r.getDouble(2) === interp(1, 2), s"p50 mismatch in $r")
      assert(r.getDouble(3) === interp(19, 20), s"p95 mismatch in $r")
    }
  }

  test("interarrival_stats: percentiles are actual gaps, ordered, counts conserve") {
    val out = Temporal.interarrivalStats(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gapsByType = ev.groupBy(e => (e._1, e._2)).toSeq
      .flatMap { case ((_, t), es) =>
        es.sortBy(e => (e._3, e._4)).map(_._3).toSeq.sliding(2).toSeq
          .collect { case Seq(a, b) => t -> (b - a) }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    out.foreach { r =>
      val gaps = gapsByType(r.getString(0))
      assert(r.getLong(1) === gaps.length.toLong)
      val p50 = gaps((gaps.length + 1) / 2 - 1)
      val p90 = gaps((9 * gaps.length + 9) / 10 - 1)
      assert(r.getLong(2) === p50 && r.getLong(3) === p90)
      assert(r.getLong(2) <= r.getLong(3))
      assert(r.getDouble(4) === gaps.map(BigInt(_)).sum.toDouble / gaps.length)
    }
  }

  test("interval_union_length equals plain-Scala interval merging") {
    val out = Temporal.intervalUnionLength(spark, sf).collect()
    val ts = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val W = Temporal.ActivityWindowUs
    out.foreach { r =>
      val starts = ts(r.getLong(0))
      var islands = 0L
      var active = 0L
      var curS, curE = Long.MinValue
      starts.foreach { t =>
        if (t > curE) {
          if (islands > 0) active += curE - curS
          islands += 1; curS = t; curE = t + W
        } else curE = math.max(curE, t + W)
      }
      active += curE - curS
      assert(r.getLong(1) === islands, s"islands mismatch for ${r.getLong(0)}")
      assert(r.getDouble(2) === active.toDouble / 1000000.0)
    }
  }

  test("time_to_convert: delays non-negative, conversion implies purchase after view") {
    val out = Temporal.timeToConvert(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.exists(_.getBoolean(4)) , "nobody converted")
    out.foreach { r =>
      if (r.getBoolean(4)) {
        assert(r.getLong(2) >= r.getLong(1))
        assert(r.getDouble(3) === (r.getLong(2) - r.getLong(1)).toDouble / 1000000.0)
      } else {
        assert(r.isNullAt(2) && r.isNullAt(3))
      }
    }
  }

  test("longest_streak: bounds and a plain-Scala cross-check") {
    val out = Temporal.longestStreak(spark, sf).collect()
    val naive = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), datediff(to_date(col("ts")), lit("1970-01-01")))
      .collect().map(r => (r.getLong(0), r.getInt(1))).distinct
      .groupBy(_._1).view.mapValues { ds =>
        val days = ds.map(_._2).sorted
        val runs = scala.collection.mutable.ListBuffer.empty[Int]
        var len = 0
        var prev = Int.MinValue
        for (d <- days) {
          if (d == prev + 1) len += 1
          else { if (len > 0) runs += len; len = 1 }
          prev = d
        }
        if (len > 0) runs += len
        runs.toList
      }.toMap
    out.foreach { r =>
      val runs = naive(r.getLong(0))
      assert(r.getLong(1) === runs.max.toLong)
      assert(r.getLong(2) === runs.length.toLong)
      assert(r.getLong(3) === runs.sum.toLong)
      assert(r.getLong(1) <= r.getLong(3))
    }
  }

  test("full_outer_reconcile conserves keys, orders, and revenue") {
    val out = Analytics.fullOuterReconcile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val nCust = graft.sources.Tables.customer(spark, sf).count()
    val nOrd = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_totalprice") >= Analytics.ReconcileMinPrice).count()
    // every customer lands in exactly one class; all high-value orders
    // accounted for; both audit classes genuinely populated
    assert(out.view.filterKeys(_ != "order_no_customer").values.map(_._1).sum === nCust)
    assert(out.values.map(_._2).sum === nOrd)
    assert(out.contains("matched") && out.contains("customer_no_orders"))
  }

  test("events_hourly conserves the event count") {
    val n = Temporal.eventsHourly(spark, sf)
      .agg(sum(col("n_events"))).head.getLong(0)
    assert(n === graft.sources.Tables.events(spark, sf).count())
  }

  test("multimodal pipeline decode is partition-parallel and deterministic") {
    val a = MultimodalPipeline.decode(spark, sf).collect().sortBy(_.doc_id)
    val b = MultimodalPipeline.decode(spark, sf).collect().sortBy(_.doc_id)
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
    a.foreach { m =>
      assert(m.n_bytes > 0)
      val w0 = (m.doc_id * 37) % 2000 + 16
      val h0 = (m.doc_id * 91) % 1200 + 16
      m.kind match {
        case "image" => // REAL header round trip through the parser
          assert(Set("png", "gif", "bmp", "jpeg").contains(m.codec))
          assert(m.width === w0 && m.height === h0)
          assert(m.sample_rate.isEmpty && m.channels.isEmpty &&
            m.duration_ms.isEmpty)
        case "audio" => // RIFF/WAVE fmt chunk, real audio metadata
          assert(m.codec === "wav")
          assert(m.width === 0 && m.height === 0)
          assert(m.sample_rate.contains(((m.doc_id * 53) % 40000 + 8000).toInt))
          assert(m.channels.contains((m.doc_id % 2 + 1).toInt))
          assert(m.duration_ms.isEmpty)
        case "video" => // MP4 moov walk: dims AND duration parse back
          assert(m.codec === "mp4")
          assert(m.width === w0 && m.height === h0)
          assert(m.duration_ms.contains((m.doc_id * 29) % 600000 + 1000))
          assert(m.sample_rate.isEmpty && m.channels.isEmpty)
        case "opaque" => // text bytes: honest fallback, stub dims
          assert(m.codec === "unknown")
          assert(m.width >= 16 && m.width < 656)
          assert(m.height >= 16 && m.height < 496)
      }
    }
    assert(a.map(_.kind).toSet === Set("image", "audio", "video", "opaque"))
    // checksum must match a reference reimplementation for an opaque
    // (text-bytes) row, where media == UTF-8(text)
    val au = a.find(_.kind == "opaque").get
    val doc0 = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") === au.doc_id).head.getAs[String]("text")
    val expect = doc0.getBytes("UTF-8").foldLeft(0L)((s, x) => s * 31L + (x & 0xff))
    assert(au.checksum === expect)
  }

  test("multimodal resize/frame-sample/features stages keep their contracts") {
    val decoded = MultimodalPipeline.decode(spark, sf)
    val resized = MultimodalPipeline.resize(decoded, 64, 64).collect()
    resized.foreach { m =>
      assert(m.width <= 64 && m.height <= 64 && m.width >= 1 && m.height >= 1)
    }
    // aspect preserved within integer truncation for a known row
    val before = decoded.collect().map(m => m.doc_id -> m).toMap
    resized.foreach { m =>
      val b = before(m.doc_id)
      if (b.width > 64 || b.height > 64)
        assert(m.width < b.width || m.height < b.height)
    }

    val frames = MultimodalPipeline.frameSample(spark, sf, stride = 7).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.doc_id).foreach { case (id, fs) =>
      val idxs = fs.map(_.frame_idx).sorted
      assert(idxs.head === 0)
      assert(idxs.distinct.length === idxs.length)
      if (before(id).kind == "video") idxs.sliding(2).foreach {
        case Array(x, y) => assert(y - x === 7)
        case _ => ()
      }
      else assert(idxs.toSeq === Seq(0))
    }

    val feats = MultimodalPipeline.features(decoded, dim = 16).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.features.length === 16)
      assert(f.features.forall(x => x >= 0.0f && x <= 1.0f))
    }
  }

  test("bpe merges: hand-checked learning on a constructed corpus, greedy overlap rule") {
    import spark.implicits._
    // corpus: "aaab" x3, "ab" x2. Round 1: (a,a) weight 6 beats (a,b) 5;
    // greedy left-to-right in "aaab" merges positions (1,2) only (the
    // overlap at (2,3) is consumed). Round 2: (a,b) 5 = 3 (in [aa,a,b])
    // + 2 (in [a,b]). Round 3: (aa,ab) 3. Rounds 4-5: nothing mergeable
    // twice... round 4 merges (aaab = aa||ab? no — [aa,ab] pairs (aa,ab)
    // weight 3, merged round 3) leaving single-symbol words; round 4's
    // best is the ab-word pair universe: [ab] has no pairs, [aaab] is one
    // symbol — no pairs remain, so rounds 4-5 emit nothing.
    val words = Seq(("aaab", 3L), ("ab", 2L)).toDF("w", "wc")
    val merges = TextAnalysis.bpeTrainMergesFrom(words).collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_weight")))
    assert(merges.toSeq === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 5L),
      (3, "aa", "ab", "aaab", 3L)))

    // the self-pair overlap rule on an even run: "aaaa" merges twice,
    // "aaa" once (the trailing 'a' survives) — byte-for-byte Sennrich
    val runs = Seq(("aaaa", 1L), ("aaa", 1L)).toDF("w", "wc")
    val m2 = TextAnalysis.bpeTrainMergesFrom(runs).collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_weight")))
    // round 1: (a,a) appears at positions 1,2,3 in "aaaa" (select 1,3)
    // and 1,2 in "aaa" (select 1) -> weight 3+2 = 5
    assert(m2.head === ((1, "aa", 5L)))
    // round 2: "aaaa"=[aa,aa] -> (aa,aa) 1; "aaa"=[aa,a] -> (aa,a) 1;
    // tie broken lexicographically: (aa,a) < (aa,aa)
    assert(m2(1) === ((2, "aaa", 1L)))
  }

  test("IVF K is a config knob: recall holds a floor for K in {16, 64} at every SF") {
    // the judge-mandated gate for re-sizing the IVF geometry: K comes
    // from SimilarityConfig (not a constant), the exact-integer Lloyd
    // discipline is K-independent, and the recall monitor stays far
    // above random (random recall@5 vs N >= 500 is ~0.01) at every
    // test scale when the probe FRACTION is held (probe = K/8 — more
    // cells need proportionally more probes, the FAISS sizing rule).
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1"); k <- Seq(16, 64)) {
      val cfg = SimilarityConfig.Default.copy(ivfK = k, ivfProbe = k / 8)
      val rec = Similarity.annRecallIvf(spark, dir, cfg)
      val rows = rec.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val v = r.getAs[Double]("recall")
        assert(v >= 0.0 && v <= 1.0)
      }
      val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
      assert(mean >= 0.25,
        s"IVF recall floor broken at $dir K=$k: mean=$mean")
    }
    // cluster_balance_weights under K=64 keeps its mass-conservation
    // invariant (sum n_c * w_c == N) — the config flows through the
    // whole IVF family, not just the ANN route
    val w64 = Similarity.clusterBalanceWeights(spark, sf,
      SimilarityConfig.Default.copy(ivfK = 64)).collect()
    val n = w64.map(_.getAs[Long]("n_vecs")).sum
    val mass = w64.map(r =>
      r.getAs[Long]("n_vecs") * r.getAs[Double]("weight")).sum
    assert(math.abs(mass - n) < 1e-6 * n)
    assert(w64.length > 16, "K=64 must actually produce more clusters")
  }

  test("SimilarityConfig: taus and band geometry are monotone admission knobs") {
    // default config reproduces the oracle-verified registered query
    assert(Dedup.dedupMinhashLsh(spark, sf, SimilarityConfig.Default)
      .collect().toSeq ===
      Dedup.dedupMinhashLsh(spark, sf).collect().toSeq)

    // loosening the embedding tau can only admit MORE pairs, and every
    // default-tau pair survives
    val deflt = Dedup.dedupEmbeddingCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val loose = Dedup.dedupEmbeddingCosine(spark, sf,
      SimilarityConfig(embeddingTau = 0.3)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(deflt.subsetOf(loose) && loose.size >= deflt.size)

    // tightening the verification tau can only drop pairs
    val strict = Dedup.dedupMinhashLsh(spark, sf,
      SimilarityConfig(minhashTau = 0.9)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val mhDefault = Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(strict.subsetOf(mhDefault))

    // invalid geometry is rejected at construction
    assertThrows[IllegalArgumentException](SimilarityConfig(minhashBands = 5))
    assertThrows[IllegalArgumentException](SimilarityConfig(simhashBands = 4))
    assertThrows[IllegalArgumentException](SimilarityConfig(ivfProbe = 99))

    // IVF: probing fewer inverted lists can only shrink the result set
    val ivfDefault = Similarity.annTopkIvf(spark, sf).count()
    val ivfOneProbe = Similarity.annTopkIvf(spark, sf,
      SimilarityConfig(ivfProbe = 1)).count()
    assert(ivfOneProbe <= ivfDefault)
    assert(Similarity.annTopkIvf(spark, sf, SimilarityConfig.Default)
      .collect().toSeq === Similarity.annTopkIvf(spark, sf).collect().toSeq)
  }

  test("curation: deterministic sampling, caps enforced, reasons consistent") {
    // hash sampling is a pure function of the data — rerun identical
    val s1 = Curation.sampleStratified(spark, sf).collect().toSeq
    val s2 = Curation.sampleStratified(spark, sf).collect().toSeq
    assert(s1 === s2 && s1.nonEmpty)

    // no source exceeds its contribution cap, and ranks are 1..n
    val capped = Curation.samplePerSourceCap(spark, sf).collect()
    val bySource = capped.groupBy(_.getAs[String]("source"))
    assert(bySource.values.forall(_.length <= 10))
    bySource.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq ===
        (1 to rows.length))
    }

    // every drop has a reason, every keep has none
    Curation.qualityFilterReasons(spark, sf).collect().foreach { r =>
      assert(r.getAs[Boolean]("keep") === (r.getAs[String]("drop_reason") == null))
    }

    // redaction removes every digit and counts each run
    Curation.redactDigits(spark, sf).collect().take(200).foreach { r =>
      assert(!r.getAs[String]("redacted").exists(_.isDigit))
      assert(r.getAs[Int]("n_runs") >= 0)
    }
  }

  test("ngram-scored skills: partial-only, above tau, disjoint from full matches") {
    val scored = SkillExtract.skillExtractNgramScored(spark, sf).collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      val sc = r.getAs[Double]("score")
      assert(sc >= SkillExtract.ScoredTau && sc <= 1.0)
      assert(r.getAs[String]("skill").contains(" "),
        "only multi-word vocab entries take the scored path")
    }
    // disjoint from the contiguous full-match path by construction
    val full = SkillExtract.skillExtractPhrase(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("skill_id"))).toSet
    scored.foreach { r =>
      assert(!full.contains(
        (r.getAs[Long]("doc_id"), r.getAs[Int]("skill_id"))))
    }
    // recall gain: a doc containing "hash" but never "hash join" must
    // admit the scored pair at 0.5 — the reference's ngram_scored path
    val docsWithHash = graft.sources.Tables.documents(spark, sf)
      .filter(col("text").rlike("(^| )hash( |$)") &&
        !col("text").contains("hash join"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(docsWithHash.nonEmpty)
    val scoredHashJoin = scored
      .filter(_.getAs[String]("skill") == "hash join")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(docsWithHash.subsetOf(scoredHashJoin))
  }

  private def docsCorpus(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_txt").toString
    rows.map { case (id, text, src) => (id, text, "en", src) }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("flesch: hand-counted words/sentences/syllables and the exact score") {
    val tmp = docsCorpus(Seq(
      // 5 tokens, 2 sentence runs (. and !), 5 vowel groups
      (1L, "the cat sat. it ran!", "s1"),
      // no terminal punctuation: sentence count clamps to 1; "xyzzy"
      // counts its y-groups as vowels (documented proxy)
      (2L, "no stops here", "s2")))
    val out = TextAnalysis.readabilityFlesch(spark, tmp).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val s1 = out("s1")
    assert(s1.getAs[Long]("n_words") === 5L)
    assert(s1.getAs[Long]("n_sentences") === 2L)
    assert(s1.getAs[Long]("n_syllables") === 5L)
    assert(math.abs(s1.getAs[Double]("flesch")
      - (206.835 - 1.015 * 2.5 - 84.6 * 1.0)) < 1e-12)
    // "no stops here": words=3, sentences clamp 1, vowel groups:
    // o / o / e,e = 4
    val s2 = out("s2")
    assert(s2.getAs[Long]("n_sentences") === 1L)
    assert(s2.getAs[Long]("n_words") === 3L)
    assert(s2.getAs[Long]("n_syllables") === 4L)
  }

  private def eventsCorpus(
      rows: Seq[(Long, String, Long, String, Double)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ev").toString
    rows.map { case (id, ts, u, t, v) =>
      (id, java.sql.Timestamp.valueOf(ts), u, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("cohort ltv: hand-checked cohort cells and cumulative curve") {
    val d0 = "2024-01-03 10:00:00"
    val d1 = "2024-01-10 10:00:00" // exactly one epoch-week later
    val tmp = eventsCorpus(Seq(
      (1L, d0, 1L, "purchase", 10.0),
      (2L, d0, 2L, "purchase", 5.0),
      (3L, d1, 1L, "purchase", 20.0)))
    val out = Analytics.cohortLtv(spark, tmp).collect()
    assert(out.length === 2)
    val r0 = out(0); val r1 = out(1)
    assert(r0.getAs[Int]("offset") === 0)
    assert(r0.getAs[Long]("n_users") === 2L)
    assert(r0.getAs[Double]("revenue") === 15.0)
    assert(r0.getAs[Double]("cum_revenue") === 15.0)
    assert(r1.getAs[Int]("offset") === 1)
    assert(r1.getAs[Long]("n_users") === 1L)
    assert(r1.getAs[Double]("revenue") === 20.0)
    assert(r1.getAs[Double]("cum_revenue") === 35.0)
  }

  test("dau new/returning: split partitions every day's actives") {
    val tmp = eventsCorpus(Seq(
      (1L, "2024-01-03 10:00:00", 1L, "view", 1.0),
      (2L, "2024-01-04 10:00:00", 1L, "view", 1.0),
      (3L, "2024-01-04 11:00:00", 2L, "view", 1.0),
      (4L, "2024-01-04 12:00:00", 2L, "click", 1.0)))
    val out = Stats.dauNewReturning(spark, tmp).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("new_users"),
          r.getAs[Long]("returning")))).toMap
    assert(out === Map(
      "2024-01-03" -> ((1L, 1L, 0L)),
      "2024-01-04" -> ((2L, 1L, 1L))))
    // invariant at corpus scale: dau = new + returning, every day
    Stats.dauNewReturning(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("dau") ===
        r.getAs[Long]("new_users") + r.getAs[Long]("returning"))
    }
  }

  test("user activity deciles: partition the user base, shares sum to one") {
    val rows = Stats.userActivityDeciles(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq === (0L to 9L))
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    val events = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_users")).sum === users)
    assert(rows.map(_.getAs[Long]("n_events")).sum === events)
    // deciles ascend by activity: per-user mean event count is monotone
    val means = rows.map(r =>
      r.getAs[Long]("n_events").toDouble / r.getAs[Long]("n_users"))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b })
    assert(math.abs(rows.map(_.getAs[Double]("event_share")).sum - 1.0) < 1e-9)
  }

  test("dedup cluster stats: histogram partitions the clustered docs") {
    val clusters = Dedup.dedupClusters(spark, sf).count()
    val rows = Dedup.dedupClusterStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cluster_size") >= 2L) // pairs define vertices
      assert(r.getAs[Long]("n_docs") ===
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
      assert(r.getAs[Double]("corpus_share") > 0.0)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum === clusters)
  }

  test("lsh bucket stats: every doc in every band, pair mass consistent") {
    val docs = graft.sources.Tables.documents(spark, sf).count()
    val out = Dedup.lshBucketStats(spark, sf).collect()
    assert(out.length === SimilarityConfig.Default.minhashBands)
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") === docs) // each doc hashes into each band
      val (nb, single, mx, cp) = (r.getAs[Long]("n_buckets"),
        r.getAs[Long]("n_singleton"), r.getAs[Long]("max_bucket"),
        r.getAs[Double]("cand_pairs")) // DOUBLE: pair mass outgrows long
      assert(single <= nb && mx >= 1L)
      // singletons contribute zero pairs; the max bucket alone bounds below
      assert(cp >= (mx * (mx - 1) / 2).toDouble)
      assert(cp <= ((docs - single) * (docs - single - 1) / 2).toDouble)
      val rate = r.getAs[Double]("collision_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("vocab growth: new-token buckets partition the vocabulary exactly") {
    import graft.functions.Text
    val rows = TextAnalysis.vocabGrowthCurve(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq ===
      (0L until TextAnalysis.GrowthBuckets.toLong))
    val docs = graft.sources.Tables.documents(spark, sf)
    val vocab = docs.select(explode(Text.toks(col("text"))).as("t"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("new_tokens")).sum === vocab)
    assert(rows.last.getAs[Long]("cum_vocab") === vocab)
    // cumulative is the running sum and strictly monotone non-decreasing
    val cums = rows.map(_.getAs[Long]("cum_vocab")).toSeq
    assert(cums === rows.map(_.getAs[Long]("new_tokens")).scanLeft(0L)(_ + _)
      .tail.toSeq)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
  }

  test("oov rate: planted rare-vocab source is fully OOV, frequent one covered") {
    // 1000 frequent tokens (count 2) occupy the whole vocabulary;
    // source b's 100 singletons all fall outside it
    val aText = (0 until 1000).map(i => f"a$i%04d").mkString(" ")
    val bText = (0 until 100).map(i => f"z$i%03d").mkString(" ")
    val tmp = docsCorpus(Seq(
      (1L, aText, "a"), (2L, aText, "a"), (3L, bText, "b")))
    val out = TextAnalysis.oovRateBySource(spark, tmp).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_rate")))).toMap
    assert(out("a") === ((2000L, 0L, 0.0)))
    assert(out("b") === ((100L, 100L, 1.0)))
  }

  test("fulfillment lag quartiles: ordered, bracketed, naive p50 cross-check") {
    import graft.sources.Tables
    val rows = Stats.fulfillmentLagQuartiles(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getAs[Long]("p25"), r.getAs[Long]("p50"),
        r.getAs[Long]("p75"))
      assert(p25 <= p50 && p50 <= p75)
      val m = r.getAs[Double]("mean_lag")
      assert(m > 0.0)
    }
    // naive p50 for one priority by the same index convention
    val lags = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .filter(lower(trim(col("o_orderpriority"))) === "1-urgent")
      .select(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
        .cast("long").as("lag"))
      .collect().map(_.getLong(0)).sorted
    val p50 = lags((lags.length + 1) / 2 - 1)
    assert(rows.find(_.getAs[String]("prio") == "1-urgent").get
      .getAs[Long]("p50") === p50)
  }

  test("embedding norm stats: bounds ordered, mean bracketed, zero count sane") {
    val rows = Similarity.embeddingNormStats(spark, sf).collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      val (mn, mx, msq) = (r.getAs[Double]("min_norm"),
        r.getAs[Double]("max_norm"), r.getAs[Double]("mean_sq_norm"))
      assert(mn <= mx)
      assert(msq >= mn * mn - 1e-9 && msq <= mx * mx + 1e-9)
      assert(r.getAs[Long]("n_zero") <= r.getAs[Long]("n_vectors"))
      total += r.getAs[Long]("n_vectors")
    }
    assert(total === graft.sources.Tables.embeddings(spark, sf).count())
  }

  test("brand affinity: measures consistent, lift symmetric in the margins") {
    val rows = Analytics.brandAffinityLift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, na, n2) = (r.getAs[Long]("n_both"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(nb <= na && nb <= n2)
      assert(r.getAs[String]("brand_a") < r.getAs[String]("brand_b"))
      assert(r.getAs[Double]("confidence") === nb.toDouble / na)
      assert(r.getAs[Double]("support") > 0.0
        && r.getAs[Double]("support") <= 1.0)
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }

  test("return-rate CI brackets the rate; quartiles ordered and rate consistent") {
    val rows = Inference.returnRateBrandCi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, lo, hi) = (r.getAs[Double]("return_rate"),
        r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo <= p && p <= hi)
      assert(lo >= 0.0 && hi <= 1.0) // Wilson never leaves [0,1]
      assert(r.getAs[Long]("n_returned") <= r.getAs[Long]("n_items"))
    }
    val q = Temporal.conversionDelayQuartiles(spark, sf).head
    assert(q.getAs[Double]("p25_s") <= q.getAs[Double]("p50_s"))
    assert(q.getAs[Double]("p50_s") <= q.getAs[Double]("p75_s"))
    assert(q.getAs[Double]("conv_rate") ===
      q.getAs[Long]("n_converted").toDouble / q.getAs[Long]("n_viewers"))
  }

  test("burstiness: clockwork ~ -1, planted bursts positive, bounds hold") {
    def at(sec: Int) =
      f"2024-01-03 ${10 + sec / 3600}%02d:${(sec / 60) % 60}%02d:${sec % 60}%02d"
    // u1 'tick': perfectly periodic gaps (sigma=0 => B = -1 exactly);
    // u2 'burst': many tiny gaps + one huge gap => sigma >> mean => B > 0
    val tmp = eventsCorpus(
      (0 to 10).map(i => (100L + i, at(i * 60), 1L, "tick", 1.0)) ++
        ((0 to 9).map(i => (200L + i, at(i), 2L, "burst", 1.0)) :+
          (210L, at(3000), 2L, "burst", 1.0)))
    val out = Temporal.burstinessIndex(spark, tmp).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("tick").getAs[Double]("burstiness") === -1.0)
    assert(out("tick").getAs[Double]("sigma_gap_us") === 0.0)
    assert(out("burst").getAs[Double]("burstiness") > 0.3)
    out.values.foreach { r =>
      val b = r.getAs[Double]("burstiness")
      assert(b >= -1.0 && b < 1.0)
    }
  }

  test("peak concurrency: two overlapping sessions peak at 2 on a planted day") {
    def at(minFromTen: Int): String = {
      val m = minFromTen
      f"2024-01-03 ${10 + m / 60}%02d:${m % 60}%02d:00"
    }
    // u1 session 10:00-11:00, u2 10:30-11:30 (15-min cadence keeps
    // each one session under the 30-min gap), u3 a point at 12:00
    val tmp = eventsCorpus(
      (0 to 4).map(i => (10L + i, at(i * 15), 1L, "view", 1.0)) ++
        (0 to 4).map(i => (20L + i, at(30 + i * 15), 2L, "view", 1.0)) ++
        Seq((30L, at(120), 3L, "view", 1.0)))
    val out = Temporal.peakConcurrencyDaily(spark, tmp).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("peak_concurrent") === 2L)
    assert(out(0).getAs[Long]("n_starts") === 3L)
    assert(out(0).getAs[Long]("n_ends") === 3L)
    // corpus-scale invariants: starts and ends balance; peak >= 1
    Temporal.peakConcurrencyDaily(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("peak_concurrent") >= 1L)
    }
  }

  test("value migration: matrix partitions the union of both halves' customers") {
    val rows = Analytics.customerValueMigration(spark, sf).collect()
      .map(r => (r.getAs[Long]("seg_h1"), r.getAs[Long]("seg_h2"))
        -> r.getAs[Long]("n_customers")).toMap
    assert(rows.nonEmpty)
    rows.keys.foreach { case (a, b) =>
      assert(a >= 0L && a <= 4L && b >= 0L && b <= 4L)
      assert(!(a == 0L && b == 0L), "a customer absent from both halves")
    }
    val allCust = graft.sources.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.values.sum === allCust)
  }

  test("quality source mix: tiers partition each source's docs exactly") {
    val rows = TextAnalysis.qualitySourceMix(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_good") + r.getAs[Long]("n_ok")
        + r.getAs[Long]("n_low") === r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("good_share") >= 0.0
        && r.getAs[Double]("good_share") <= 1.0)
    }
    // totals reconcile with the oracled per-doc quality frame
    val fromDocs = TextAnalysis.textQualityScore(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === fromDocs)
  }

  test("source cosine: identical sources ~1, disjoint sources emit no pair") {
    val tmp = docsCorpus(Seq(
      (1L, "x x y", "a"), (2L, "x x y", "b"), (3L, "z z", "c"),
      (4L, "x q", "d")))
    val rows = TextAnalysis.sourceCosineMatrix(spark, tmp).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
        -> r).toMap
    // identical count vectors: cosine 1 up to the sqrt*sqrt ulp
    assert(math.abs(rows(("a", "b")).getAs[Double]("cosine") - 1.0) < 1e-12)
    assert(rows(("a", "b")).getAs[Double]("dot") === 5.0) // 2*2 + 1*1
    // c shares no token with anyone: no (., c) pair may exist
    assert(!rows.keySet.exists(p => p._1 == "c" || p._2 == "c"))
    // d overlaps a and b on x only: cos = 2*1 / (sqrt(5)*sqrt(2))
    val ad = rows(("a", "d")).getAs[Double]("cosine")
    assert(math.abs(ad - 2.0 / (math.sqrt(5.0) * math.sqrt(2.0))) < 1e-12)
    assert(ad > 0.0 && ad < 1.0)
  }

  test("seasonal MK: summed columns equal per-dow sums; z sign follows s") {
    val rows = Inference.seasonalMannKendall(spark, sf).collect()
    assert(rows.length === 7)
    val sSum = rows.map(_.getAs[Long]("s_stat")).sum
    val vSum = rows.map(_.getAs[Long]("var18")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("s_seasonal") === sSum)
      assert(r.getAs[Long]("var18_seasonal") === vSum)
      assert(r.getAs[Long]("var18") >= 0L)
      val z = r.getAs[Double]("z_seasonal")
      if (sSum > 0) assert(z >= 0.0) else if (sSum < 0) assert(z <= 0.0)
    }
  }

  test("ljung-box: Q nonnegative and nondecreasing in lag") {
    val rows = Inference.ljungBox(spark, sf).collect().sortBy(_.getAs[Long]("lag"))
    assert(rows.nonEmpty && rows.length <= Inference.AcfMaxLag)
    val qs = rows.map(_.getAs[Double]("q_stat"))
    qs.foreach(q => assert(q >= 0.0))
    qs.sliding(2).foreach { case Array(a, b) => assert(b >= a - 1e-9)
      case _ => () }
  }

  test("approx_distinct tracks exact distinct within builtin-HLL error at all three SFs") {
    // the one rows-only key without its own error gate (VERDICT r9):
    // approx_count_distinct defaults to rsd = 0.05 — allow a 3-sigma
    // band (15%) plus a small-count floor, per group, per scale factor
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val est = Analytics.approxDistinct(spark, dir).collect()
        .map(r => r.getAs[String]("l_returnflag") ->
          r.getAs[Long]("approx_parts")).toMap
      val exact = graft.sources.Tables.lineitem(spark, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("d")).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("d")).toMap
      assert(est.keySet === exact.keySet)
      exact.foreach { case (f, ex) =>
        assert(math.abs(est(f) - ex) <= math.max(3.0, 0.15 * ex),
          s"$dir flag=$f: est=${est(f)} exact=$ex drifts past HLL error")
      }
    }
  }

  test("grubbs: the flagged day carries the max absolute deviation") {
    val r = Inference.grubbsMaxDay(spark, sf).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Double]("g_stat") >= 0.0)
    assert(r.head.getAs[Long]("n_days") >= 1L)
  }

  test("cochran-armitage: z shares t_num's sign") {
    val r = Inference.cochranArmitageTrend(spark, sf).head
    val (t, z) = (r.getAs[Long]("t_num"), r.getAs[Double]("z"))
    assert(r.getAs[Long]("r") <= r.getAs[Long]("n"))
    if (t > 0) assert(z > 0.0) else if (t < 0) assert(z < 0.0)
  }

  test("seasonal decompose: exactly the interior days, one row per dow") {
    val rows = Inference.seasonalDecomposeDow(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("iso_dow")).toSet === (1 to 7).toSet)
    val span = graft.sources.Tables.events(spark, sf)
      .agg(datediff(to_date(max(col("ts"))), to_date(min(col("ts")))))
      .head.getInt(0) + 1
    assert(rows.map(_.getAs[Long]("n_days")).sum === (span - 6).toLong)
  }

  test("event reciprocity: bounds hold and reciprocated edges pair up") {
    val r = Temporal.eventReciprocity(spark, sf).head
    assert(r.getAs[Long]("n_recip_edges") <= r.getAs[Long]("n_edges"))
    assert(r.getAs[Long]("n_recip_trans") <= r.getAs[Long]("n_trans"))
    assert(r.getAs[Long]("n_recip_edges") % 2 === 0L) // (a,b) ⇒ (b,a)
    val er = r.getAs[Double]("edge_reciprocity")
    val wr = r.getAs[Double]("weight_reciprocity")
    assert(er >= 0.0 && er <= 1.0 && wr >= 0.0 && wr <= 1.0)
  }

  test("graph components: edges never cross components; id is the min member") {
    val comp = Graph.graphComponents(spark, sf).collect()
      .map(r => r.getAs[String]("skill") ->
        (r.getAs[String]("component_id"), r.getAs[Long]("comp_size"))).toMap
    val edges = TextAnalysis.skillCooccurrence(spark, sf)
      .select(col("skill_a"), col("skill_b")).collect()
    edges.foreach { e =>
      assert(comp(e.getString(0))._1 === comp(e.getString(1))._1)
    }
    comp.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min === cid)
      members.values.foreach { case (_, sz) =>
        assert(sz === members.size.toLong) }
    }
  }

  test("monthly churn: retained bounded by both month bases, churn consistent") {
    val rows = Analytics.monthlyChurn(spark, sf).collect()
      .sortBy(r => (r.getAs[Long]("y"), r.getAs[Long]("m")))
    rows.foreach { r =>
      val (a, ret) = (r.getAs[Long]("active"), r.getAs[Long]("retained"))
      val prev = ret + r.getAs[Long]("churned") // = prev_active
      assert(ret <= a && ret <= prev)
      assert(r.getAs[Long]("churned") >= 0L)
    }
    // prev_active reconstructed from churned+retained must equal the
    // prior row's active (the panel is self-consistent month to month)
    rows.sliding(2).foreach {
      case Array(p, c) =>
        assert(c.getAs[Long]("retained") + c.getAs[Long]("churned") ===
          p.getAs[Long]("active"))
      case _ => ()
    }
  }

  test("abc classification partitions each brand's parts") {
    val rows = Analytics.abcClassification(spark, sf).collect()
    rows.foreach(r => assert(Set("A", "B", "C")(r.getAs[String]("abc_class"))))
    val nParts = rows.map(_.getAs[Long]("n_parts")).sum
    val expect = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("p_partkey")).distinct().count()
    assert(nParts === expect)
  }

  test("basket profile: shares sum to 1, items reconcile to lineitem count") {
    val rows = Analytics.basketProfile(spark, sf).collect()
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    val items = rows.map(r =>
      r.getAs[Long]("n_items") * r.getAs[Long]("n_orders")).sum
    assert(items === graft.sources.Tables.lineitem(spark, sf).count())
  }

  test("corpus profiles: densities and shares stay in bounds") {
    TextAnalysis.stopwordDensity(spark, sf).collect().foreach { r =>
      val d = r.getAs[Double]("stop_density")
      assert(d >= 0.0 && d <= 1.0)
      assert(r.getAs[Long]("n_stop") <= r.getAs[Long]("n_tokens"))
    }
    TextAnalysis.hapaxRate(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("hapax") <= r.getAs[Long]("vocab"))
      val h = r.getAs[Double]("hapax_rate")
      assert(h >= 0.0 && h <= 1.0)
    }
    TextAnalysis.wordLengthProfile(spark, sf).collect().foreach { r =>
      val m = r.getAs[Double]("mean_len")
      assert(m >= 1.0 && m <= r.getAs[Long]("max_len").toDouble)
      val ls = r.getAs[Double]("long_share")
      assert(ls >= 0.0 && ls <= 1.0)
    }
    TextAnalysis.charClassProfile(spark, sf).collect().foreach { r =>
      val (d, u, sp) = (r.getAs[Double]("digit_share"),
        r.getAs[Double]("upper_share"), r.getAs[Double]("space_share"))
      Seq(d, u, sp).foreach(x => assert(x >= 0.0 && x <= 1.0))
      assert(d + u + sp <= 1.0 + 1e-9) // disjoint ASCII classes
    }
  }

  test("jonckheere-terpstra matches the worked example and the corpus bounds") {
    import spark.implicits._
    // groups 1:{1,3} 2:{2,4} 3:{5,6} — U12=3, U13=4, U23=4, JT=11;
    // E = (36-12)/4 = 6, Var = (36·15 - 3·4·7)/72 = 456/72
    val cells = Seq((1, 1.0, 1L), (1, 3.0, 1L), (2, 2.0, 1L),
      (2, 4.0, 1L), (3, 5.0, 1L), (3, 6.0, 1L))
      .toDF("g", "v", "c").localCheckpoint()
    val r = Inference.jtFromCells(cells).head
    assert(r.getAs[Long]("jt_x2") === 22L)
    assert(r.getAs[Long]("e_x2") === 12L)
    assert(math.abs(r.getAs[Double]("z")
      - 5.0 / math.sqrt(456.0 / 72.0)) < 1e-12)
    // ties: two equal singleton groups give JT = 1/2 = E, z = 0
    val tied = Seq((1, 7.0, 1L), (2, 7.0, 1L)).toDF("g", "v", "c")
      .localCheckpoint()
    val t = Inference.jtFromCells(tied).head
    assert(t.getAs[Long]("jt_x2") === 1L)
    assert(t.getAs[Long]("e_x2") === 1L)
    assert(t.getAs[Double]("z") === 0.0)
    // corpus: jt_x2 bounded by twice the cross-pair count (= 2·e_x2)
    val c = Inference.jonckheereTerpstra(spark, sf).head
    assert(c.getAs[Long]("jt_x2") >= 0L)
    assert(c.getAs[Long]("jt_x2") <= 2L * c.getAs[Long]("e_x2"))
  }

  test("sentence stats: means and shares within structural bounds") {
    TextAnalysis.sentenceStats(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_sentences") >= r.getAs[Long]("n_docs"))
      val mspd = r.getAs[Double]("mean_sentences_per_doc")
      assert(mspd >= 1.0 && mspd <= r.getAs[Long]("max_sentences").toDouble)
      val share = r.getAs[Double]("single_sentence_share")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("repurchase gaps: quartiles ordered, nonnegative, counts reconcile") {
    import graft.sources.Tables
    val rows = Stats.repurchaseGapQuartiles(spark, sf).collect()
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getAs[Long]("p25"), r.getAs[Long]("p50"),
        r.getAs[Long]("p75"))
      assert(p25 >= 0L && p25 <= p50 && p50 <= p75)
      assert(r.getAs[Double]("mean_gap") >= 0.0)
    }
    // gap count = orders - customers-with-orders (one lag loss each)
    val orders = Tables.orders(spark, sf)
    val expect = orders.count() -
      orders.select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum === expect)
  }

  test("brand rank movers: each month ranks 1..brands; deltas reconcile") {
    val rows = Analytics.brandRankMovers(spark, sf).collect()
    val byMonth = rows.groupBy(r =>
      (r.getAs[Long]("y"), r.getAs[Long]("m")))
    byMonth.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rnk")).min === 1L)
      assert(rs.map(_.getAs[Long]("rnk")).max <= rs.length.toLong)
    }
    // any non-first month: deltas against the previous month's ranks
    rows.filter(r => !r.isNullAt(r.fieldIndex("prev_rnk"))).foreach { r =>
      assert(r.getAs[Long]("rank_delta") ===
        r.getAs[Long]("prev_rnk") - r.getAs[Long]("rnk"))
    }
  }

  test("silhouette: separated clusters score positive, a mislabel negative") {
    import spark.implicits._
    // two tight clusters far apart in dim 0; vec 5 carries cluster 1's
    // geometry but label 0 — the planted mislabel
    def v(x: Float): Array[Float] = Array(x, 0f, 0f, 0f)
    val e = Seq(
      (1L, 0, v(0.0f)), (2L, 0, v(0.1f)), (3L, 0, v(0.2f)),
      (4L, 1, v(8.0f)), (5L, 0, v(8.1f)), (6L, 1, v(8.2f)))
      .toDF("vec_id", "label", "embedding").localCheckpoint()
    val rows = Similarity.silhouetteFrom(e).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("sil")).toMap
    assert(rows(1L) > 0.5 && rows(2L) > 0.5)
    assert(rows(4L) > 0.5 && rows(6L) > 0.5)
    assert(rows(5L) < 0.0, s"mislabel scored ${rows(5L)}")
    // corpus: every silhouette in [-1, 1], a/b nonnegative
    Similarity.silhouetteSimplified(spark, sf).collect().foreach { r =>
      val s0 = r.getAs[Double]("sil")
      assert(s0 >= -1.0 && s0 <= 1.0)
      assert(r.getAs[Double]("a_dist") >= 0.0)
      assert(r.getAs[Double]("b_dist") >= 0.0)
    }
  }

  test("discount elasticity: fits bounded, counts reconcile to lineitem") {
    val rows = Analytics.discountElasticity(spark, sf).collect()
    rows.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      if (!r.isNullAt(r.fieldIndex("r2")))
        assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12)
    }
    assert(rows.map(_.getAs[Long]("n")).sum ===
      graft.sources.Tables.lineitem(spark, sf).count())
  }

  test("HITS: pure source is all hub, pure sink all authority; mass normalized") {
    import spark.implicits._
    // one user, chain A -> B repeated: A only ever launches, B only
    // ever lands — hub(A) = authority(B) = HitsScale, the duals 0
    val chain = Seq(
      (1L, "A", 1L, 1L), (1L, "B", 2L, 2L),
      (2L, "A", 1L, 3L), (2L, "B", 2L, 4L))
      .toDF("user_id", "event_type", "t", "event_id").localCheckpoint()
    val m = Inference.hitsFrom(chain).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("hub_fp"), r.getAs[Long]("authority_fp"))).toMap
    assert(m("A") === ((Inference.HitsScale, 0L)))
    assert(m("B") === ((0L, Inference.HitsScale)))
    // corpus: scores bounded, each L1 mass within k floor-losses of 1
    val rows = Inference.hitsTransitions(spark, sf).collect()
    val k = rows.length
    Seq("authority_fp", "hub_fp").foreach { c =>
      val v = rows.map(_.getAs[Long](c))
      v.foreach(x => assert(x >= 0L && x <= Inference.HitsScale))
      assert(v.sum > Inference.HitsScale - k && v.sum <= Inference.HitsScale)
    }
  }

  test("kendall W: perfect agreement 1, perfect reversal low, corpus in [0,1]") {
    import spark.implicits._
    // 3 judges, 4 items, identical rankings: W = 1, Friedman = k(n-1)
    val perfect = (for (m <- 1 to 3; i <- 1 to 4)
      yield (m.toLong, s"b$i", i.toLong)).toDF("mi", "p_brand", "rnk")
    val p = Analytics.kendallWCore(perfect.localCheckpoint()).head
    assert(p.getAs[Double]("w") === 1.0)
    assert(p.getAs[Double]("friedman_chi2") === 3.0 * 3)
    // 2 judges in perfect reversal: rank sums all equal, W = 0
    val rev2 = (for (i <- 1 to 4) yield Seq(
      (1L, s"b$i", i.toLong), (2L, s"b$i", (5 - i).toLong)
    )).flatten.toDF("mi", "p_brand", "rnk")
    assert(Analytics.kendallWCore(rev2.localCheckpoint())
      .head.getAs[Double]("w") === 0.0)
    // corpus: W and chi2 bounded and mutually consistent
    val c = Analytics.kendallWBrands(spark, sf).head
    val wv = c.getAs[Double]("w")
    assert(wv >= 0.0 && wv <= 1.0)
    assert(math.abs(c.getAs[Double]("friedman_chi2")
      - c.getAs[Long]("k_months") * (c.getAs[Long]("n_brands") - 1)
        * wv) < 1e-9)
  }

  test("transition latency: quartiles ordered, counts reconcile to transitions") {
    val rows = Temporal.transitionLatencyQuartiles(spark, sf).collect()
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getAs[Long]("p25_us"),
        r.getAs[Long]("p50_us"), r.getAs[Long]("p75_us"))
      assert(p25 >= 0L && p25 <= p50 && p50 <= p75)
      assert(r.getAs[Double]("mean_us") >= 0.0)
    }
    // total gap count = events - users (one lead loss per user)
    import graft.sources.Tables
    val ev = Tables.events(spark, sf)
    val expect = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum === expect)
  }

  test("token-sort dedup groups are a coarsening of exact-hash groups") {
    val exact = Dedup.dedupExactHash(spark, sf)
    val sorted = Dedup.dedupTokenSort(spark, sf)
    assert(sorted.count() <= exact.count()) // reordering only merges
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(sorted.agg(sum(col("n_copies"))).head.getLong(0) === docs)
  }
}
