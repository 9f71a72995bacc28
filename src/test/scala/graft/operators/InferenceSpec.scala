package graft.operators

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Constructed-corpus behavior checks for the statistical-inference
  * tier: closed-form values on hand-checkable inputs, plus the exact
  * fixed-point invariants the oracle parity rests on.
  */
class InferenceSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("chi2: closed-form value on a hand-checked 2x2 table") {
    // obs = [[10,20],[30,40]]: rt=(30,70), ct=(40,60), N=100
    // chi2 = 4/12 + 4/18 + 4/28 + 4/42 = 0.79365...
    val rows =
      Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
        Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val out = Inference.chi2(rows.toDF("prio", "status")).collect()
    assert(out.length === 4)
    val byCell = out.map(r =>
      (r.getAs[String]("prio"), r.getAs[String]("status")) -> r).toMap
    val ax = byCell(("a", "x"))
    assert(ax.getAs[Long]("obs") === 10L)
    assert(ax.getAs[Double]("expected") === 12.0)
    assert(math.abs(ax.getAs[Double]("contrib") - 4.0 / 12.0) < 2e-6)
    val expected = 4.0 / 12 + 4.0 / 18 + 4.0 / 28 + 4.0 / 42
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("chi2") - expected) < 1e-5)
      assert(r.getAs[Long]("dof") === 1L)
    }
  }

  test("chi2: independent margins give ~zero statistic") {
    // perfectly proportional table: obs = rt*ct/N exactly
    val rows = for {
      (a, na) <- Seq("a" -> 1, "b" -> 3)
      (b, nb) <- Seq("x" -> 2, "y" -> 5)
      _ <- 0 until na * nb
    } yield (a, b)
    val chi2 = Inference.chi2(rows.toDF("prio", "status"))
      .select("chi2").head.getDouble(0)
    assert(chi2 === 0.0)
  }

  test("markov stationary: known two-state chain converges to (1/3, 2/3)") {
    // A always moves to B; B splits evenly between A and B. One user
    // per observed transition keeps the empirical matrix exact:
    // P = [[0,1],[.5,.5]] => pi = (1/3, 2/3)
    val seqs =
      Seq.fill(10)(Seq("A", "B")) ++ // A->B x10
        Seq.fill(5)(Seq("B", "A")) ++ // B->A x5
        Seq.fill(5)(Seq("B", "B")) // B->B x5
    val ev = seqs.zipWithIndex.flatMap { case (states, u) =>
      states.zipWithIndex.map { case (st, i) =>
        (u.toLong, st, i.toLong, (u * 100 + i).toLong)
      }
    }.toDF("user_id", "event_type", "t", "event_id")
    val pi = Inference.markovStationaryFrom(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("pi")).toMap
    assert(math.abs(pi("A") - 1.0 / 3.0) < 1e-3)
    assert(math.abs(pi("B") - 2.0 / 3.0) < 1e-3)
  }

  test("markov stationary: dangling state keeps its mass via self-loop") {
    // C is only ever entered, never left: all mass ends in C
    val ev = Seq.tabulate(4)(u =>
      Seq((u.toLong, "A", 0L, u * 10L), (u.toLong, "C", 1L, u * 10L + 1)))
      .flatten.toDF("user_id", "event_type", "t", "event_id")
    val pi = Inference.markovStationaryFrom(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("pi")).toMap
    assert(pi("C") > 0.999)
    assert(pi.getOrElse("A", 0.0) < 1e-3)
  }

  test("link prediction RA: path graph scores the two-hop pair 1/deg(hub)") {
    // edges a-b, b-c, b-d: non-edges {a-c, a-d, c-d} all via hub b
    // (deg 3) => RA = 1/3, one common neighbor each
    val cooc = Seq(("a", "b"), ("b", "c"), ("b", "d")).toDF("skill_a", "skill_b")
    val out = Inference.linkPredictionFromPairs(cooc).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("common_neighbors") === 1L)
      assert(math.abs(r.getAs[Double]("ra_score") - 1.0 / 3.0) < 2e-6)
    }
    val pairs = out.map(r =>
      (r.getAs[String]("skill_a"), r.getAs[String]("skill_b"))).toSet
    assert(pairs === Set(("a", "c"), ("a", "d"), ("c", "d")))
  }

  test("link prediction RA: existing edges are excluded; triangle yields nothing") {
    val cooc = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("skill_a", "skill_b")
    assert(Inference.linkPredictionFromPairs(cooc).count() === 0L)
  }

  test("survival hazard: constructed lifetimes produce the exact KM table") {
    // corpus ends day 100. Users: two live 0 weeks (one churned early,
    // one still active at the end), two live 2 weeks (one churned, one
    // censored by recency)
    def ev(u: Long, firstDay: Int, lastDay: Int) = Seq(
      (u, java.sql.Timestamp.valueOf(f"2024-01-${firstDay}%02d 00:00:00")),
      (u, java.sql.Timestamp.valueOf(f"2024-01-${lastDay}%02d 00:00:00")))
    val rows = ev(1, 2, 2) ++ ev(2, 28, 28) ++ ev(3, 1, 15) ++
      ev(4, 14, 28) // ends at corpus end -> censored
    val out = Inference.survivalHazardFrom(rows.toDF("user_id", "ts"))
      .collect().map(r => r.getAs[Long]("week") ->
        (r.getAs[Long]("at_risk"), r.getAs[Long]("churned"))).toMap
    // week 0: all 4 at risk; user1 churned (day2 << day28-7), user2
    // last-seen at corpus end -> censored
    assert(out(0L) === (4L, 1L))
    // week 2: users 3 and 4 at risk; user3 churned (day15 < day21)
    assert(out(2L) === (2L, 1L))
  }

  test("diversity: uniform users maximize gini_simpson, single user zeroes it") {
    val rows = (1 to 4).map(u => ("spread", u.toLong)) ++
      Seq.fill(4)(("concentrated", 9L))
    val df = rows.toDF("event_type", "user_id")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    // build through the same aggregate the registered query uses
    val peru = df.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("ni"))
    val out = peru.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"), sum(col("ni")).as("n_events"),
        sum(col("ni") * (col("ni") - 1)).as("coll"))
      .select(col("event_type"),
        (col("coll").cast("double")
          / (col("n_events") * (col("n_events") - 1)).cast("double"))
          .as("simpson"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("spread") === 0.0) // every draw pair distinct users
    assert(out("concentrated") === 1.0) // all from one user
  }

  test("hhi: monopoly=10000, equal split approaches 10000/n") {
    val hhi = Inference.hhiConcentration(spark, sf).collect()
    assert(hhi.nonEmpty)
    hhi.foreach { r =>
      val v = r.getAs[Double]("hhi")
      val n = r.getAs[Long]("n_firms")
      assert(v > 0.0 && v <= 10000.0 + 1e-9)
      assert(v >= 10000.0 / n - 1e-9) // HHI lower bound at equal shares
    }
  }

  test("pii redaction: plants every category and counts progressively") {
    val doc = "mail me at a.b+c@ex-ample.org or visit " +
      "https://ex.com/p?x=1 from 10.0.0.1, call +1 (555) 123-4567."
    val df = Seq((1L, doc), (2L, "clean text, nothing to hide"))
      .toDF("doc_id", "text")
    val out = Curation.redactPii(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Int]("n_urls") === 1)
    assert(r1.getAs[Int]("n_emails") === 1)
    assert(r1.getAs[Int]("n_ips") === 1)
    assert(r1.getAs[Int]("n_phones") === 1)
    val red = r1.getAs[String]("redacted")
    assert(red.contains("<URL>") && red.contains("<EMAIL>")
      && red.contains("<IP>") && red.contains("<PHONE>"))
    assert(!red.contains("ex.com") && !red.contains("ample.org")
      && !red.contains("10.0.0.1") && !red.contains("555"))
    val r2 = out(2L)
    assert(r2.getAs[String]("redacted") === "clean text, nothing to hide")
    assert(r2.getAs[Int]("n_urls") + r2.getAs[Int]("n_emails")
      + r2.getAs[Int]("n_ips") + r2.getAs[Int]("n_phones") === 0)
  }

  test("pii redaction: a URL's embedded IP and email count once, as URL") {
    val df = Seq((1L, "see http://10.1.2.3/reset?u=bob@ex.org now"))
      .toDF("doc_id", "text")
    val r = Curation.redactPii(df, "doc_id", "text").head
    assert(r.getAs[Int]("n_urls") === 1)
    assert(r.getAs[Int]("n_emails") === 0)
    assert(r.getAs[Int]("n_ips") === 0)
  }

  test("mann-kendall: monotone series maxes S; shuffled flat series zeroes it") {
    import spark.implicits._
    // strictly increasing 10-day series: every pair concordant,
    // S = 45 = n(n-1)/2, no ties -> var18 = 10*9*25 = 2250
    val up = (0L until 10L).map(i => (i, 100L + i)).toDF("di", "n")
    val r = Inference.mannKendallFrom(up.localCheckpoint()).head
    assert(r.getAs[Long]("s_stat") === 45L)
    assert(r.getAs[Long]("var18") === 2250L)
    assert(r.getAs[Double]("z") ===
      44.0 / math.sqrt(2250.0 / 18.0))
    // constant series: S = 0, z = 0, and the tie term swallows var
    val flat = (0L until 6L).map(i => (i, 7L)).toDF("di", "n")
    val rf = Inference.mannKendallFrom(flat.localCheckpoint()).head
    assert(rf.getAs[Long]("s_stat") === 0L)
    assert(rf.getAs[Long]("var18") === 0L)
    assert(rf.getAs[Double]("z") === 0.0)
  }

  test("theil-sen: recovers a planted slope through 29% outliers where OLS cannot") {
    import spark.implicits._
    // y = 3x with two wild outliers among 7 points: the pairwise-slope
    // median still lands exactly on 3 (10 of 21 pairs touch an outlier
    // — under half), while the OLS slope is dragged far off
    val pts = Seq((0L, 0L), (1L, 3L), (2L, 6L), (3L, 1000L), (4L, 12L),
      (5L, 15L), (6L, -500L)).toDF("di", "n")
    val r = Inference.theilSenFrom(pts.localCheckpoint()).head
    assert(r.getAs[Long]("n_pairs") === 21L)
    assert(r.getAs[Double]("ts_slope") === 3.0)
  }

  test("ks: hand-checked two-sample distance, and zero for identical samples") {
    // A = {1,2}, B = {2,3}: F_a(1)=.5, F_b(1)=0 -> D = 0.5 at v=1
    val vals = Seq((1.0, 1L, 0L), (2.0, 1L, 1L), (3.0, 0L, 1L))
      .toDF("v", "a", "b")
    val r = Inference.ksFrom(vals).head
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("d_num") === 2L)
    assert(r.getAs[Double]("d_stat") === 0.5)
    val same = Seq((1.0, 2L, 2L), (5.0, 3L, 3L)).toDF("v", "a", "b")
    assert(Inference.ksFrom(same).head.getAs[Double]("d_stat") === 0.0)
  }

  test("ks: cumCounts two-phase prefix sums cross bucket boundaries exactly") {
    // values straddle several RankBucket ranges; compare against a
    // driver-side running total
    val vals = Seq(100.0, 4999.0, 5000.0, 10000.0, 25000.1, 99999.9)
      .zipWithIndex.map { case (v, i) => (v, (i + 1).toLong, (6L - i)) }
    val cc = Inference.cumCounts(vals.toDF("v", "a", "b"))
      .orderBy("v").collect()
    var (ra, rb) = (0L, 0L)
    vals.sortBy(_._1).zip(cc).foreach { case ((v, a, b), row) =>
      ra += a; rb += b
      assert(row.getAs[Double]("v") === v)
      assert(row.getAs[Long]("ca") === ra, s"ca at $v")
      assert(row.getAs[Long]("cb") === rb, s"cb at $v")
    }
  }

  test("mann-whitney: hand-checked U and tie-corrected z") {
    // A = {1,2}, B = {2,3}: U_a = 0.5 (one tie), ties term = 6
    // z = (0.5 - 2) / sqrt(4/12 * (5 - 6/12)) = -1.5/sqrt(1.5)
    val vals = Seq((1.0, 1L, 0L), (2.0, 1L, 1L), (3.0, 0L, 1L))
      .toDF("v", "a", "b")
    val r = Inference.mannWhitneyFrom(vals).head
    assert(r.getAs[Double]("u_a") === 0.5)
    assert(r.getAs[Double]("u_b") === 3.5)
    assert(math.abs(r.getAs[Double]("z") - (-1.5 / math.sqrt(1.5))) < 1e-12)
  }

  test("welch t: hand-checked means, t and df on two constructed groups") {
    // A = {1,2,3}: mean 2, var 1; B = {4,6}: mean 5, var 2
    // t = -3 / sqrt(1/3 + 1) = -2.598...; df = (4/3)^2/((1/3)^2/2 + 1)
    val ev = (Seq(1.0, 2.0, 3.0).map(("A", _)) ++ Seq(4.0, 6.0).map(("B", _)))
      .toDF("event_type", "value")
    val r = Inference.welchFrom(ev).head
    assert(r.getAs[String]("type_a") === "A")
    assert(r.getAs[Double]("mean_a") === 2.0)
    assert(r.getAs[Double]("mean_b") === 5.0)
    assert(math.abs(r.getAs[Double]("t") - (-3.0 / math.sqrt(4.0 / 3.0))) < 1e-12)
    val dfExp = (4.0 / 3.0) * (4.0 / 3.0) /
      ((1.0 / 3.0) * (1.0 / 3.0) / 2.0 + 1.0)
    assert(math.abs(r.getAs[Double]("df") - dfExp) < 1e-12)
  }

  test("benford: digits in 1..9, shares sum to one, constants match the map") {
    val rows = Inference.benfordDigits(spark, sf).collect()
    assert(rows.nonEmpty)
    val expected = Inference.BenfordP.toMap.map { case (d, p) => d -> p.toDouble }
    rows.foreach { r =>
      val d = r.getAs[Int]("digit")
      assert(d >= 1 && d <= 9)
      assert(r.getAs[Double]("benford_p") === expected(d))
      assert(math.abs(r.getAs[Double]("deviation")
        - (r.getAs[Double]("share") - expected(d))) < 1e-15)
    }
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
  }

  test("wilson ci: brackets p, stays in [0,1], and matches the exact formula") {
    val z = Inference.WilsonZ.toDouble
    val rows = Inference.conversionWilsonCi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_total").toDouble
      val p = r.getAs[Long]("n_users").toDouble / n
      val z2n = z * z / n
      val center = (p + z2n / 2.0) / (1.0 + z2n)
      val half = (z / (1.0 + z2n)) *
        math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
      // identical double expression tree -> exact equality
      assert(r.getAs[Double]("p") === p)
      assert(r.getAs[Double]("ci_lo") === center - half)
      assert(r.getAs[Double]("ci_hi") === center + half)
      assert(r.getAs[Double]("ci_lo") >= 0.0 - 1e-15)
      assert(r.getAs[Double]("ci_hi") <= 1.0 + 1e-15)
      assert(r.getAs[Double]("ci_lo") <= p && p <= r.getAs[Double]("ci_hi"))
    }
  }

  test("seasonality: exact cross-multiplied indices over a complete week frame") {
    val rows = Inference.seasonalityDow(spark, sf).collect()
    val td = rows.map(_.getAs[Long]("n_days")).sum
    val te = rows.map(_.getAs[Long]("n_events")).sum
    rows.foreach { r =>
      assert(r.getAs[Int]("iso_dow") >= 1 && r.getAs[Int]("iso_dow") <= 7)
      val expect = (r.getAs[Long]("n_events") * td).toDouble /
        (r.getAs[Long]("n_days") * te).toDouble
      assert(r.getAs[Double]("seasonal_index") === expect)
    }
  }

  test("acf: r bounded by 1, overlap shrinks by exactly one day per lag") {
    val rows = Inference.acfDaily(spark, sf).collect()
      .map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("r"))).toMap
    assert(rows.keySet === (1L to 7L).toSet)
    val base = rows(1L)._1
    (1L to 7L).foreach { lag =>
      assert(rows(lag)._1 === base - (lag - 1))
      assert(math.abs(rows(lag)._2) <= 1.0 + 1e-12)
    }
  }

  test("gini: every market in [0,1), and zero for a perfectly equal corpus") {
    Inference.giniRevenue(spark, sf).collect().foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 - 1e-12 && g < 1.0, r.getAs[String]("nation"))
    }
  }

  test("cluster balance: weights invert cluster mass and preserve corpus total") {
    val rows = Similarity.clusterBalanceWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    val nt = rows.map(_.getAs[Long]("n_vecs")).sum
    val kk = rows.length
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") > 0L)
      val expect = nt.toDouble / (kk.toLong * r.getAs[Long]("n_vecs")).toDouble
      assert(r.getAs[Double]("weight") === expect)
    }
    // cluster-uniform resampling preserves total mass: sum n_c * w_c = N
    val mass = rows.map(r => r.getAs[Long]("n_vecs") * r.getAs[Double]("weight")).sum
    assert(math.abs(mass - nt.toDouble) < 1e-6 * nt)
  }

  test("kcore: triangle survives 2-core peeling, pendant path peels away") {
    // triangle a-b-c plus path c-d-e: d and e peel in successive
    // sweeps (e first, then d), the triangle keeps degree 2
    val cooc = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("skill_a", "skill_b")
    val out = Graph.kcoreFromPairs(cooc).collect()
      .map(r => r.getAs[String]("skill") -> r.getAs[Long]("core_deg")).toMap
    assert(out === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("kcore: a bare cycle is exactly its own 2-core") {
    val cooc = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"))
      .toDF("skill_a", "skill_b")
    val out = Graph.kcoreFromPairs(cooc).collect()
    assert(out.length === 4)
    assert(out.forall(_.getAs[Long]("core_deg") === 2L))
  }

  test("cusum: planted level shift is found at the shift boundary") {
    // 10 days at 2/day then 10 days at 10/day: |D_t| peaks at day 10
    val rows = (1 to 10).flatMap(d => Seq.fill(2)((d, "x"))) ++
      (11 to 20).flatMap(d => Seq.fill(10)((d, "x")))
    val ev = rows.zipWithIndex.map { case ((d, _), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-03-$d%02d 12:00:00"), 1L)
    }.toDF("event_id", "ts", "user_id")
    val tmp = java.nio.file.Files.createTempDirectory("graft_cusum").toString
    ev.withColumn("event_type", lit("x"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Inference.cusumChangepoint(spark, tmp).head
    assert(r.getAs[java.sql.Date]("changepoint_day").toString === "2024-03-10")
    assert(r.getAs[Double]("mean_pre") === 2.0)
    assert(r.getAs[Double]("mean_post") === 10.0)
  }

  test("lexical diversity: hand-checked ttr and hapax share") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lex").toString
    Seq((1L, "a a b c", "en", "s"), (2L, "x x x x", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.lexicalDiversity(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_tokens") === 4L)
    assert(d1.getAs[Long]("n_types") === 3L)
    assert(d1.getAs[Long]("n_hapax") === 2L)
    assert(d1.getAs[Double]("ttr") === 0.75)
    assert(d1.getAs[Double]("hapax_share") === 0.5)
    val d2 = out(2L)
    assert(d2.getAs[Long]("n_types") === 1L && d2.getAs[Long]("n_hapax") === 0L)
    assert(d2.getAs[Double]("ttr") === 0.25)
  }

  test("event trigrams: conditional next-step shares sum to one per bigram") {
    val rows = Temporal.eventTrigrams(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getAs[String]("t1"), r.getAs[String]("t2")))
      .foreach { case (bg, rs) =>
        val tot = rs.map(_.getAs[Double]("p_next")).sum
        assert(math.abs(tot - 1.0) < 1e-9, s"bigram $bg shares sum $tot")
      }
  }

  test("spearman: monotone association is exactly +/-1, ties handled by average ranks") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_spear").toString
    def write(rows: Seq[(Double, Double)]): Unit =
      rows.toDF("l_quantity", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    write(Seq(1.0 -> 10.0, 2.0 -> 20.0, 3.0 -> 45.0, 4.0 -> 99.0))
    assert(Inference.spearmanRho(spark, tmp).head.getAs[Double]("rho") === 1.0)
    write(Seq(1.0 -> 99.0, 2.0 -> 45.0, 3.0 -> 20.0, 4.0 -> 10.0))
    assert(Inference.spearmanRho(spark, tmp).head.getAs[Double]("rho") === -1.0)
    // tie block in x: hand-computed rho on {(1,1),(2,2),(2,3),(3,4)}
    // 2rx = (2,5,5,8), 2ry = (2,4,6,8) -> rho = 18/sqrt(18*20)
    write(Seq(1.0 -> 1.0, 2.0 -> 2.0, 2.0 -> 3.0, 3.0 -> 4.0))
    val rho = Inference.spearmanRho(spark, tmp).head.getAs[Double]("rho")
    assert(math.abs(rho - 18.0 / math.sqrt(18.0 * 20.0)) < 1e-12)
  }

  test("bootstrap: B resamples, Poisson(1) mass near n, means bracket the truth") {
    val rows = Inference.bootstrapMeans(spark, sf).collect()
    assert(rows.length === Inference.BootstrapB)
    val n = graft.sources.Tables.orders(spark, sf).count()
    val truth = graft.sources.Tables.orders(spark, sf)
      .agg(avg(col("o_totalprice"))).head.getDouble(0)
    rows.foreach { r =>
      // E[n_eff] = n, sd ~ sqrt(n): 5 sigma at sf0.001 is ~13%
      assert(math.abs(r.getAs[Long]("n_eff") - n).toDouble / n < 0.15)
      assert(math.abs(r.getAs[Double]("mean_price") - truth) / truth < 0.1)
    }
    // resamples must differ from each other (the hash varies with b)
    assert(rows.map(_.getAs[Long]("n_eff")).distinct.length > 1)
  }

  test("span corruption: exact block accounting and a ~15% corpus mask rate") {
    val rows = Curation.spanCorruptionPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val blocks = r.getAs[Long]("n_blocks")
      assert(blocks === (n + Curation.SpanLen - 1) / Curation.SpanLen)
      assert(r.getAs[Long]("n_masked_tokens") <=
        r.getAs[Long]("n_masked_blocks") * Curation.SpanLen)
      assert(r.getAs[Double]("mask_rate") >= 0.0
        && r.getAs[Double]("mask_rate") <= 1.0)
    }
    val rate = rows.map(_.getAs[Long]("n_masked_tokens")).sum.toDouble /
      rows.map(_.getAs[Long]("n_tokens")).sum
    assert(rate > 0.10 && rate < 0.20, s"corpus mask rate $rate")
  }

  test("odds ratio: cells partition the user base; hand-check on constructed flags") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_or").toString
    // users: 3 signup+purchase, 1 signup only, 2 purchase only, 4 neither
    val rows =
      (1 to 3).flatMap(u => Seq((u.toLong, "signup"), (u.toLong, "purchase"))) ++
        Seq((4L, "signup")) ++ (5 to 6).map(u => (u.toLong, "purchase")) ++
        (7 to 10).map(u => (u.toLong, "view"))
    rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Inference.oddsRatioFunnel(spark, tmp).head
    assert((r.getAs[Long]("a"), r.getAs[Long]("b"),
      r.getAs[Long]("c"), r.getAs[Long]("d")) === ((3L, 1L, 2L, 4L)))
    // Haldane-corrected: OR = (3.5*4.5)/(1.5*2.5); RR = (3.5/5)/(2.5/7)
    assert(r.getAs[Double]("odds_ratio") === (3.5 * 4.5) / (1.5 * 2.5))
    assert(r.getAs[Double]("risk_ratio") === (3.5 / (3.5 + 1.5)) / (2.5 / (2.5 + 4.5)))
  }

  test("dsir: target-vocabulary docs outrank raw-vocabulary docs (planted corpus)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    val docs = (
      (1 to 6).map(i => (i.toLong, "alpha beta alpha beta", "en", "s1")) ++
        (7 to 12).map(i => (i.toLong, "gamma delta gamma delta", "zz", "s2")) ++
        // held-out docs in each vocabulary, NOT in the target slice
        Seq((13L, "alpha beta alpha beta", "zz", "s2"),
          (14L, "gamma delta gamma delta", "zz", "s2")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val w = Curation.dsirWeights(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dsir_logw")).toMap
    // the held-out target-vocab doc must outrank the raw-vocab doc
    assert(w(13L) > w(14L))
    // and every target-vocab doc outranks every raw-only doc
    assert((1 to 6).map(i => w(i.toLong)).min > w(14L))
  }

  test("link prediction: existing edges are never predicted, either orientation") {
    // a complete triangle whose stored orientations disagree with
    // string order (id-canonical pairs): every wedge closes into an
    // existing edge, so NOTHING may be predicted (round-6 regression:
    // the id-oriented anti-join used to leak ('a','z') as a prediction
    // because the edge was stored ('z','a'))
    val cooc = Seq(("z", "a"), ("a", "m"), ("z", "m"))
      .toDF("skill_a", "skill_b").localCheckpoint()
    assert(Inference.linkPredictionFromPairs(cooc).count() === 0L)
    // drop one edge: exactly that pair must be predicted, once
    val open = Seq(("z", "a"), ("a", "m")).toDF("skill_a", "skill_b")
      .localCheckpoint()
    val out = Inference.linkPredictionFromPairs(open).collect()
    assert(out.length === 1)
    assert((out(0).getAs[String]("skill_a"), out(0).getAs[String]("skill_b"))
      === (("m", "z")))
    assert(out(0).getAs[Long]("common_neighbors") === 1L)
  }

  test("kruskal-wallis: closed-form H on untied and tied hand tables") {
    // {1,2,3} vs {4,5,6}: ranks 1..6, R=(6,15),
    // H = 12/42 * (36/3 + 225/3) - 21 = 27/7
    val out = Inference.kruskalWallisFrom(
      Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
        ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("grp", "v")).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("h") - 27.0 / 7.0) < 1e-12)
      // no ties: the correction is a no-op
      assert(r.getAs[Double]("h_tie") === r.getAs[Double]("h"))
      assert(r.getAs[Long]("dof") === 1L)
    }
    // {1,1} vs {2,2}: avg ranks (1.5, 3.5), H = 2.4,
    // ties sum(t^3-t)=12, C = 1-12/60 => H_tie = 3.0
    val tied = Inference.kruskalWallisFrom(
      Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)).toDF("grp", "v"))
      .head
    assert(math.abs(tied.getAs[Double]("h") - 2.4) < 1e-12)
    assert(math.abs(tied.getAs[Double]("h_tie") - 3.0) < 1e-12)
  }

  test("anova F core: exact cent-squared sums on a hand table") {
    // cents {100,200,300} vs {400,500,600}: SSB=135000, SSW=40000,
    // F = 135000 / (40000/4) = 13.5 — all floors divide exactly
    val r = Inference.fSelect(Inference.fCore(
      Seq(("a", 100), ("a", 200), ("a", 300),
        ("b", 400), ("b", 500), ("b", 600)).toDF("grp", "x")
        .select(col("grp"), col("x").cast("decimal(16,0)").as("x"))),
      "f_stat").head
    assert(r.getAs[Double]("ssb") === 13.5) // 135000 cent² = 13.5 $²
    assert(r.getAs[Double]("ssw") === 4.0)
    assert(r.getAs[Double]("f_stat") === 13.5)
    assert((r.getAs[Long]("df1"), r.getAs[Long]("df2")) === ((1L, 4L)))
  }

  test("brown-forsythe: identical spreads give W=0; unequal spreads don't") {
    def frame(rows: Seq[(String, Int)]) =
      rows.zipWithIndex.map { case ((g, x), i) => (g, x, i.toLong) }
        .toDF("grp", "x", "tie")
        .select(col("grp"), col("x").cast("decimal(16,0)").as("x"), col("tie"))
    // both groups deviate {0,0,20} around their medians => SSB of
    // deviations is 0 => W = 0 exactly
    val same = Inference.leveneFrom(frame(
      Seq(("a", 0), ("a", 0), ("a", 10), ("b", 0), ("b", 10), ("b", 10))))
      .head
    assert(same.getAs[Double]("w_stat") === 0.0)
    // a is constant, b spreads: W must be decisively positive
    val diff = Inference.leveneFrom(frame(
      Seq(("a", 5), ("a", 5), ("a", 5), ("b", 0), ("b", 20), ("b", 40))))
      .head
    assert(diff.getAs[Double]("w_stat") > 0.9)
  }

  test("runs test: alternation inflates runs (z>0 side), monotone deflates") {
    def ser(ns: Seq[Long]) =
      ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("di", "n")
        .localCheckpoint()
    // 0,10,0,10,... over 10 days: median 0, runs = 10,
    // mu = 1 + 50/10 = 6, var = 50*40/900 => z = 4/sqrt(2.222) = 2.683
    val alt = Inference.runsFrom(
      ser(Seq(0L, 10L, 0L, 10L, 0L, 10L, 0L, 10L, 0L, 10L))).head
    assert(alt.getAs[Long]("runs") === 10L)
    assert((alt.getAs[Long]("n_above"), alt.getAs[Long]("n_below")) ===
      ((5L, 5L)))
    assert(math.abs(alt.getAs[Double]("z") - 4.0 / math.sqrt(2000.0 / 900.0))
      < 1e-12)
    // 1..10 monotone: median 5 (lower), 5 above, runs = 2, z mirrored
    val mono = Inference.runsFrom(ser((1L to 10L))).head
    assert(mono.getAs[Long]("runs") === 2L)
    assert(math.abs(mono.getAs[Double]("z")
      + 4.0 / math.sqrt(2000.0 / 900.0)) < 1e-12)
  }

  test("durbin-watson: hand-computed oscillation; constant series is NULL") {
    def ser(ns: Seq[Long]) =
      ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("di", "n")
        .localCheckpoint()
    // n = 1,2,1,2,1: deltas ±1 so ΣΔ² = 4; N=5, Σn=7, Σn²=11
    // dw = 5·4 / (5·11 − 49) = 20/6 (> 2: oscillating, as built)
    val osc = Inference.dwFrom(ser(Seq(1L, 2L, 1L, 2L, 1L))).head
    assert(osc.getAs[Long]("n_days") === 5L)
    assert(osc.getAs[Double]("dw") === 20.0 / 6.0)
    // a smooth ramp has tiny ΣΔ² relative to variance: dw → 0 side
    val ramp = Inference.dwFrom(ser((1L to 20L))).head
    assert(ramp.getAs[Double]("dw") < 1.0)
    // constant series: zero variance denominator → NULL, not a throw
    val const = Inference.dwFrom(ser(Seq(5L, 5L, 5L))).head
    assert(const.isNullAt(const.fieldIndex("dw")))
    // corpus scale: d lands in [0, 4]
    val real = Inference.durbinWatsonDaily(spark, sf).head
    val d = real.getAs[Double]("dw")
    assert(d >= 0.0 && d <= 4.0)
  }

  test("cochran Q: hand-computed presence matrix; saturated matrix is NULL") {
    def pres(rows: Seq[(Long, String)]) =
      rows.toDF("user_id", "event_type").localCheckpoint()
    // u1:{A,B} u2:{A} u3:{A,B,C} → k=3, S=6, ΣC²=14, ΣR²=14
    // Q = 2·(42−36)/(18−14) = 3
    val q = Inference.cochranFrom(pres(Seq(
      1L -> "A", 1L -> "B", 2L -> "A",
      3L -> "A", 3L -> "B", 3L -> "C"))).head
    assert(q.getAs[Long]("k") === 3L)
    assert(q.getAs[Long]("n_users") === 3L)
    assert(q.getAs[Long]("n_present") === 6L)
    assert(q.getAs[Double]("q_stat") === 3.0)
    // every user fired every type: zero denominator → NULL
    val sat = Inference.cochranFrom(pres(
      for (u <- 1L to 3L; t <- Seq("A", "B")) yield u -> t)).head
    assert(sat.isNullAt(sat.fieldIndex("q_stat")))
    // k = 1 degenerates the numerator's (k−1) AND the denominator
    val one = Inference.cochranFrom(pres(Seq(1L -> "A", 2L -> "A"))).head
    assert(one.isNullAt(one.fieldIndex("q_stat")))
    // corpus scale: Q is nonnegative when defined
    val real = Inference.cochranQ(spark, sf).head
    if (!real.isNullAt(real.fieldIndex("q_stat")))
      assert(real.getAs[Double]("q_stat") >= 0.0)
  }

  test("cliffs delta: hand-checked dominance endpoints and tie midpoint") {
    def vals(rows: Seq[(Double, Long, Long)]) =
      rows.toDF("v", "a", "b").localCheckpoint()
    // a entirely below b → δ = −1; entirely above → +1; pure tie → 0
    assert(Inference.cliffsFrom(vals(Seq((1.0, 1L, 0L), (2.0, 1L, 0L),
      (3.0, 0L, 1L)))).head.getAs[Double]("delta") === -1.0)
    assert(Inference.cliffsFrom(vals(Seq((1.0, 0L, 1L), (2.0, 0L, 1L),
      (3.0, 1L, 0L)))).head.getAs[Double]("delta") === 1.0)
    assert(Inference.cliffsFrom(vals(Seq((5.0, 1L, 1L))))
      .head.getAs[Double]("delta") === 0.0)
    // empty cohort: undefined, NULL
    val e = Inference.cliffsFrom(vals(Seq((1.0, 1L, 0L)))).head
    assert(e.isNullAt(e.fieldIndex("delta")))
    // corpus scale: δ ∈ [−1, 1] and consistent with U's direction
    val real = Inference.cliffsDelta(spark, sf).head
    val d = real.getAs[Double]("delta")
    assert(d >= -1.0 && d <= 1.0)
    val u = Inference.mannWhitneyU(spark, sf).head
    val uA = u.getAs[Double]("u_a")
    val expected = 2.0 * uA / (u.getAs[Long]("n_a").toDouble *
      u.getAs[Long]("n_b").toDouble) - 1.0
    assert(math.abs(d - expected) < 1e-12)
  }

  test("cohens d: sign follows the means, Hedges shrinks toward zero") {
    val rows = Inference.cohensD(spark, sf).collect()
    val k = graft.sources.Tables.events(spark, sf)
      .select("event_type").distinct().count().toInt
    assert(rows.length === k * (k - 1) / 2)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("d"))) {
        val d = r.getAs[Double]("d")
        val dm = r.getAs[Double]("mean_a") - r.getAs[Double]("mean_b")
        assert(math.signum(d) === math.signum(dm))
        val g = r.getAs[Double]("hedges_g")
        assert(math.abs(g) <= math.abs(d)) // the correction only shrinks
        assert(math.signum(g) === math.signum(d) || g === 0.0)
      }
    }
  }

  test("quantile normalize: order-preserving, every source tops at the global max") {
    import graft.sources.Tables
    val rows = Curation.quantileNormalize(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    assert(rows.length === docs.toInt) // every doc mapped exactly once
    val globalMax = Tables.documents(spark, sf)
      .agg(max(col("n_chars"))).head.getLong(0)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      // within a source, the mapping preserves the length order
      val sorted = rs.sortBy(r =>
        (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      val norm = sorted.map(_.getAs[Long]("normalized_chars")).toSeq
      assert(norm === norm.sorted, s"non-monotone mapping for $src")
      // the source's top quantile maps to the global maximum
      assert(norm.last === globalMax, s"$src top != global max")
    }
  }

  test("lorenz deciles: monotone, under the equality line, closes at 1.0") {
    import graft.sources.Tables
    val rows = Inference.lorenzDeciles(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq === (1L to 10L))
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    // revenue sorted ascending: the curve sits on or under equality
    rows.foreach(r => assert(r.getAs[Double]("cum_share") <=
      r.getAs[Long]("decile") / 10.0 + 1e-12))
    assert(shares.last === 1.0)
    // exact recompute of decile 4 from raw revenues
    val revs = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(14,4)"))
        .cast("decimal(18,4)").as("rev"))
      .collect().map(r => r.getDecimal(1)).sortBy(d => BigDecimal(d))
    val cut = (4 * revs.length) / 10
    val expected = revs.take(cut).map(BigDecimal(_)).sum.toDouble /
      revs.map(BigDecimal(_)).sum.toDouble
    assert(math.abs(rows(3).getAs[Double]("cum_share") - expected) < 1e-12)
    assert(rows(3).getAs[Long]("n_cust_cum") === cut.toLong)
  }

  test("mcnemar: discordants bounded, statistic consistent with b and c") {
    val r = Inference.mcnemarTest(spark, sf).head
    val (n, b, c) = (r.getAs[Long]("n_users"), r.getAs[Long]("b"),
      r.getAs[Long]("c"))
    assert(b >= 0L && c >= 0L && b + c <= n)
    if (b + c > 0) {
      val num = math.max(math.abs(b - c) - 1, 0L)
      assert(r.getAs[Double]("chi2_cc") ===
        (num * num).toDouble / (b + c).toDouble)
    } else assert(r.isNullAt(r.fieldIndex("chi2_cc")))
  }

  test("anomaly MAD: exact integer flag, hand-checked spike; MAD=0 edge") {
    def ser(ns: Seq[Long]) =
      ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("di", "n")
        .localCheckpoint()
    // 1..9 then a 100 spike: med = 5 (lower), MAD = 2 (5th of the
    // sorted devs 0,1,1,2,2,3,3,4,4,95); only the spike clears
    // 1349·dev > 7000·2; mod_z = 0.6745·95/2
    val out = Inference.madFrom(ser((1L to 9L) :+ 100L)).collect()
    assert(out.length === 10)
    val flagged = out.filter(_.getAs[Boolean]("is_anomaly"))
    assert(flagged.length === 1)
    val r = flagged.head
    assert((r.getAs[Long]("di"), r.getAs[Long]("n"), r.getAs[Long]("med"),
      r.getAs[Long]("dev"), r.getAs[Long]("mad")) ===
      ((9L, 100L, 5L, 95L, 2L)))
    assert(r.getAs[Double]("mod_z") === 0.6745 * 95.0 / 2.0)
    // MAD = 0 (majority-constant series): any deviation flags, score
    // NULL — the documented Iglewicz-Hoaglin degenerate
    val z = Inference.madFrom(ser(Seq(10L, 10L, 10L, 10L, 11L))).collect()
      .filter(_.getAs[Boolean]("is_anomaly"))
    assert(z.length === 1)
    assert(z.head.getAs[Long]("dev") === 1L)
    assert(z.head.isNullAt(z.head.fieldIndex("mod_z")))
    // a constant series reports itself quiet, not empty
    val c = Inference.madFrom(ser(Seq(7L, 7L, 7L))).collect()
    assert(c.length === 3)
    assert(c.forall(!_.getAs[Boolean]("is_anomaly")))
  }

  test("qq deciles: monotone per cohort, hand-checked on constructed cohorts") {
    // cohort a = 10..100 by 10 (n=10), cohort b = a + 100
    val vals = ((1 to 10).map(i => (i * 10.0, 1L, 0L)) ++
      (1 to 10).map(i => (i * 10.0 + 100.0, 0L, 1L))).toDF("v", "a", "b")
      .localCheckpoint()
    val out = Inference.qqFrom(vals).collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Double]("v_a"), r.getAs[Double]("v_b"),
          r.getAs[Double]("gap")))).toMap
    (1 to 9).foreach { d =>
      // decile d of 10 evenly spread values = the d-th value
      assert(out(d.toLong) === ((d * 10.0, d * 10.0 + 100.0, 100.0)), s"d$d")
    }
    // corpus scale: both cohort curves are monotone in the decile
    val real = Inference.qqDecileCompare(spark, sf).collect()
    val (va, vb) = (real.map(_.getAs[Double]("v_a")),
      real.map(_.getAs[Double]("v_b")))
    assert(va.zip(va.tail).forall { case (x, y) => x <= y })
    assert(vb.zip(vb.tail).forall { case (x, y) => x <= y })
  }

  test("bootstrap medians: B resamples bracketing the point median") {
    import graft.sources.Tables
    val out = Inference.bootstrapMedians(spark, sf).collect()
    assert(out.length === Inference.BootstrapB)
    // the point-estimate median by the same lower-median convention
    val xs = Tables.orders(spark, sf)
      .select(col("o_totalprice").cast("decimal(14,4)").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    val point = xs((xs.length + 1) / 2 - 1)
    val meds = out.map(_.getAs[Double]("median_price"))
    // resample medians scatter AROUND the point estimate: it must fall
    // inside their range, and they must not all collapse to one value
    assert(meds.min <= point && point <= meds.max)
    assert(meds.distinct.length > 1)
    out.foreach(r => assert(r.getAs[Long]("n_eff") > 0L))
  }

  test("pareto coverage: naive whale-curve cross-check per nation") {
    import graft.sources.Tables
    val out = Inference.paretoCoverage(spark, sf).collect()
      .map(r => r.getAs[String]("nation") ->
        ((r.getAs[Long]("n_customers"), r.getAs[Long]("pareto_k"),
          r.getAs[Double]("pareto_share")))).toMap
    assert(out.nonEmpty)
    val rev = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(14,4)")).as("rev"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue(),
        BigDecimal(r.getAs[java.math.BigDecimal]("rev"))))
    rev.groupBy(_._1).foreach { case (nation, rs) =>
      val sorted = rs.sortBy(t => (-t._3, t._2))
      val total = sorted.map(_._3).sum
      val cums = sorted.map(_._3).scanLeft(BigDecimal(0))(_ + _).tail
      val k = cums.indexWhere(c => c * 5 >= total * 4) + 1
      val (n, pk, share) = out(nation)
      assert(n === sorted.size.toLong, nation)
      assert(pk === k.toLong, nation)
      assert(share === k.toDouble / sorted.size.toDouble, nation)
      assert(pk >= 1L && pk <= n)
    }
  }

  test("xcorr: a planted 2-day lead is recovered as the argmax lag") {
    // y is x shifted forward by 2 days (plus flat noise floor):
    // r at lag 2 must be ~1 and strictly the max across lags
    val xs = Seq(5L, 9L, 2L, 7L, 4L, 8L, 1L, 6L, 3L, 9L, 2L, 7L,
      5L, 8L, 4L, 6L)
    val xy = xs.zipWithIndex.map { case (x, i) =>
      (i.toLong, x, if (i >= 2) xs(i - 2) else 0L)
    }.toDF("di", "x", "y").localCheckpoint()
    val rs = Inference.xorrFrom(xy).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("r")).toMap
    assert(rs(2L) > 0.999)
    rs.filter(_._1 != 2L).values.foreach(v => assert(v < rs(2L)))
  }

  test("forecast backtest: a pure 7-day cycle gives mase_like = 0") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fc").toString
    // weekly pattern: day-of-week d gets (d+1) events of type 'click',
    // over exactly 4 weeks => n(d) == n(d-7) always, n(d) != n(d-1)
    val rows = for {
      day <- 0 until 28
      k <- 0 until (day % 7) + 1
    } yield ((day * 100 + k).toLong,
      java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"),
      k.toLong, "click", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Inference.forecastSeasonalNaive(spark, tmp).head
    assert(r.getAs[String]("event_type") === "click")
    assert(r.getAs[Long]("n_days") === 21L) // days 7..27
    assert(r.getAs[Long]("sae_seasonal") === 0L)
    assert(r.getAs[Double]("mase_like") === 0.0)
    assert(r.getAs[Long]("sae_naive") > 0L)
  }

  test("pacf: lag-1 equals acf r1; full curve matches a scala Durbin-Levinson") {
    val rs = Inference.acfDaily(spark, sf).collect()
      .map(r => r.getAs[Long]("lag").toInt -> r.getAs[Double]("r")).toMap
    val out = Inference.pacfDaily(spark, sf).collect()
      .map(r => r.getAs[Long]("lag").toInt -> r.getAs[Double]("pacf")).toMap
    assert(out.keySet === (1 to Inference.AcfMaxLag).toSet)
    assert(out(1) === rs(1))
    // reference recursion with the SAME operation order as the operator
    val phi = Array.ofDim[Double](Inference.AcfMaxLag + 1,
      Inference.AcfMaxLag + 1)
    phi(1)(1) = rs(1)
    for (k <- 2 to Inference.AcfMaxLag) {
      var num = rs(k); var den = 1.0
      for (j <- 1 until k) {
        num -= phi(k - 1)(j) * rs(k - j)
        den -= phi(k - 1)(j) * rs(j)
      }
      phi(k)(k) = num / den
      for (j <- 1 until k)
        phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j)
    }
    (1 to Inference.AcfMaxLag).foreach { k =>
      assert(math.abs(out(k) - phi(k)(k)) < 1e-12, s"lag $k")
      assert(math.abs(out(k)) <= 1.0 + 1e-9)
    }
  }

  test("seasonality strength: pure weekly cycle saturates at 1, period-2 noise doesn't") {
    def ser(ns: Seq[Long]) =
      ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("di", "n")
        .localCheckpoint()
    // exact period-7 pattern: detrended values are constant per phase
    // => SSW = 0 => strength = SSB/(SSB+0) = 1.0 exactly
    val weekly = Seq(1L, 5L, 9L, 2L, 7L, 4L, 8L)
    val r7 = Inference.seasonalityStrengthFrom(
      ser(Seq.fill(5)(weekly).flatten)).head
    assert(r7.getAs[Double]("strength") === 1.0)
    assert(r7.getAs[Long]("k") === 7L)
    // alternating period-2 series: every mod-7 phase mixes the two
    // detrended values, so day-of-week explains almost nothing
    val alt = (0 until 35).map(i => if (i % 2 == 0) 10L else 0L)
    val r2 = Inference.seasonalityStrengthFrom(ser(alt)).head
    assert(r2.getAs[Double]("strength") < 0.2)
  }

  test("cramers V: strong association on a full table, independence gives 0") {
    // [[9,1],[1,9]] (all cells observed — chi2's cell frame only holds
    // observed cells): exp=5 everywhere, chi2 = 4*16/5 = 12.8,
    // V = sqrt(12.8/20) = 0.8
    val strong = Inference.cramersVFrom(
      (Seq.fill(9)(("a", "x")) ++ Seq.fill(1)(("a", "y")) ++
        Seq.fill(1)(("b", "x")) ++ Seq.fill(9)(("b", "y")))
        .toDF("prio", "status")).head
    assert(strong.getAs[Double]("chi2") === 12.8)
    assert(math.abs(strong.getAs[Double]("cramers_v") - 0.8) < 1e-15)
    assert(strong.getAs[Long]("dof") === 1L)
    val indep = Inference.cramersVFrom(
      (for { a <- Seq("a", "b"); b <- Seq("x", "y") } yield (a, b))
        .toDF("prio", "status")).head
    assert(indep.getAs[Double]("cramers_v") === 0.0)
  }

  test("ljung-box term survives the old num² saturation bound (10^7 events/day, 10y spine)") {
    // moments of a 3650-day spine at x̄ = 10^7 events/day with rho ~ 0.5
    // — one decade PAST the round-9 bound where (num²·S) overflowed
    // DECIMAL(38,0): num ~ 6.7e18, num²·1e9 ~ 4.4e46. The staged
    // two-floor form must return the exact BigInt value, not NULL/throw.
    val t = BigInt(3650); val cnt = t - 1
    val mean = BigInt(10).pow(7)
    val v = BigInt(10).pow(12) // per-day variance (sigma = 10^6)
    val sx = cnt * mean
    val sxx = cnt * (mean * mean + v)
    val sxy = cnt * (mean * mean + v / 2)
    def dec(b: BigInt) = s"CAST('$b' AS DECIMAL(38,0))"
    val m = spark.sql(
      s"""SELECT CAST(1 AS INT) AS lag, CAST($cnt AS BIGINT) AS cnt,
         ${dec(sx)} AS sx, ${dec(sx)} AS sy, ${dec(sxy)} AS sxy,
         ${dec(sxx)} AS sxx, ${dec(sxx)} AS syy""")
    val tot = spark.sql(s"SELECT CAST($t AS BIGINT) AS t")
    val row = Inference.lbTermFrame(m, tot).select("term").head
    assert(!row.isNullAt(0), "term saturated to NULL at the new bound")
    val term = BigInt(row.getAs[Number](0).longValue)
    // exact expected value by the same staged floors in BigInt
    val anum = (cnt * sxy - sx * sx).abs
    val aa = cnt * sxx - sx * sx
    val t1 = (anum * BigInt(Inference.LbScale)) / aa
    val expect = (t1 * anum) / (aa * (t - 1))
    assert(term === expect)
    // and it still approximates rho²·S/(T−k): rho = 0.5 ⇒ rho² = 0.25
    val approx = term.toDouble * (t.toDouble - 1) / Inference.LbScale
    assert(math.abs(approx - 0.25) < 1e-3, s"rho² drifted: $approx")
  }
}
