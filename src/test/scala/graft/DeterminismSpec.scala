package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-independence: the engine's central numeric claim is
  * that every result is BIT-identical under any physical execution —
  * that is what makes results reproducible across cluster re-runs,
  * executor counts, and AQE decisions at 100 TB. Running each query
  * under different shuffle partition counts changes partial-aggregation
  * grouping and merge order; exact decimal/integer accumulation means
  * the collected rows must not move by an ulp. (Row.toString prints
  * doubles via Double.toString, whose shortest-roundtrip form is
  * injective on bits for non-NaN values — string equality here IS bit
  * equality.)
  */
class DeterminismSpec extends AnyFunSuite {
  import SharedSpark._

  // double-producing queries whose accumulation order a shuffle width
  // change would perturb if anything ran in floating point
  private val names = Seq(
    "corr_exact", "anomaly_zscore", "tfidf_top_terms",
    "quality_repetition", "token_budget_mix", "dedup_minhash_lsh",
    "q1_agg", "window_rank_suite",
    // round-4 continuation: double-producing additions — the EWMA's
    // dyadic sums, the association sqrt/lift, the share division, the
    // two-level decimal window, and the conditional promo sum
    "ewma_smooth", "skill_association", "revenue_share",
    "q14_promo_share", "negative_samples_keyed",
    // round 5: the decorrelated-subquery double division and the
    // banded-LSH cosine chain (via its recall gate, which always emits
    // a row — the registered pair query is legitimately sparse at
    // sf0.001)
    "q17_small_quantity_revenue", "dedup_embedding_recall",
    // round-5 continuation: the dormant-balance scalar average + decimal
    // sum, the sqrt-temperature mix ratios, and the fused signal ratios
    "q22_dormant_balance", "source_mix_temperature", "doc_signals_fused",
    // round-5 continuation: the TPC-H completion's double producers —
    // the market-share conditional sum + division, the profit
    // decimal-difference sum, and the mean-share threshold view
    "q8_market_share", "q9_profit_by_nation", "q11_important_value",
    // the semantic-dedup verdict frame's cent_sim doubles + keep flags
    "dedup_semantic",
    // the TV divergence's exact-decimal gap sum surfaced as one division
    "source_divergence_tv",
    // round-5 batch: the encoded id sequence must be carried by
    // (pos,id) sort inside the agg, never by partition order, and the
    // modularity numerators ride LPA's windowed sweeps
    "vocab_encode_docs", "graph_modularity",
    // round-5 inference tier: every key sums fixed-point integers or
    // exact decimals and divides once at the end — a shuffle-width
    // change must not move a bit; dsir additionally floors per-bucket
    // logs BEFORE the per-doc sum (the one transcendental, quantized)
    "chi2_independence", "hhi_concentration", "diversity_simpson",
    "markov_stationary", "link_prediction_ra", "survival_hazard",
    "dsir_weights",
    // hypothesis tests: exact-integer rank statistics and identical
    // scalar double expression trees; the two-phase prefix sums must
    // not depend on bucket/partition layout
    "ks_test", "mann_whitney_u", "ab_test_welch", "benford_digits",
    // interval/seasonality/inequality: exact ratios + one-sqrt scalar
    // trees; gini additionally rides a partitioned rank window
    "conversion_wilson_ci", "seasonality_dow", "acf_daily",
    "gini_revenue",
    // exact-integer k-means assignment + one division: cluster ids and
    // weights must survive any partitioning
    "cluster_balance_weights",
    // sequence/peeling/changepoint: exact counts with single divisions;
    // cusum's argmax must ride the integer D_t, never a float
    "event_trigrams", "kcore_membership", "cusum_changepoint",
    "lexical_diversity",
    // doubled average ranks + decimal moments: the rank tables must be
    // identical under any bucket/partition layout
    "spearman_rho",
    // hash-derandomized resampling: weights and decimal sums must not
    // depend on partition layout
    "bootstrap_means",
    // per-lang ratios and the hash-chosen mask plan
    "tokenizer_fertility", "span_corruption_plan",
    // 2x2 cross-products with one division each
    "odds_ratio_funnel")

  names.foreach { n =>
    test(s"$n is bit-identical under different shuffle partitioning") {
      val q = Registry.byName(n)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val a = q.fn(spark, sf).collect().map(_.toString).toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val b = q.fn(spark, sf).collect().map(_.toString).toSeq
        assert(a.nonEmpty)
        assert(a === b)
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
