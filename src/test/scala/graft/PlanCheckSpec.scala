package graft

import org.apache.spark.sql.functions._

import graft.tools.PlanCheck

/** Mechanizes the window-partitioning guarantee: every query in
  * SparkEntry must either key its window operators or sit on the
  * documented whitelist (API-bounded result sets / single-series
  * operator forms). Window `partitionSpec` is static under AQE, so the
  * audit plans without executing and covers the FULL query set cheaply. */
class PlanCheckSpec extends SparkSpec {
  import spark.implicits._

  test("no query outside the whitelist plans a partition-unbounded window") {
    val violations = PlanCheck.auditWindows(spark, "/root/testdata/sf0.001")
    assert(violations.isEmpty,
      s"partition-unbounded windows outside the whitelist:\n" +
        violations.map { case (n, w) => s"  $n: ${w.mkString("; ")}" }.mkString("\n"))
  }

  test("whitelist entries are live (each still plans an unpartitioned window)") {
    // a stale whitelist hides regressions — every entry must still need it
    for (name <- PlanCheck.UnpartitionedWindowWhitelist) {
      val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      assert(PlanCheck.unpartitionedWindows(plan).nonEmpty,
        s"$name no longer has an unpartitioned window — drop it from the whitelist")
    }
  }

  test("j9_star_join_bucketed: fact-fact SMJ reads both sides pre-bucketed, no Exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the assertion targets the Exchange the
      // bucketing removes, not a small-sf broadcast plan (at lake scale
      // neither fact side broadcasts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("j9_star_join_bucketed")(spark, "/root/testdata/sf0.001")
      def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case other => other +: other.children.flatMap(flatten)
      }
      val all = flatten(df.queryExecution.executedPlan)
      val factJoin = all.collect {
        case j: SortMergeJoinExec
          if j.leftKeys.exists(_.toString.contains("l_orderkey")) => j
      }
      assert(factJoin.nonEmpty, "lineitem-orders SortMergeJoin not found:\n" +
        df.queryExecution.executedPlan.toString.take(1500))
      val shuffles = factJoin.flatMap(flatten).collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        "bucketed fact join still shuffles:\n" + factJoin.head.toString.take(1500))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("the detector sees through AQE wrappers and flags empty partitionSpec only") {
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)).toDF("id", "k", "v")
    val keyed = df.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("id")))
    assert(PlanCheck.unpartitionedWindows(keyed.queryExecution.executedPlan).isEmpty)
    val global = df.withColumn("s",
      sum("v").over(org.apache.spark.sql.expressions.Window.orderBy("id")))
    assert(PlanCheck.unpartitionedWindows(global.queryExecution.executedPlan).nonEmpty)
    // and post-execution (finalized AQE) gives the same answer
    global.collect()
    assert(PlanCheck.unpartitionedWindows(global.queryExecution.executedPlan).nonEmpty)
  }

  // ---- bench-ledger classification liveness (VERDICT r15 #8) ----
  //
  // The `comparable` subtotal is only round-over-round comparable while
  // its MEMBERSHIP stays the r13-era 88-query basis. The subtotal is
  // computed as timed ∖ engineRoundtrip ∖ benchAddedAfterR13, so a
  // renamed query (or one dropped from the classification sets) would
  // silently shrink or shift the basis without any arithmetic failing.
  // This test freezes the 88 names: a rename breaks it loudly, and a
  // NEW query that isn't registered in benchAddedAfterR13 lands in the
  // comparable set and breaks it too (the failure message says which
  // side drifted and what to do).

  /** The r13-era comparable basis, frozen by name. NEVER edit this list
    * to make the test pass — a mismatch means either a query was renamed
    * (rename it back or accept a ledger discontinuity consciously) or a
    * new query is missing from [[SparkEntry.benchAddedAfterR13]]. */
  private val ComparableBasisR13: Set[String] = Set(
    "a11_side_split_weighted", "a12_latency_p95_nearest", "a13_ratio_dedup",
    "a1_minute_trade_agg", "a5_htf_ohlc_bucket", "a6_percentile_p95",
    "a7_bucket_completeness", "a8_indicator_ohlc", "a9_partition_audit",
    "ann_cosine_topk", "ann_ivf_incremental", "ann_ivf_probe",
    "ann_ivf_recall", "ann_lsh_autosize", "ann_lsh_bucket",
    "ann_lsh_recall", "ann_sq8_quantize", "ann_sq8_search",
    "dedup_bucket_cap_guard", "dedup_cc_autosize", "dedup_cc_incremental",
    "dedup_cc_verified", "dedup_cc_verified_incremental",
    "dedup_cc_verified_star", "dedup_embed_lsh_sq8",
    "dedup_minhash_autosize", "dedup_minhash_bands", "dedup_minhash_pairs",
    "dedup_minhash_pairs_est", "dedup_ngram_jaccard_capped",
    "dedup_simhash", "ema_daily_revenue", "export_shard_assign",
    "htf_aggregate_1h", "ind_pivot_points", "ivf_kmeans_sample_train",
    "ivf_kmeans_train", "ivf_kmeans_train_k64", "j10_salted_skew_join",
    "j1_spine_left_join", "j2_asof_tolerance", "j3_align_close",
    "j5_align_exact", "j6_anti_customers", "j8_overlay_merge",
    "j9_star_join_bucketed", "j9_star_join_revenue", "mb_canonical_build",
    "mix_epoch_weights", "mm_audio_windows", "mm_binary_meta",
    "mm_decode_png_header", "mm_frame_sample", "native_enrich_route",
    "o2_topk_users", "p2_json_conditional_split", "p3_book_ticker_exprs",
    "p5_null_gated_derived", "p9_serialize_scrub", "qagg_aggregate_15m",
    "s14_top200_recent", "s1_pruned_scan_agg", "s2_minmax_ts",
    "s3_latest_wins_dedup", "sample_stratified_hash",
    "sample_topk_per_source", "txt_chunk_tokens", "txt_decontaminate",
    "txt_fingerprint_dedup", "txt_gopher_rules", "txt_langid",
    "txt_langid_confusion", "txt_pack_sequences", "txt_pii_redact",
    "txt_quality_score", "txt_repetition_rules", "txt_rolling_fingerprint",
    "txt_tfidf_bm25", "txt_token_count", "txt_token_count_bpe",
    "txt_vocab_topk", "u1_union_relaxed", "u2_union_dedup_merge",
    "w1_log_return_vol", "w3_bar_deltas", "w4_cvd_running",
    "w5_bounded_ffill", "w7_sessionization")

  test("every bench classification name refers to a live query (no orphans)") {
    val live = SparkEntry.queries.keySet
    for ((setName, set) <- Seq(
        "oracleOnly" -> SparkEntry.oracleOnly,
        "engineRoundtrip" -> SparkEntry.engineRoundtrip,
        "benchAddedAfterR13" -> SparkEntry.benchAddedAfterR13)) {
      val orphans = set -- live
      assert(orphans.isEmpty,
        s"$setName names queries that no longer exist (renamed?): " +
          orphans.toSeq.sorted.mkString(", "))
    }
  }

  test("the comparable bench basis is exactly the frozen r13-era 88 queries") {
    assert(ComparableBasisR13.size == 88)
    val timed = SparkEntry.queries.keySet -- SparkEntry.oracleOnly
    val comparable =
      timed -- SparkEntry.engineRoundtrip -- SparkEntry.benchAddedAfterR13
    val unregistered = comparable -- ComparableBasisR13
    val vanished = ComparableBasisR13 -- comparable
    assert(unregistered.isEmpty,
      "new/renamed queries landed in the comparable subtotal — add them to " +
        s"SparkEntry.benchAddedAfterR13: ${unregistered.toSeq.sorted.mkString(", ")}")
    assert(vanished.isEmpty,
      "queries left the comparable subtotal (renamed or re-classified) — the " +
        s"pinned basis is broken: ${vanished.toSeq.sorted.mkString(", ")}")
  }
}
