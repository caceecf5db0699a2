package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-quality audit: executes each headline query (noop sink) and
  * prints condensed facts from the FINAL adaptive plan — filter
  * pushdown, scan schema width, join strategies, partial aggregation,
  * whole-stage codegen span count, shuffle count. AQE plans report
  * `isFinalPlan=false` (and no codegen markers) before execution, so
  * the audit runs the query first.
  * Run: `sbt "runMain graft.tools.PlanCheck [sfDir]"`. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = Seq(
      "s1_pruned_scan_agg", "j9_star_join_revenue", "a1_minute_trade_agg",
      "htf_aggregate_1h", "qagg_aggregate_15m", "j1_spine_left_join",
      "j2_asof_tolerance", "ann_cosine_topk", "dedup_ngram_jaccard",
      "dedup_minhash_pairs", "dedup_embed_cosine", "a8_indicator_ohlc",
      "s14_top200_recent", "w5_bounded_ffill",
      "native_enrich_route", "ivf_kmeans_train", "dedup_embed_lsh",
      "dedup_ngram_jaccard_capped",
      "txt_tfidf_bm25", "txt_decontaminate", "txt_repetition_rules",
      "txt_pack_sequences", "ann_sq8_search", "ann_lsh_recall")

    for (name <- interesting) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // Execute the dataset's OWN QueryExecution so its AdaptiveSparkPlan
      // finalizes (a write would clone the plan into a new execution and
      // leave this one at isFinalPlan=false).
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      def count(s: String) = s.r.findAllMatchIn(plan).size
      def has(s: String) = if (plan.contains(s)) "Y" else "-"
      // whole-stage codegen prints as "*(id) Operator" in tree strings
      val codegenIds = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1).toInt).toSet.size
      val pushed = "PushedFilters: \\[[^\\]]*[A-Za-z][^\\]]*\\]".r
        .findFirstIn(formatted).map(_.take(90)).getOrElse("none")
      println(s"== $name")
      println(s"   bhj=${has("BroadcastHashJoin")} smj=${has("SortMergeJoin")} " +
        s"bnlj=${has("BroadcastNestedLoopJoin")} cartesian=${has("CartesianProduct")} " +
        s"partialAgg=${has("partial_")} topK=${has("TakeOrderedAndProject")}")
      println(s"   codegenSpans=$codegenIds " +
        s"shuffles=${count("Exchange hashpartitioning") + count("Exchange rangepartitioning") +
          count("Exchange SinglePartition")} " +
        s"rowToColumnar=${count("ColumnarToRow")}")
      println(s"   $pushed")
    }
    spark.stop()
  }
}
