package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-quality audit: prints condensed physical-plan facts for the
  * headline queries — filter pushdown, scan schema pruning, join
  * strategies, partial aggregation, whole-stage codegen span count.
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

    val interesting = Seq("s1_pruned_scan_agg", "j9_star_join_revenue",
      "a1_minute_trade_agg", "htf_aggregate_1h", "j1_spine_left_join",
      "ann_cosine_topk", "s14_top200_recent")

    for (name <- interesting) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      def has(s: String) = if (plan.contains(s)) "Y" else "-"
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findFirstIn(plan)
        .map(_.take(90)).getOrElse("none")
      val codegenSpans = "codegen id : ([0-9]+)".r.findAllMatchIn(plan).map(_.group(1).toInt).toSet.size
      println(s"== $name")
      println(s"   broadcastJoin=${has("BroadcastHashJoin")} " +
        s"sortMergeJoin=${has("SortMergeJoin")} " +
        s"partialAgg=${has("partial_")} topK=${has("TakeOrderedAndProject")} " +
        s"codegenSpans=$codegenSpans")
      println(s"   $pushed")
    }
    spark.stop()
  }
}
