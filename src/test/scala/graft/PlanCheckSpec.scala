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
}
