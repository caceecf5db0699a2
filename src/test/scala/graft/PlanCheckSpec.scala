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
