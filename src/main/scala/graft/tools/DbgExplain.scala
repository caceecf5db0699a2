package graft.tools
import org.apache.spark.sql.SparkSession
object DbgExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("a8_indicator_ohlc")(spark, "/root/testdata/sf0.001")
    df.queryExecution.toRdd.count()
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
