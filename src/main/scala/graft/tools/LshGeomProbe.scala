package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** MinHash band-geometry probe: measures the LSH candidate-pair count
  * (the in-bucket quadratic work every downstream join pays —
  * Σ c·(c−1)/2 over bucket occupancies, computed from the histogram, no
  * pair join) for the FIXED 8×2 geometry the small-parameter oracle
  * queries use vs the corpus-sized geometry
  * [[TextFns.minhashGeometryFor]] chooses. Run at two scale factors to
  * see the fixed geometry go quadratic while the auto geometry holds
  * per-bucket occupancy — the measurement behind the §8.11 annex row.
  *
  * Run: `sbt "runMain graft.tools.LshGeomProbe <sfDir>"`. */
object LshGeomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.NativeVectorExprs.register(spark)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val auto = TextFns.minhashGeometryFor(16, n, 128)
    for ((bands, rows) <- Seq((8, 2), auto).distinct) {
      val withSig = docs
        .withColumn("sig", TextFns.minhashSignatureFromText("text", 3, 16))
      val bandExprs = (0 until bands).map { b =>
        md5(concat_ws("|",
          (0 until rows).map(r => col("sig").getItem(b * rows + r).cast("string")): _*))
      }
      val occ = withSig
        .select(col("doc_id"), explode(array(bandExprs: _*)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("c"))
      val stats = occ.agg(
        sum(expr("c * (c - 1) / 2")).as("pairs"),
        max(col("c")).as("maxOcc"),
        count(lit(1)).as("buckets")).collect().head
      println(s"[geom] n=$n bands=$bands rows=$rows " +
        s"candidatePairs=${stats.get(0)} maxOcc=${stats.get(1)} buckets=${stats.get(2)}")
    }
    spark.stop()
  }
}
