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
  * With a second arg `cc`, additionally runs the FULL
  * `dedup_cc_canonical` pipeline (band buckets → distinct pairs →
  * connected components → canonical survivors) under each geometry and
  * prints wall time + cluster count — the end-to-end proof that
  * re-sizing the geometry recovers the query the sf10 probe flagged.
  *
  * Run: `sbt "runMain graft.tools.LshGeomProbe <sfDir> [cc]"`. */
object LshGeomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runCc = args.lift(1).contains("cc")
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

      if (runCc) {
        val t0 = System.nanoTime()
        val bkts = withSig
          .select(col("doc_id"), explode(array(bandExprs: _*)).as("bucket"))
        val a = bkts.select(col("doc_id").as("src"), col("bucket"))
        val b = bkts.select(col("doc_id").as("dst"), col("bucket"))
        val pairs = a.join(b, Seq("bucket")).where(col("src") < col("dst"))
          .select("src", "dst").distinct()
        val cc = graft.operators.GraphOps.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs)
        val clusters = cc.select(countDistinct(col("component_id"))).collect().head.getLong(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[geom-cc] bands=$bands rows=$rows ccSeconds=$secs%.1f clusters=$clusters")
      }
    }
    spark.stop()
  }
}
