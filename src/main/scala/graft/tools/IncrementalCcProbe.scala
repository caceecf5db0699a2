package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.GraphOps

/** Incremental-dedup probe: measures the `dedup_cc_incremental` shape's
  * two phases separately — phase 1 (the "yesterday" closure over
  * existing docs, which production loads rather than recomputes) and
  * phase 2 (the actual per-increment work: existing-assignment star
  * edges + closure of buckets touched by new docs) — plus the bucket
  * FOOTPRINT of the increment (touched vs total buckets). On ×N
  * replicated ScaleProbe data every duplicate group receives new
  * members, so the touch set approaches 100% and phase 2 costs ≈ a
  * full closure — an artifact to report, not hide: on a real corpus
  * the increment touches ≤ |new|·bands buckets of a much larger bucket
  * population and phase 2 is bounded by the increment's footprint.
  *
  * Run: `sbt "runMain graft.tools.IncrementalCcProbe <sfDir>"`. */
object IncrementalCcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.NativeVectorExprs.register(spark)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val (bands, rows) = TextFns.minhashGeometryFor(16, n, targetBucketSize = 128)
    val withSig = docs
      .withColumn("sig", TextFns.minhashSignatureFromText("text", 3, 16))
    val bandExprs = (0 until bands).map { b =>
      md5(concat_ws("|",
        (0 until rows).map(r => col("sig").getItem(b * rows + r).cast("string")): _*))
    }
    val bandsDf = withSig
      .select(col("doc_id"), explode(array(bandExprs: _*)).as("bucket"),
        (col("doc_id") % 4 === 0).as("is_new"))
      .localCheckpoint() // bands computed once; we time the closures

    def starEdges(bk: DataFrame): DataFrame = {
      val bmin = bk.groupBy("bucket").agg(min(col("doc_id")).as("src"))
      bk.join(bmin, Seq("bucket"))
        .where(col("src") < col("doc_id"))
        .select(col("src"), col("doc_id").as("dst")).distinct()
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val totalBuckets = bandsDf.select("bucket").distinct().count()
    val touched = bandsDf.where(col("is_new")).select("bucket").distinct()
    val touchedCount = touched.count()

    val (assign, p1) = timed {
      GraphOps.connectedComponents(
        docs.where(col("doc_id") % 4 =!= 0).select(col("doc_id").as("id")),
        starEdges(bandsDf.where(!col("is_new"))))
        .localCheckpoint()
    }
    val (_, p2) = timed {
      val assignEdges = assign.where(col("component_id") =!= col("id"))
        .select(col("component_id").as("src"), col("id").as("dst"))
      val touchedEdges = starEdges(
        bandsDf.join(touched, Seq("bucket")).select("doc_id", "bucket"))
      GraphOps.connectedComponents(docs.select(col("doc_id").as("id")),
        assignEdges.unionByName(touchedEdges))
        .select(countDistinct(col("component_id"))).collect()
    }
    val (_, pb) = timed {
      GraphOps.connectedComponents(docs.select(col("doc_id").as("id")),
        starEdges(bandsDf.select("doc_id", "bucket")))
        .select(countDistinct(col("component_id"))).collect()
    }
    println(f"[inc-cc] n=$n bands=$bands rows=$rows " +
      f"touchedBuckets=$touchedCount/$totalBuckets " +
      f"(${100.0 * touchedCount / totalBuckets}%.1f%%) " +
      f"phase1=$p1%.1f s phase2=$p2%.1f s fullBatch=$pb%.1f s")
    spark.stop()
  }
}
