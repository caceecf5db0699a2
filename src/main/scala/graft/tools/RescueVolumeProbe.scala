package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{DedupOps, GraphOps}

/** Verify-volume accounting for the three candidate policies on a REAL
  * (cluster-shaped) corpus — the other half of the star+rescue
  * measurement (StarRecallProbe covers the chain-shaped half, where
  * buckets are small and star ≈ all-pairs in volume by construction;
  * the savings case is cluster structure, where star was measured 3.9×
  * cheaper at sf10 and rescue must not give that back).
  *
  * Prints est-gated distinct pair counts (the exact-verify volume) for
  * all-pairs / star / star+rescue, plus whether the three closures
  * assign identical components.
  *
  * Run: `sbt "runMain graft.tools.RescueVolumeProbe [sfDir]"`
  * (default /root/testdata/sf0.1).
  */
object RescueVolumeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.NativeVectorExprs.register(spark)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), TextFns.shingleHashesFromText("text", 3).as("sh"))
      .localCheckpoint()
    val n = docs.count()
    val (nBands, rowsPer) = TextFns.minhashGeometryFor(16, n, targetBucketSize = 128)
    val withSig = docs.select(col("doc_id"), TextFns.minhashSignature("sh", 16).as("sig"))
    val bandExprs = (0 until nBands).map { b =>
      md5(concat_ws("|",
        (0 until rowsPer).map(r => col("sig").getItem(b * rowsPer + r).cast("string")): _*))
    }
    val bands = withSig
      .select(col("doc_id"), col("sig"), explode(array(bandExprs: _*)).as("bucket"))
      .localCheckpoint()
    val sh = docs.select(col("doc_id"), col("sh"))
    val ids = docs.select(col("doc_id").as("id"))

    def vol(cand: DataFrame): Long = cand
      .where(expr("graft_sig_agree(sig_a, sig_b)") >= 4)
      .select("id_a", "id_b").distinct().count()

    val (allVol, allVolSecs) = timed(vol(DedupOps.allPairCandidates(bands)))
    val (starVol, starVolSecs) = timed(vol(DedupOps.starCandidates(bands)))
    val starEdges = DedupOps.verifiedEdges(DedupOps.starCandidates(bands), sh)
      .localCheckpoint()
    // the combined volume dedups star∩rescue overlap (a rescue pair can
    // be another bucket's star pair) — star∪rescue ⊆ all-pairs always
    val (rescueVol, rescueVolSecs) = timed(vol(
      DedupOps.starCandidates(bands).unionByName(
        DedupOps.starRescueCandidates(bands, starEdges))))

    def close(edges: DataFrame): DataFrame =
      GraphOps.connectedComponents(ids, edges).localCheckpoint()
    val allCc = close(DedupOps.verifiedEdges(DedupOps.allPairCandidates(bands), sh))
    val rescueCc = close(starEdges.unionByName(
      DedupOps.verifiedEdges(DedupOps.starRescueCandidates(bands, starEdges), sh))
      .distinct())
    val starCc = close(starEdges)
    def diff(a: DataFrame, b: DataFrame): Long =
      a.select(col("id"), col("component_id").as("ca"))
        .join(b.select(col("id"), col("component_id").as("cb")), Seq("id"))
        .where(col("ca") =!= col("cb")).count()

    println(f"[rescue-volume] corpus=$n docs geometry=${nBands}x$rowsPer " +
      f"volumes: allPairs=$allVol ($allVolSecs%.1f s) star=$starVol " +
      f"($starVolSecs%.1f s, ${100.0 * starVol / math.max(allVol, 1L)}%.1f%%) " +
      f"star+rescue=$rescueVol ($rescueVolSecs%.1f s, " +
      f"${100.0 * rescueVol / math.max(allVol, 1L)}%.1f%%)")
    println(s"[rescue-volume] closure diffs vs all-pairs: " +
      s"star=${diff(starCc, allCc)} docs, star+rescue=${diff(rescueCc, allCc)} docs")
    spark.stop()
  }
}
