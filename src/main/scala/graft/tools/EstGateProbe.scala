package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Measures the signature-agreement est-gate (dedup_minhash_pairs_est,
  * VERDICT r8 #4): exact shingle-set Jaccard verification of LSH
  * candidate pairs WITH vs WITHOUT the in-join agreement gate, on the
  * same materialized shingle/signature frames. The delta isolates what
  * the gate saves: candidate pairs that never fetch their shingle
  * arrays or pay the exact set intersection.
  *
  * The gate's value depends on candidate PRECISION: on a corpus whose
  * candidates are mostly true near-dups (ScaleProbe suffix-copies) the
  * gate only adds the agreement pass, while under recall-first banding
  * (few rows per band — high collision rate, the regime wide-recall
  * dedup runs in) false candidates dominate and the gate collapses
  * them before any shingle array moves. Optional args override the
  * band geometry to probe both regimes.
  *
  * Run: `sbt "runMain graft.tools.EstGateProbe <sfDir> [bands] [rowsPerBand]"`. */
object EstGateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nBands = args.lift(1).flatMap(_.toIntOption).getOrElse(8)
    val rowsPer = args.lift(2).flatMap(_.toIntOption).getOrElse(2)
    require(nBands * rowsPer <= 16, "band geometry exceeds the 16-perm signature")
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

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), TextFns.shingleHashesFromText("text", 3).as("sh"))
      .localCheckpoint()
    val withSig = docs
      .select(col("doc_id"), TextFns.minhashSignature("sh", 16).as("sig"))
    val bandExprs = (0 until nBands).map { b =>
      md5(concat_ws("|",
        (0 until rowsPer).map(r => col("sig").getItem(b * rowsPer + r).cast("string")): _*))
    }
    val bands = withSig
      .select(col("doc_id"), col("sig"), explode(array(bandExprs: _*)).as("bucket"))
      .localCheckpoint()
    val a = bands.select(col("doc_id").as("id_a"), col("sig").as("sig_a"), col("bucket"))
    val b = bands.select(col("doc_id").as("id_b"), col("sig").as("sig_b"), col("bucket"))
    val agree = expr("graft_sig_agree(sig_a, sig_b)")

    val sa = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val sb = docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    def exactVerify(pairs: org.apache.spark.sql.DataFrame): Long =
      pairs.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
        .withColumn("i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
        .withColumn("ssum", (size(col("sh_a")) + size(col("sh_b"))).cast("long"))
        .where(col("i") >= 1 && col("i") * 3 >= col("ssum"))
        .count()

    val candidates = a.join(b, Seq("bucket")).where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").count().count()
    val (nUngated, tUngated) = timed {
      exactVerify(a.join(b, Seq("bucket")).where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct())
    }
    val (nGated, tGated) = timed {
      exactVerify(a.join(b, Seq("bucket")).where(col("id_a") < col("id_b"))
        .withColumn("agree", agree).where(col("agree") >= 4)
        .select("id_a", "id_b").distinct())
    }
    val survivors = a.join(b, Seq("bucket")).where(col("id_a") < col("id_b"))
      .withColumn("agree", agree).where(col("agree") >= 4)
      .groupBy("id_a", "id_b").count().count()
    println(f"[est-gate] dir=$dir candidates=$candidates survivors=$survivors " +
      f"(${100.0 * survivors / math.max(candidates, 1)}%.1f%%) " +
      f"qualifying: ungated=$nUngated gated=$nGated (must match) " +
      f"wall: ungated=$tUngated%.1f s gated=$tGated%.1f s cut=${tUngated / tGated}%.1fx")
    spark.stop()
  }
}
