package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.ops.Ops

/** MinHash band-geometry probe: measures the LSH candidate-pair count
  * (the in-bucket quadratic work every downstream join pays —
  * Σ c·(c−1)/2 over bucket occupancies, computed from the histogram, no
  * pair join) for three stacks:
  *
  *   - `fixed`     — the 8×2 geometry the small-parameter oracles use;
  *   - `auto`      — the corpus-sized geometry
  *                   [[TextFns.minhashGeometryFor]] chooses;
  *   - `auto+cap`  — auto geometry THROUGH [[Ops.capBucketOccupancy]],
  *                   the full production stack: auto-sizing kills the
  *                   random-collision pair mass, the cap bounds the
  *                   skew the sizing rule can't see. The probe prints
  *                   the drop accounting (buckets and band-rows dropped)
  *                   and asserts kept + dropped == total — a capped
  *                   pipeline must never silently swallow rows.
  *
  * Run at two scale factors to see the fixed geometry go quadratic
  * while the auto geometry holds per-bucket occupancy — the
  * measurement behind the §8.11/§8.12 annex rows.
  *
  * With a second arg `cc`, additionally runs the FULL near-dup close
  * (band buckets → distinct pairs → connected components → canonical
  * survivors) under each stack and prints wall time + cluster count —
  * the end-to-end proof that re-sizing the geometry recovers the query
  * the sf10 probe flagged. A third arg overrides the cap (default
  * 1024 = 8× the 128-doc target bucket size; on ~K-way-replicated
  * probe data genuine duplicate groups occupy ~K-sized buckets, so the
  * cap must sit above K to keep real structure).
  *
  * Run: `sbt "runMain graft.tools.LshGeomProbe <sfDir> [cc] [cap]"`. */
object LshGeomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runCc = args.lift(1).contains("cc")
    val cap = args.lift(2).map(_.toLong).getOrElse(1024L)
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
    val auto = TextFns.minhashGeometryFor(16, n, 128)
    val stacks = Seq(("fixed", 8, 2, 0L), ("auto", auto._1, auto._2, 0L),
      ("auto+cap", auto._1, auto._2, cap)).distinctBy(s => (s._2, s._3, s._4))
    for ((label, bands, rows, capVal) <- stacks) {
      val withSig = docs
        .withColumn("sig", TextFns.minhashSignatureFromText("text", 3, 16))
      val bandExprs = (0 until bands).map { b =>
        md5(concat_ws("|",
          (0 until rows).map(r => col("sig").getItem(b * rows + r).cast("string")): _*))
      }
      val allBands = withSig
        .select(col("doc_id"), explode(array(bandExprs: _*)).as("bucket"))
      val capped: Option[(org.apache.spark.sql.DataFrame, Long, Long)] =
        if (capVal > 0) {
          val (kept, dropped) = Ops.capBucketOccupancy(allBands, Seq("bucket"), capVal)
          val drops = dropped.agg(
            count(lit(1)).as("buckets"),
            coalesce(sum(col("occupancy")), lit(0L)).as("rows")).collect().head
          Some((kept, drops.getLong(0), drops.getLong(1)))
        } else None
      val bkts = capped.map(_._1).getOrElse(allBands)
      val occ = bkts.groupBy("bucket").agg(count(lit(1)).as("c"))
      val stats = occ.agg(
        sum(expr("c * (c - 1) / 2")).as("pairs"),
        max(col("c")).as("maxOcc"),
        count(lit(1)).as("buckets"),
        sum(col("c")).as("bandRows")).collect().head
      val dropStr = capped.map { case (_, db, dr) =>
        // drop-accounting invariant: kept band-rows + dropped band-rows
        // must cover every (doc, band) row exactly once
        val keptRows = stats.getLong(3)
        require(keptRows + dr == n * bands,
          s"drop accounting broken: kept=$keptRows dropped=$dr total=${n * bands}")
        s" cap=$capVal droppedBuckets=$db droppedRows=$dr"
      }.getOrElse("")
      println(s"[geom] n=$n stack=$label bands=$bands rows=$rows " +
        s"candidatePairs=${stats.get(0)} maxOcc=${stats.get(1)} " +
        s"buckets=${stats.get(2)}$dropStr")

      if (runCc) {
        val t0 = System.nanoTime()
        val a = bkts.select(col("doc_id").as("src"), col("bucket"))
        val b = bkts.select(col("doc_id").as("dst"), col("bucket"))
        val pairs = a.join(b, Seq("bucket")).where(col("src") < col("dst"))
          .select("src", "dst").distinct()
        val cc = graft.operators.GraphOps.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs)
        val clusters = cc.select(countDistinct(col("component_id"))).collect().head.getLong(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[geom-cc] stack=$label bands=$bands rows=$rows " +
          f"ccSeconds=$secs%.1f clusters=$clusters")
      }
    }
    spark.stop()
  }
}
