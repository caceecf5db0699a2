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
  * FOOTPRINT of the increment (touched vs total buckets).
  *
  * Two corpus modes:
  *
  *  - `replicated` (legacy): new = every 4th existing doc. On ×N
  *    replicated ScaleProbe data every duplicate group receives new
  *    members, so the touch set approaches 100% and phase 2 costs ≈ a
  *    full closure — an artifact to report, not hide.
  *  - `realistic` (default): the actual daily-ingestion shape. The
  *    increment is SMALL (`newFrac`, default 2% of the corpus) and
  *    MOSTLY NOVEL (90% of new docs get globally-unique synthetic
  *    token streams that share no shingle with anything; 10% are
  *    verbatim copies of existing docs, joining existing duplicate
  *    groups). Here the touch set obeys the ≤ |new|·bands bound
  *    against a bucket population that grows with the corpus, so
  *    phase 2 ≪ full batch — the footprint lever the annex needs a
  *    measured number for.
  *
  * Run: `sbt "runMain graft.tools.IncrementalCcProbe <sfDir>
  * [realistic|replicated|verified] [newFrac] [nobatch]"` — `nobatch`
  * skips the full-batch comparison closure: at decade-4 corpora (50M
  * docs) the full closure is exactly the thing the incremental operator
  * exists to avoid paying, so the probe reports phase 2 against the
  * footprint bound (touched buckets vs |new|·bands) instead of against
  * a batch wall nobody would run.
  *
  * `verified` mode (VERDICT r12 #6) = the realistic corpus with
  * `dedup_cc_verified_incremental`'s phase 2: incident candidates →
  * est-gate (sig agreement ≥ 4) → exact shingle-Jaccard verify →
  * incremental re-close, reporting the VERIFY VOLUME (raw candidate
  * rows, gated pairs, verified edges) against the |new|·bands bound.
  * Disk-lean at decade 4: only (doc_id, sig) ~136 B/doc and the slim
  * (doc_id, bucket, is_new) band index are checkpointed; shingles are
  * recomputed from parquet text ONLY for docs appearing in gated pairs
  * (a semi-join-restricted second text pass). The est-gate runs after
  * the candidate join + sig re-join rather than inside the band join
  * (production's codegen-before-shuffle placement, measured at 5M in
  * DailyIngestDemo, would need sig carried on every band row — ~70 GB
  * of checkpoint at 50M×bands that this box cannot hold); placement
  * moves constants, not the gated/verified counts reported. */
object IncrementalCcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mode = args.lift(1).getOrElse("realistic")
    val newFrac = args.lift(2).flatMap(_.toDoubleOption).getOrElse(0.02)
    val noBatch = args.lift(3).contains("nobatch")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.NativeVectorExprs.register(spark)

    val existing = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val nExisting = existing.count()

    val verifiedMode = mode == "verified"
    // Corpus = existing ∪ new, per mode. `is_new` marks the increment.
    val corpus: DataFrame = mode match {
      case "replicated" =>
        existing.withColumn("is_new", col("doc_id") % 4 === 0)
      case _ =>
        // deterministic pseudo-random pick via md5 of the id — no RNG,
        // stable across runs. 90% of picks become NOVEL docs (50
        // unique tokens each — shingles collide with nothing), 10%
        // stay verbatim duplicates of their source doc (they join its
        // existing duplicate group). New ids live above the existing
        // id space.
        val pick = conv(substring(md5(concat(lit("inc"), col("doc_id"))), 1, 6), 16, 10)
          .cast("long")
        // new ids must live ABOVE the existing id space — a fixed
        // +1e9 offset collided with ~99% of real ids on the derived
        // corpora (dense above 1e9), silently conflating new docs with
        // unrelated existing ones (r13 find; affected r12 probe runs)
        val idOffset = existing.agg(max("doc_id")).head.getLong(0) + 1L
        val newDocs = existing
          .withColumn("r", pick % 10000L)
          .where(col("r") < lit((newFrac * 10000).toLong))
          .withColumn("novel", col("r") % 10 < 9)
          .select(
            (col("doc_id") + lit(idOffset)).as("doc_id"),
            when(col("novel"), concat_ws(" ",
              (1 to 50).map(i => md5(concat(col("doc_id"), lit(s"-tok$i")))): _*))
              .otherwise(col("text")).as("text"),
            lit(true).as("is_new"))
        existing.withColumn("is_new", lit(false)).unionByName(newDocs)
    }
    // Checkpoint only the SLIM (doc_id, is_new) frame for the many
    // membership reuses below. The full text corpus must NOT be
    // checkpointed: at the decade-4 corpus (50M docs) the materialized
    // text is ~40 GB of executor storage and blew the box's disk with
    // spill; the text is consumed exactly once — streamed from parquet
    // straight into the (checkpointed, slim) band index, the same
    // single-pass shape a 100 TB ingest would use.
    val ids = corpus.select(col("doc_id"), col("is_new")).localCheckpoint()
    val n = ids.count()
    val nNew = ids.where(col("is_new")).count()

    // geometry from the FULL corpus count, as production would size it
    val (bands, rows) = TextFns.minhashGeometryFor(16, n, targetBucketSize = 128)
    val withSig = corpus
      .withColumn("sig", TextFns.minhashSignatureFromText("text", 3, 16))
    // verified mode checkpoints (doc_id, sig, is_new) — ~136 B/doc —
    // because the est-gate re-joins signatures per candidate side; the
    // slim band index is then DERIVED from it (no second text pass)
    val sigDf =
      if (verifiedMode)
        withSig.select(col("doc_id"), col("sig"), col("is_new")).localCheckpoint()
      else withSig
    val bandExprs = (0 until bands).map { b =>
      md5(concat_ws("|",
        (0 until rows).map(r => col("sig").getItem(b * rows + r).cast("string")): _*))
    }
    val bandsDf = sigDf
      .select(col("doc_id"), explode(array(bandExprs: _*)).as("bucket"), col("is_new"))
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
      .localCheckpoint()
    val touchedCount = touched.count()

    val (assign, p1) = timed {
      GraphOps.connectedComponents(
        ids.where(!col("is_new")).select(col("doc_id").as("id")),
        starEdges(bandsDf.where(!col("is_new"))))
        .localCheckpoint()
    }
    if (verifiedMode) {
      // ---- verified phase 2 (dedup_cc_verified_incremental's tick):
      // incident candidates → est-gate → exact verify → re-close
      val rawCand = bandsDf.where(col("is_new"))
        .select(col("doc_id").as("id_a"), col("bucket"))
        .join(bandsDf.select(col("doc_id").as("id_b"), col("bucket")), Seq("bucket"))
        .where(col("id_a") =!= col("id_b"))
      val rawCandCount = rawCand.count()
      val ((nGated, nVerified, nComps), p2v) = timed {
        val sa = sigDf.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
        val sb = sigDf.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
        val gated = rawCand
          .select(least(col("id_a"), col("id_b")).as("id_a"),
                  greatest(col("id_a"), col("id_b")).as("id_b"))
          .join(sa, Seq("id_a")).join(sb, Seq("id_b"))
          .where(expr("graft_sig_agree(sig_a, sig_b)") >= 4)
          .select("id_a", "id_b").distinct()
          .localCheckpoint() // slim pair frame
        val candIds = gated.select(col("id_a").as("doc_id"))
          .unionByName(gated.select(col("id_b").as("doc_id"))).distinct()
        // restricted second text pass: shingles ONLY for gated-pair docs
        val sh = corpus.join(candIds, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), TextFns.shingleHashesFromText("text", 3).as("sh"))
          .localCheckpoint()
        val verified = gated
          .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
          .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
          .withColumn("i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
          .withColumn("ssum", (size(col("sh_a")) + size(col("sh_b"))).cast("long"))
          .where(col("i") >= 1 && col("i") * 3 >= col("ssum"))
          .select(col("id_a").as("src"), col("id_b").as("dst"))
          .localCheckpoint()
        val ng = gated.count(); val nv = verified.count()
        val nc = GraphOps.incrementalComponents(assign,
          ids.where(col("is_new")).select(col("doc_id").as("id")), verified)
          .select(countDistinct(col("component_id"))).collect()(0).getLong(0)
        (ng, nv, nc)
      }
      println(f"[inc-cc] mode=verified n=$n (existing=$nExisting new=$nNew) " +
        f"bands=$bands rows=$rows " +
        f"touchedBuckets=$touchedCount/$totalBuckets " +
        f"(${100.0 * touchedCount / totalBuckets}%.1f%% vs bound |new|*bands=${nNew * bands}) " +
        f"rawCandRows=$rawCandCount gatedPairs=$nGated verifiedEdges=$nVerified " +
        f"components=$nComps phase1=$p1%.1f s phase2Verified=$p2v%.1f s")
      spark.stop()
      return
    }

    def phase2Once(): Double = timed {
      // broadcast the touch set: the band-index lookup is a scan + hash
      // probe, not a corpus shuffle (production stores the index
      // bucket-partitioned; the broadcast semi-join is the local twin)
      val touchedEdges = starEdges(
        bandsDf.join(broadcast(touched), Seq("bucket")).select("doc_id", "bucket"))
      GraphOps.incrementalComponents(assign,
        ids.where(col("is_new")).select(col("doc_id").as("id")),
        touchedEdges)
        .select(countDistinct(col("component_id"))).collect()
    }._2
    val p2 = math.min(phase2Once(), phase2Once()) // JIT/GC-noise floor
    val touchedEdgeCount = starEdges(
      bandsDf.join(broadcast(touched), Seq("bucket")).select("doc_id", "bucket")).count()
    val affected = assign.join(
      broadcast(bandsDf.join(broadcast(touched), Seq("bucket"))
        .select(col("doc_id").as("id")).distinct()), Seq("id"))
      .select("component_id").distinct().count()
    val batchReport =
      if (noBatch) "fullBatch=SKIPPED(nobatch)"
      else {
        val (_, pb) = timed {
          GraphOps.connectedComponents(ids.select(col("doc_id").as("id")),
            starEdges(bandsDf.select("doc_id", "bucket")))
            .select(countDistinct(col("component_id"))).collect()
        }
        f"fullBatch=$pb%.1f s speedup=${pb / p2}%.1fx"
      }
    println(f"[inc-cc] mode=$mode n=$n (existing=$nExisting new=$nNew) " +
      f"bands=$bands rows=$rows " +
      f"touchedBuckets=$touchedCount/$totalBuckets " +
      f"(${100.0 * touchedCount / totalBuckets}%.1f%% vs bound |new|*bands=${nNew * bands}) " +
      f"deltaEdges=$touchedEdgeCount affectedComps=$affected " +
      f"phase1=$p1%.1f s phase2=$p2%.1f s " + batchReport)
    spark.stop()
  }
}
