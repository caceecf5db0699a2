package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{DedupOps, GraphOps}

/** Star-vs-all-pairs recall on a corpus BUILT to separate them
  * (VERDICT r12 #2). Both real test corpora (sf0.01, sf10) show ZERO
  * recall difference between `DedupOps.starCandidates` and
  * `allPairCandidates`, so star's one theoretical loss mode — a true
  * pair whose every shared bucket has a non-duplicate min — had only a
  * constructed-spec witness. This probe scales that construction to
  * corpus size:
  *
  * CHAIN corpus: chains of `chainLen` docs over a sliding token window
  * (60 tokens, step 18 → adjacent Jaccard ≈ 0.53 passes the J ≥ 0.5
  * verify, skip-one ≈ 0.23 fails), with doc_ids PERMUTED so the
  * bucket-min lands on a random chain position — maximizing the chance
  * that a bucket's min is a chain member that is NOT a true dup of the
  * other members (the star loss mode, occurring naturally instead of
  * by construction).
  *
  * Ground truth is known by construction (every adjacent chain pair is
  * a true dup, nothing else is), so the probe reports RECALL against
  * truth for both policies, plus the partition diff between them and
  * both walls.
  *
  * Run: `sbt "runMain graft.tools.StarRecallProbe [nDocs] [chainLen]"`
  * (defaults 500000, 8).
  */
object StarRecallProbe {

  // 60-token windows advancing 12 tokens per chain position: adjacent
  // Jaccard ≈ 0.66 (passes the J ≥ 0.5 verify), skip-one ≈ 0.41 (fails
  // verify but still LSH-collides in ~11% of buckets — exactly the
  // non-dup-min-in-the-bucket stress the star policy needs)
  private val TokensPerDoc = 60
  private val Step = 12

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.flatMap(_.toIntOption).getOrElse(500000)
    val chainLen = args.lift(1).flatMap(_.toIntOption).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.NativeVectorExprs.register(spark)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---- corpus: doc i sits at position (i % chainLen) of chain
    // (i / chainLen); its text is tokens [p*Step, p*Step + TokensPerDoc)
    // of the chain's token stream. doc_id = permuted i (multiplier
    // coprime to nDocs) so min-id ≠ chain head systematically.
    val mult = Seq(48271L, 1000003L, 7919L)
      .find(m => BigInt(m).gcd(BigInt(nDocs)) == 1)
      .getOrElse(sys.error(s"no coprime multiplier for $nDocs"))
    val tokenExprs = (0 until TokensPerDoc).map { k =>
      // token t of chain c is md5(c#t), shared verbatim across the
      // chain's docs whose windows cover t
      md5(concat(col("chain").cast("string"), lit("#"),
        (col("pos") * Step + k).cast("string")))
    }
    val corpus = spark.range(nDocs.toLong)
      .select(((col("id") * mult) % nDocs).as("doc_id"),
        // integer div — Spark's `/` is double division and would give
        // every doc a unique "chain"
        expr(s"id div $chainLen").as("chain"),
        (col("id") % chainLen).as("pos"))
      .withColumn("text", concat_ws(" ", tokenExprs: _*))
    val dir = s"/tmp/star_recall_${nDocs}_$chainLen"
    corpus.write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
      .select(col("doc_id"), col("chain"), col("pos"),
        TextFns.shingleHashesFromText("text", 3).as("sh"))
      .localCheckpoint() // slim id/shingle frame only (disk budget)

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

    println(s"[star-recall] corpus=$n docs chains=${n / chainLen} " +
      s"geometry=${nBands}x$rowsPer dir=$dir")

    def close(cand: DataFrame): DataFrame =
      GraphOps.connectedComponents(ids, DedupOps.verifiedEdges(cand, sh))
        .localCheckpoint()

    /** Pairs that reach the EXACT verify stage (post est-gate, distinct)
      * — the comparable cost meter across policies. */
    def verifyVolume(cand: DataFrame): Long = cand
      .where(expr("graft_sig_agree(sig_a, sig_b)") >= 4)
      .select("id_a", "id_b").distinct().count()

    val (allCc, allSecs) = timed(close(DedupOps.allPairCandidates(bands)))
    val (starCc, starSecs) = timed(close(DedupOps.starCandidates(bands)))
    val ((rescueCc, rescueVol), rescueSecs) = timed {
      val starEdges = DedupOps.verifiedEdges(DedupOps.starCandidates(bands), sh)
        .localCheckpoint()
      val rescueCand = DedupOps.starRescueCandidates(bands, starEdges)
      val edges = starEdges.unionByName(
        DedupOps.verifiedEdges(rescueCand, sh)).distinct()
      // combined distinct volume (star∩rescue overlap dedup'd):
      // star∪rescue ⊆ all-pairs as candidate sets, so this never
      // exceeds the all-pairs meter
      (GraphOps.connectedComponents(ids, edges).localCheckpoint(),
        verifyVolume(DedupOps.starCandidates(bands).unionByName(rescueCand)))
    }
    val allVol = verifyVolume(DedupOps.allPairCandidates(bands))

    // ---- truth: adjacent chain pairs are the true dups
    val truth = spark.read.parquet(dir)
      .where(col("pos") < chainLen - 1)
      .select(col("doc_id").as("id_t"), col("chain"), col("pos"))
      .join(spark.read.parquet(dir)
          .select(col("doc_id").as("id_u"), col("chain"),
            (col("pos") - 1).as("pos")),
        Seq("chain", "pos"))
      .select("id_t", "id_u")
    val nTruth = truth.count()

    def recall(cc: DataFrame): Long = truth
      .join(cc.select(col("id").as("id_t"), col("component_id").as("c_t")), Seq("id_t"))
      .join(cc.select(col("id").as("id_u"), col("component_id").as("c_u")), Seq("id_u"))
      .where(col("c_t") === col("c_u")).count()

    val allHit = recall(allCc)
    val starHit = recall(starCc)
    val rescueHit = recall(rescueCc)

    // ---- partition diff between the two policies
    val joined = allCc.select(col("id"), col("component_id").as("c_all"))
      .join(starCc.select(col("id"), col("component_id").as("c_star")), Seq("id"))
    val d = joined.agg(
      countDistinct(col("c_all")).as("n_all"),
      countDistinct(col("c_star")).as("n_star"),
      countDistinct(struct(col("c_all"), col("c_star"))).as("n_pairs"),
      sum(when(col("c_all") =!= col("c_star"), 1L).otherwise(0L)).as("n_label_diff"))
      .collect()(0)

    println(f"[star-recall] truthPairs=$nTruth allPairs: hit=$allHit " +
      f"(${100.0 * allHit / nTruth}%.3f%%) wall=$allSecs%.1f s | " +
      f"star: hit=$starHit (${100.0 * starHit / nTruth}%.3f%%) wall=$starSecs%.1f s")
    println(f"[star-recall] star+rescue: hit=$rescueHit " +
      f"(${100.0 * rescueHit / nTruth}%.3f%%) wall=$rescueSecs%.1f s " +
      f"verifyVolume=$rescueVol vs allPairs=$allVol " +
      f"(${100.0 * rescueVol / math.max(allVol, 1L)}%.1f%%)")
    println(s"[star-recall] components all=${d.getLong(0)} star=${d.getLong(1)} " +
      s"crossLabels=${d.getLong(2)} labelDiffDocs=${d.getLong(3)} " +
      s"partitionsIdentical=${d.getLong(0) == d.getLong(1) && d.getLong(1) == d.getLong(2)}")
    spark.stop()
  }
}
