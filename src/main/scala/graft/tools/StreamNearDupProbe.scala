package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.DedupOps
import graft.streaming.StreamNearDup

/** StreamNearDup at corpus scale (VERDICT r12 #5). The operator is
  * spec-pinned (StreamNearDupSpec: batch parity, eviction, saturation
  * cap) but had no scale row. This probe drives a real corpus
  * (default: the 500k-doc /tmp/sf10 derivation) through the streaming
  * est-gate as a rate-limited MemoryStream — docs arrive in
  * arrival-rank order, one event per 10 ms of simulated time — and
  * reports:
  *
  *  - per-batch latency (mean/max trigger ms) and throughput;
  *  - state-store rows per progress vs the analytic bound
  *    (active band buckets in the horizon × maxMembers is the cap;
  *    the measured plateau is active-bucket count itself);
  *  - recall vs the BATCH est-gate on the same corpus: stream flags
  *    must equal the batch-gated pairs' later-arriving sides
  *    (full-span horizon leg), and the saturation count (0 expected on
  *    the clean corpus);
  *  - a bounded-horizon leg where event-time eviction must hold the
  *    state plateau well under the full-span bucket count.
  *
  * Run: `sbt "runMain graft.tools.StreamNearDupProbe [corpusDir]
  * [nBatches] [horizonFracPct]"` (defaults /tmp/sf10, 20, 10).
  *
  * CHAIN leg (VERDICT r14 #5): `corpusDir` = `chain:<nDocs>:<chainLen>`
  * generates the StarRecallProbe chain corpus (sliding-token-window
  * chains, PERMUTED doc ids — the star policy's measured loss mode) and
  * runs the same legs over it. The full-span leg's `missed` count
  * against the batch ALL-PAIRS est-gate is the rescue question's
  * answer: the stream stage compares a doc against EVERY live bucket
  * member (incident-pairs within the horizon), never only the
  * bucket-min, so star's chain-loss mode cannot occur — missed = 0
  * expected, hence no rescue round to adopt (policy note in
  * [[graft.streaming.StreamNearDup]]'s scaladoc).
  * `chain:<nDocs>:<chainLen>:aligned` keeps ids in chain order — the
  * realistic ingest shape where near-dups arrive NEAR each other — so
  * the bounded-horizon leg prices the horizon trade from the other
  * side (measured: loses nothing at a 10% horizon, vs everything
  * under the adversarial permutation).
  */
object StreamNearDupProbe {

  /** StarRecallProbe's chain construction (60-token windows, step 12,
    * permuted ids), reduced to the (doc_id, text) shape this probe
    * consumes. */
  private def writeChainCorpus(spark: SparkSession, nDocs: Int,
                               chainLen: Int, aligned: Boolean = false): String = {
    import org.apache.spark.sql.functions._
    // aligned = ids in chain order (dups arrive NEAR each other — the
    // realistic ingest shape, where the bounded horizon should catch
    // ~everything); default = permuted ids (the adversarial shape,
    // where every chain neighbor arrives a fixed large rank apart)
    val mult =
      if (aligned) 1L
      else Seq(48271L, 1000003L, 7919L)
        .find(m => BigInt(m).gcd(BigInt(nDocs)) == 1)
        .getOrElse(sys.error(s"no coprime multiplier for $nDocs"))
    val tokensPerDoc = 60; val step = 12
    val tokenExprs = (0 until tokensPerDoc).map { k =>
      md5(concat(col("chain").cast("string"), lit("#"),
        (col("pos") * step + k).cast("string")))
    }
    val dir = s"/tmp/snd_chain_${nDocs}_${chainLen}${if (aligned) "_aligned" else ""}"
    spark.range(nDocs.toLong)
      .select(((col("id") * mult) % nDocs).as("doc_id"),
        expr(s"id div $chainLen").as("chain"),
        (col("id") % chainLen).as("pos"))
      .withColumn("text", concat_ws(" ", tokenExprs: _*))
      .select("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  final case class Doc(docId: Long, text: String,
                       eventTime: java.sql.Timestamp)

  def main(args: Array[String]): Unit = {
    val corpusArg = args.headOption.getOrElse("/tmp/sf10")
    val nBatches = args.lift(1).flatMap(_.toIntOption).getOrElse(20)
    val horizonFracPct = args.lift(2).flatMap(_.toIntOption).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.NativeVectorExprs.register(spark)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpusDir = corpusArg match {
      case s if s.startsWith("chain:") =>
        val parts = s.stripPrefix("chain:").split(":")
        writeChainCorpus(spark, parts(0).toInt,
          parts.lift(1).map(_.toInt).getOrElse(8),
          aligned = parts.lift(2).contains("aligned"))
      case dir => dir
    }

    val base = 1767175200000L // 2026-01-15T10:00:00Z
    val stepMs = 10L

    val raw = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val n = raw.count()
    val (nBands, rowsPer) = TextFns.minhashGeometryFor(16, n, targetBucketSize = 128)
    val spanMs = n * stepMs
    println(s"[snd-probe] corpus=$n docs geometry=${nBands}x$rowsPer " +
      s"span=${spanMs / 1000}s batches=$nBatches")

    // arrival rank = doc_id order (driver-side rank map; O(n) longs)
    val idsSorted = raw.select("doc_id").collect().map(_.getLong(0)).sorted
    val rankOf = idsSorted.zipWithIndex.toMap
    val rankOfB = spark.sparkContext.broadcast(rankOf)
    val rankUdf = udf((id: Long) => rankOfB.value(id))

    // ---- batch comparator: est-gated pairs over the full corpus;
    // expected stream flags = each gated pair's LATER side
    val docsSh = raw
      .select(col("doc_id"), TextFns.shingleHashesFromText("text", 3).as("sh"))
      .localCheckpoint()
    val withSig = docsSh.select(col("doc_id"),
      TextFns.minhashSignature("sh", 16).as("sig"))
    val bandExprs = (0 until nBands).map { b =>
      md5(concat_ws("|",
        (0 until rowsPer).map(r => col("sig").getItem(b * rowsPer + r).cast("string")): _*))
    }
    val bands = withSig
      .select(col("doc_id"), col("sig"), explode(array(bandExprs: _*)).as("bucket"))
    val gated = DedupOps.allPairCandidates(bands)
      .where(expr("graft_sig_agree(sig_a, sig_b)") >= 4)
      .select("id_a", "id_b").distinct()
    val expectedFlags = gated
      .select(when(rankUdf(col("id_a")) > rankUdf(col("id_b")), col("id_a"))
        .otherwise(col("id_b")).as("doc_id"))
      .distinct().collect().map(_.getLong(0)).toSet
    val nBuckets = bands.select("bucket").distinct().count()
    println(s"[snd-probe] batch est-gate: ${gated.count()} gated pairs, " +
      s"${expectedFlags.size} expected later-side flags, $nBuckets distinct buckets")

    def leg(name: String, horizonMs: Long): Unit = {
      val stream = MemoryStream[Doc]
      val verdicts = StreamNearDup.nearDupVerdicts(
        stream.toDF(), "docId", "text", "eventTime", nBands, rowsPer,
        delay = s"${horizonMs / 1000} seconds", horizonMs = horizonMs)
      val flagged = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]()
      val saturatedDocs = new java.util.concurrent.atomic.AtomicLong(0)
      // recall-forfeit ledger totals (VERDICT r15 #5): the per-window
      // side output summed over the run — arrivals refused at the cap
      // and members aged out by the horizon are the two quantified
      // recall losses this configuration accepted
      val arrivalsAtCap = new java.util.concurrent.atomic.AtomicLong(0)
      val prunedByHorizon = new java.util.concurrent.atomic.AtomicLong(0)
      val lossWindows = new java.util.concurrent.atomic.AtomicLong(0)
      val ckpt = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft-snd").toString
      val query = verdicts.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamNearDup.BandVerdict],
                         _: Long) =>
          val d = StreamNearDup.decisions(batch)
            .select(col("docId"), col("is_near_dup"), col("any_bucket_saturated"))
            .collect()
          d.foreach { r =>
            if (r.getBoolean(1)) flagged.put(r.getLong(0), true)
            if (r.getBoolean(2)) saturatedDocs.incrementAndGet()
          }
          StreamNearDup.recallLedger(batch, "1 minute").collect().foreach { w =>
            val cap = w.getLong(w.fieldIndex("arrivals_at_cap"))
            val pruned = w.getLong(w.fieldIndex("members_pruned_by_horizon"))
            arrivalsAtCap.addAndGet(cap)
            prunedByHorizon.addAndGet(pruned)
            if (cap + pruned > 0) lossWindows.incrementAndGet()
          }
        }
        .start()

      val chunk = math.max(1, (n / nBatches).toInt)
      var sent = 0L
      val t0 = System.nanoTime()
      idsSorted.grouped(chunk).foreach { idChunk =>
        val lo = idChunk.head; val hi = idChunk.last
        val docs = raw.where(col("doc_id").between(lo, hi)).collect().map { r =>
          val id = r.getLong(0)
          Doc(id, r.getString(1),
            new java.sql.Timestamp(base + rankOf(id) * stepMs))
        }
        stream.addData(docs.toIndexedSeq)
        query.processAllAvailable()
        sent += docs.length
      }
      // one tick doc so the final watermark advance triggers event-time
      // eviction accounting in the last progress (≥3 tokens: a shorter
      // text has no 3-shingles and a null signature would hit the state
      // encoder's non-nullable array field)
      stream.addData(Seq(Doc(-1L, "wm advance tick doc xx yy",
        new java.sql.Timestamp(base + spanMs + horizonMs + 1000))))
      query.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9

      val prog = query.recentProgress.toSeq
      val batchMs = prog.map(_.durationMs.getOrDefault("triggerExecution", 0L).toLong)
        .filter(_ > 0)
      val stateRowsSeries = prog.flatMap(_.stateOperators.headOption)
        .map(_.numRowsTotal)
      query.stop()

      val streamFlags = {
        val s = scala.collection.mutable.Set[Long]()
        flagged.keySet().forEach(k => { s += k; () })
        s.toSet - (-1L)
      }
      val missed = expectedFlags -- streamFlags
      val extra = streamFlags -- expectedFlags
      println(f"[snd-probe] leg=$name horizon=${horizonMs / 1000}s docs=$sent " +
        f"wall=$wall%.1f s rate=${sent / wall}%.0f docs/s " +
        f"batchMs(mean=${if (batchMs.isEmpty) 0 else batchMs.sum / batchMs.size}," +
        f"max=${if (batchMs.isEmpty) 0 else batchMs.max}) " +
        f"stateRows(max=${stateRowsSeries.maxOption.getOrElse(-1L)}," +
        f"last=${stateRowsSeries.lastOption.getOrElse(-1L)}) " +
        f"bucketBound=$nBuckets")
      println(s"[snd-probe] leg=$name flags=${streamFlags.size} " +
        s"expected=${expectedFlags.size} missed=${missed.size} extra=${extra.size} " +
        s"saturatedDocRows=${saturatedDocs.get()} " +
        s"ledger(arrivalsAtCap=${arrivalsAtCap.get()}," +
        s"prunedByHorizon=${prunedByHorizon.get()}," +
        s"lossWindows=${lossWindows.get()})")
    }

    // Leg A: horizon covers the whole span — stream flags must match
    // the batch est-gate's later sides exactly (no eviction in play)
    leg("full-span", spanMs + 60000L)
    // Leg B: bounded horizon — eviction must hold the plateau;
    // flags become a subset (members beyond the horizon are pruned)
    leg("bounded", math.max(1000L, spanMs * horizonFracPct / 100))
    spark.stop()
  }
}
