package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, GraphOps}

/** Pins the semantics of the three candidate policies — in particular
  * the EXACT recall boundary between star and all-pairs verification,
  * by constructing the one case where they differ: a true-duplicate
  * pair whose only shared bucket has a FALSE-COLLISION min (a
  * non-duplicate that est-gate-passes but exact-verify-fails occupying
  * the min slot). On real corpora the two policies measured identical
  * assignments (sf0.01: 476/476 components, sf10: 5,268/5,268 — zero
  * docs differ); this spec proves they are nonetheless different
  * operators and that the difference is confined to the documented
  * case (adding a second clean bucket restores the edge).
  */
class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  // A=1 is a false collision: shares a bucket with the true duplicates
  // X=2, Y=3, agrees with their signatures in 5 of 16 positions (passes
  // the est-gate at minAgree=4) but has disjoint shingles (exact verify
  // rejects). X and Y are verbatim duplicates (identical sh, sig).
  private val sigX: Array[Long] = (1L to 16L).toArray
  private val sigA: Array[Long] = (1L to 16L).map(i => if (i <= 5) i else 100L + i).toArray
  private val shX: Array[Long] = (100L to 109L).toArray
  private val shA: Array[Long] = (200L to 209L).toArray

  private def shingles: DataFrame =
    Seq((1L, shA), (2L, shX), (3L, shX)).toDF("doc_id", "sh")

  private def bands(rows: (Long, Array[Long], String, Boolean)*): DataFrame =
    rows.toDF("doc_id", "sig", "bucket", "is_new")

  private def comps(vertices: Seq[Long], edges: DataFrame): Map[Long, Long] =
    GraphOps.connectedComponents(vertices.toDF("id"), edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("false-collision min: star misses the duplicate pair that all-pairs verifies") {
    val b = bands((1L, sigA, "b0", false), (2L, sigX, "b0", false), (3L, sigX, "b0", false))
    // the est-gate must actually pass the false collision (otherwise
    // this constructs nothing) and exact verify must reject it
    val gated = DedupOps.allPairCandidates(b)
      .where(expr("graft_sig_agree(sig_a, sig_b)") >= 4).count()
    assert(gated == 3L, "all three pairs must pass the est-gate for the case to bind")
    val allEdges = DedupOps.verifiedEdges(DedupOps.allPairCandidates(b), shingles)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(allEdges == Set((2L, 3L)), "all-pairs verifies exactly the true duplicate")
    val starEdges = DedupOps.verifiedEdges(DedupOps.starCandidates(b), shingles)
      .collect()
    assert(starEdges.isEmpty,
      "star only tests (min=1, member) pairs, and 1 is not a true duplicate of either")
    // the closure consequence: all-pairs merges X,Y; star leaves them apart
    val cAll = comps(Seq(1L, 2L, 3L), DedupOps.verifiedEdges(DedupOps.allPairCandidates(b), shingles))
    val cStar = comps(Seq(1L, 2L, 3L), DedupOps.verifiedEdges(DedupOps.starCandidates(b), shingles))
    assert(cAll == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
    assert(cStar == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("rescue round recovers the constructed star loss, matching all-pairs") {
    // same false-collision corpus: star verifies nothing. Rescue pairs
    // each FAILED member (2 and 3) with its highest-agreement non-hub
    // partner — each picks the other (agree 16 vs the hub's 5, and the
    // hub is excluded anyway), so (2,3) verifies and the closure
    // matches all-pairs at ONE extra exact-verify pair, not the
    // quadratic bucket.
    val b = bands((1L, sigA, "b0", false), (2L, sigX, "b0", false), (3L, sigX, "b0", false))
    val starEdges = DedupOps.verifiedEdges(DedupOps.starCandidates(b), shingles)
    val rescueCand = DedupOps.starRescueCandidates(b, starEdges)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(rescueCand == Set((2L, 3L)),
      "both failed members pick each other as top-agreement partner")
    val edges = DedupOps.verifiedStarRescueEdges(b, shingles)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((2L, 3L)))
    val c = comps(Seq(1L, 2L, 3L), DedupOps.verifiedStarRescueEdges(b, shingles))
    assert(c == Map(1L -> 1L, 2L -> 2L, 3L -> 2L), "closure matches all-pairs")
  }

  test("a second band without the false min restores star's edge (the b-fold bound)") {
    // same corpus, but band 2 hashes X and Y into a bucket of their own:
    // the min there is X itself, the star pair (X, Y) verifies, and the
    // closure matches all-pairs — star recall loss requires the false
    // min in EVERY shared bucket, the intersection of b events
    val b = bands(
      (1L, sigA, "b0", false), (2L, sigX, "b0", false), (3L, sigX, "b0", false),
      (2L, sigX, "b1", false), (3L, sigX, "b1", false))
    val starEdges = DedupOps.verifiedEdges(DedupOps.starCandidates(b), shingles)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(starEdges == Set((2L, 3L)))
    val cStar = comps(Seq(1L, 2L, 3L), DedupOps.verifiedEdges(DedupOps.starCandidates(b), shingles))
    val cAll = comps(Seq(1L, 2L, 3L), DedupOps.verifiedEdges(DedupOps.allPairCandidates(b), shingles))
    assert(cStar == cAll && cStar == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("incident candidates cover exactly the pairs touching the increment") {
    // Y is the increment: incident pairs are (1,3) and (2,3) — the
    // old/old pair (1,2) is NOT re-tested (it was gated yesterday)
    val b = bands((1L, sigA, "b0", false), (2L, sigX, "b0", false), (3L, sigX, "b0", true))
    val cand = DedupOps.incidentCandidates(b)
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand == Set((1L, 3L), (2L, 3L)))
    val edges = DedupOps.verifiedEdges(DedupOps.incidentCandidates(b), shingles)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((2L, 3L)), "the increment's true-dup edge verifies; the false collision is rejected")
  }

  test("verifiedEdges applies the est-gate before exact verification") {
    // B=4 is a true duplicate of X by shingles but its signature agrees
    // in only 3 positions — the est-gate (minAgree=4) drops it before
    // exact verification ever runs. This is the documented ~1% false-
    // drop trade at J≈0.5 that buys the pre-shuffle candidate collapse.
    val sigB: Array[Long] = (1L to 16L).map(i => if (i <= 3) i else 500L + i).toArray
    val sh2 = Seq((2L, shX), (4L, shX)).toDF("doc_id", "sh")
    val b = Seq((2L, sigX, "b0", false), (4L, sigB, "b0", false))
      .toDF("doc_id", "sig", "bucket", "is_new")
    val edges = DedupOps.verifiedEdges(DedupOps.allPairCandidates(b), sh2).collect()
    assert(edges.isEmpty)
    val edgesLoose = DedupOps.verifiedEdges(DedupOps.allPairCandidates(b), sh2, minAgree = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgesLoose == Set((2L, 4L)))
  }
}
