package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-vector math as pure Catalyst higher-order functions —
  * dot product / norm / cosine over `array<float|double>` columns without
  * UDFs, so similarity search stays codegen'd and scales with the scan.
  * Columns are referenced by NAME (Spark 4's Column no longer exposes its
  * expression tree).
  *
  * Scale path for ANN: brute-force top-k is a broadcast of the (small)
  * query set against the full embedding table — a single narrow pass, no
  * shuffle except the final per-query top-k. The bucketed variant (IVF /
  * LSH) prunes candidates before the distance computation.
  */
object VectorFns {

  /** Σ aᵢ·bᵢ in double precision via the native codegen'd kernel
    * ([[DotProduct]], registered as `graft_dot` — sessions must run
    * [[NativeVectorExprs.register]] or load [[graft.GraftExtensions]]).
    * Same left-to-right double accumulation as the previous
    * `aggregate(zip_with(...))` formulation, so results are
    * bit-identical; the fused loop skips the intermediate product
    * array and the two per-element lambda passes. */
  def dot(a: String, b: String): Column = expr(s"graft_dot($a, $b)")

  /** ‖a‖₂ = sqrt(a·a) */
  def l2Norm(a: String): Column = sqrt(expr(s"graft_dot($a, $a)"))

  /** cos(a,b) = a·b / (‖a‖‖b‖) */
  def cosine(a: String, b: String): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Deterministic Lloyd's k-means over an embedding column — the real
    * IVF trainer (replaces per-label stand-in centroids). The DATA stays
    * distributed (one distance-scan + one aggregation per iteration);
    * only the k×dim centroid table crosses the driver, broadcast back as
    * constant-folded literals — the standard Spark k-means shape.
    *
    * Determinism knobs (also what makes it cross-engine reproducible):
    *  - seeds = the k vectors with smallest md5(id) (no Math.random);
    *  - `roundScale`: distances and centroid components are
    *    double-rounded at this scale before reuse, collapsing
    *    sum-order ulp noise so assignments don't flip between runs,
    *    partitionings, or engines;
    *  - argmin ties break toward the lowest cluster id.
    *
    * Returns (assignments: idCol, cluster; centroids: cluster, Seq[dim
    * values]). Clusters that lose all members simply drop out.
    *
    * Reserves the `__`-prefixed working columns `__h`, `__d`, `__x`,
    * `__cx`, `__dims`, `__cents`, `__cluster`: input columns must not
    * collide with them (the library-wide convention — callers own the
    * un-prefixed namespace, operators own `__`). */
  def kmeansLloyd(df: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int, dim: Int,
                  roundScale: Int = 6): (DataFrame, Seq[(Int, Seq[Double])]) = {
    def stableRound(c: Column, s: Int): Column = round(round(c, s + 5), s)
    val vecD = s"transform($vecCol, x -> cast(x as double))"

    val seeds = df
      .withColumn("__h", md5(col(idCol).cast("string")))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .select(expr(vecD))
      .collect()
      .map(_.getSeq[Double](0).toSeq)
      .zipWithIndex.map { case (v, i) => (i, v) }.toSeq

    var centroids = seeds
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = assignClusters(df, vecCol, centroids, roundScale)
      centroids = assigned
        .select(col("__cluster"), posexplode(expr(vecD)).as(Seq("__d", "__x")))
        .groupBy("__cluster", "__d")
        .agg(stableRound(avg(col("__x")), roundScale).as("__cx"))
        .groupBy("__cluster")
        .agg(expr("array_sort(collect_list(struct(__d, __cx)))").as("__dims"))
        .collect()
        .map(r => (r.getInt(0),
          r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1)).toSeq))
        .sortBy(_._1).toSeq
    }
    (assignClusters(df, vecCol, centroids, roundScale)
       .withColumnRenamed("__cluster", "cluster"), centroids)
  }

  /** Public assignment pass with externally-trained centroids — the
    * 100 TB IVF shape: Lloyd's cost is per-pass linear in the TRAINING
    * rows, so train [[kmeansLloyd]] on a deterministic sample and
    * assign the full corpus here in one broadcast-centroid scan. The
    * assignment is the exact pass [[kmeansLloyd]] ends with (same
    * stable-rounded distances, same lowest-id tie-break), so
    * sample-trained assignment differs from full-trained ONLY through
    * the centroids, never through the scan. */
  def assignWithCentroids(df: DataFrame, vecCol: String,
                          centroids: Seq[(Int, Seq[Double])],
                          roundScale: Int = 6): DataFrame =
    assignClusters(df, vecCol, centroids, roundScale)
      .withColumnRenamed("__cluster", "cluster")

  /** HOF REFERENCE form of [[assignWithCentroids]] — per row one
    * `transform` plus per centroid a `zip_with` diff array and an
    * `aggregate`; kept as the spec cross-check for the native one-pass
    * [[NearestCentroid]] kernel (FunctionsSpec pins the two
    * bit-identical, incl. the stable-rounded distances and the
    * lowest-cid tie-break). */
  def assignWithCentroidsHof(df: DataFrame, vecCol: String,
                             centroids: Seq[(Int, Seq[Double])],
                             roundScale: Int = 6): DataFrame =
    assignClustersImpl(df, vecCol, centroids, roundScale, useNative = false)
      .withColumnRenamed("__cluster", "cluster")

  /** One assignment pass: nearest centroid by squared L2, distances
    * double-rounded at `distScale`, lowest cluster id on ties.
    *
    * Scale shape: the centroid table is DATA, not plan — a single
    * broadcast row holding `array<struct<cid,cvec>>`, so the generated
    * expression is O(1) in k (an earlier formulation inlined every
    * centroid component as a casted SQL literal, which is a
    * parser/codegen blowup at real IVF sizes like k=4096 × dim=768).
    * The distance keeps the exact accumulation of the previous form —
    * `aggregate(zip_with(...))` widened to double, summed left-to-right,
    * double-rounded — so every previously hash-green assignment is
    * bit-unchanged. Argmin via `array_min` over `struct(d, cid)`:
    * struct ordering is lexicographic, so ties on distance resolve to
    * the lowest cluster id, same as before. */
  private def assignClusters(df: DataFrame, vecCol: String,
                             centroids: Seq[(Int, Seq[Double])],
                             distScale: Int): DataFrame =
    assignClustersImpl(df, vecCol, centroids, distScale, useNative = true)

  private def assignClustersImpl(df: DataFrame, vecCol: String,
                                 centroids: Seq[(Int, Seq[Double])],
                                 distScale: Int, useNative: Boolean): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    NativeVectorExprs.register(spark)
    val cents = centroids.sortBy(_._1)
      .toDF("cid", "cvec")
      .agg(expr("array_sort(collect_list(struct(cid, cvec)))").as("__cents"))
    val cluster =
      if (useNative) expr(s"graft_nearest_centroid($vecCol, __cents, $distScale)")
      else expr(
        s"""array_min(transform(__cents, c -> named_struct(
           |  'd', round(round(aggregate(zip_with($vecCol, c.cvec,
           |         (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),
           |       0.0d, (a, v) -> a + v), ${distScale + 5}), $distScale),
           |  'cid', c.cid))).cid""".stripMargin)
    df.crossJoin(broadcast(cents))
      .withColumn("__cluster", cluster)
      .drop("__cents")
  }

  /** Auto-sized hyperplane count for [[withHyperplaneBucket]] — the
    * SIZING rule from that method's scaladoc as code instead of prose:
    * the smallest `p` such that `2^p` buckets hold the corpus at
    * ~`targetBucketSize` rows each, i.e. `ceil(log2(ceil(n /
    * targetBucketSize)))`, clamped to [1, maxPlanes]. In-bucket
    * candidate work is quadratic in occupancy, so a FIXED plane count
    * goes quadratic as the corpus grows (measured ×23 at 10× rows in
    * the sf1 probe, SURVEY §8.10) while this rule holds occupancy — and
    * therefore per-bucket work — constant. Integer arithmetic
    * throughout (`numberOfLeadingZeros`, no floating log), so the
    * choice can't flip on an ulp at power-of-two boundaries; a DuckDB
    * mirror `ceil(log2(ceil(n/t)))` agrees for every integer input
    * because C log2 is exact at powers of two. */
  def planesFor(n: Long, targetBucketSize: Long, maxPlanes: Int = 30): Int = {
    require(n > 0 && targetBucketSize > 0,
      "planesFor needs a positive corpus count and target bucket size")
    val buckets = (n + targetBucketSize - 1) / targetBucketSize
    val p = if (buckets <= 1L) 1
            else 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1)
    math.min(maxPlanes, math.max(1, p))
  }

  /** Component d of hyperplane p in [-0.5, 0.5): the driver-side twin of
    * the SQL formula
    * `(cast(conv(substr(md5('seed:p:d'),1,15),16,10) as bigint) % 1000) / 1000.0d - 0.5d`.
    * Java's MD5 hex equals Spark's `md5`, `Long.parseLong(hex15, 16)`
    * equals `conv(…,16,10)` (15 hex chars < 2^60, no sign issues), and
    * `% 1000 / 1000.0 - 0.5` are the same IEEE ops — so the values are
    * bit-identical to the old inlined-literal formulation and to a
    * DuckDB oracle computing the same SQL. */
  private def planeComponent(seed: Int, p: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$p:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000) / 1000.0 - 0.5
  }

  /** Random-hyperplane LSH bucket per row: sign bits of dot products with
    * `numPlanes` deterministic pseudo-random hyperplanes whose components
    * are derived from md5(seed:plane:dim) — reproducible across engines
    * and runs (no Math.random, per design). Adds `bucketCol` as a bigint
    * bucket id in [0, 2^numPlanes).
    *
    * Scale shape: the plane matrix is DATA, not plan — a single broadcast
    * row of `array<struct<pid,pvec>>`, folded with one constant-size
    * `aggregate` HOF, so the expression tree is O(1) in dim×numPlanes.
    * (An earlier Column-returning form inlined every component as a
    * generated md5/conv subexpression — O(dim·planes) nodes, a
    * parser/analyzer blowup at production sizes like dim=768 × 16
    * planes.) Per-plane dot products keep the exact accumulation of the
    * old form — `aggregate(zip_with(...))` widened to double, summed
    * left-to-right — and bits accumulate in ascending plane order, so
    * bucket ids are bit-unchanged.
    *
    * Reserves the working column `__planes` (same `__`-prefix convention
    * as [[kmeansLloyd]]'s `__cents`/`__cluster`/`__h`): input columns
    * must not collide with it.
    *
    * SIZING: candidate pairs within a bucket are quadratic in bucket
    * occupancy, so `numPlanes` must TRACK the corpus — pick
    * `numPlanes ≈ log2(n / targetBucketSize)` (e.g. ~2^7 rows per
    * bucket) rather than a fixed constant; the sf0.1→sf1 scale probe
    * (SURVEY §8.10) shows a fixed plane count going quadratic at 10×
    * data. The plan stays O(1) regardless — only the broadcast row
    * grows, by dim×8 bytes per extra plane. */
  def withHyperplaneBucket(df: DataFrame, vecCol: String, bucketCol: String,
                           dim: Int, numPlanes: Int, seed: Int = 7): DataFrame =
    withHyperplaneBucketImpl(df, vecCol, bucketCol, dim, numPlanes, seed,
      bucketExpr = planesCol =>
        expr(s"graft_hyperplane_bucket($vecCol, $planesCol)"))

  /** HOF REFERENCE form of [[withHyperplaneBucket]] — per row, one
    * outer `aggregate` plus per plane a `zip_with` product array and an
    * inner `aggregate`; kept as the spec cross-check for the native
    * one-pass [[HyperplaneBucket]] kernel (FunctionsSpec pins the two
    * bit-identical over randomized vectors incl. null/NaN edges). */
  def withHyperplaneBucketHof(df: DataFrame, vecCol: String, bucketCol: String,
                              dim: Int, numPlanes: Int, seed: Int = 7): DataFrame =
    withHyperplaneBucketImpl(df, vecCol, bucketCol, dim, numPlanes, seed,
      bucketExpr = planesCol => expr(
        s"""aggregate($planesCol, 0L, (b, pl) -> b +
           |  (case when aggregate(zip_with($vecCol, pl.pvec,
           |          (x, y) -> cast(x as double) * y),
           |        0.0d, (a, v) -> a + v) > 0
           |   then shiftleft(1L, pl.pid) else 0L end))""".stripMargin))

  private def withHyperplaneBucketImpl(df: DataFrame, vecCol: String,
                                       bucketCol: String, dim: Int,
                                       numPlanes: Int, seed: Int,
                                       bucketExpr: String => Column): DataFrame = {
    require(!df.columns.contains("__planes"),
      "input must not contain the reserved working column __planes")
    val spark = df.sparkSession
    import spark.implicits._
    NativeVectorExprs.register(spark)
    val planes = (0 until numPlanes).map { p =>
      (p, (0 until dim).map(d => planeComponent(seed, p, d)))
    }
    val planesDf = Seq(Tuple1(planes)).toDF("__planes")
      .select(col("__planes")
        .cast("array<struct<pid:int,pvec:array<double>>>").as("__planes"))
    df.crossJoin(broadcast(planesDf))
      .withColumn(bucketCol, bucketExpr("__planes"))
      .drop("__planes")
  }
}
