package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core reusable Spark idioms — the six patterns that cover ~90% of the
  * reference's operator inventory (SURVEY.md §2, §7.1 item 3).
  *
  * Scale notes (100 TB target):
  *  - every helper that needs a global sort order takes `partitionCols`;
  *    a window with empty partitioning collapses to a single task and is
  *    only acceptable for driver-bounded result sets (API windows of
  *    ≤500 bars). All lake-scale paths must pass the natural key
  *    (symbol / user / entity) so the window shuffle is hash-distributed.
  *  - as-of joins additionally offer a bucketed variant
  *    ([[AsOf.asofJoinBackwardBucketed]]) that stays scalable even when
  *    there is no small partition key, by range-bucketing time.
  */
object Ops {

  /** Last-wins dedup: keep exactly one row per `keys`, the one with the
    * greatest `order` tuple (nulls first so real values win over nulls).
    * Mirrors the reference's `unique(subset=…, keep=last)` after sort
    * (reference `aggregator/source_reader.py:44-59`, `writer/atomic.py:67-72`).
    * Implemented as a ranking window: one shuffle on `keys`, no join.
    */
  def dedupKeepLast(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc_nulls_last): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Bounded forward-fill: last non-null value of `value` within the
    * previous `limit` rows (inclusive of current), ordered by `order`
    * within `partitionCols`. `limit = None` → unbounded ffill.
    * Mirrors `forward_fill(limit=n)` (reference `transforms/minute_builder.py:624-642`).
    * Pure built-in window — no UDF (SURVEY §2.10).
    */
  def boundedFfill(value: Column, order: Seq[Column], limit: Option[Int],
                   partitionCols: Seq[Column] = Nil): Column = {
    val frame = limit match {
      case Some(n) => Window.partitionBy(partitionCols: _*).orderBy(order: _*)
        .rowsBetween(-n.toLong, Window.currentRow)
      case None => Window.partitionBy(partitionCols: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    last(value, ignoreNulls = true).over(frame)
  }

  /** Running cumulative sum (the API's CVD — reference
    * `live_data_api_service/aggregation.py:222-227`). */
  def runningSum(value: Column, order: Seq[Column],
                 partitionCols: Seq[Column] = Nil): Column =
    sum(value).over(Window.partitionBy(partitionCols: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Weighted average with simple-mean fallback when total weight is 0 —
    * the HTF depth-column rule (reference `aggregator/aggregation_rules.py:234-254`).
    * Aggregate expression: `sum(v*w)/sum(w)` guarded, else `avg(v)`. */
  def weightedAvgFallback(v: Column, w: Column): Column =
    when(sum(w) > 0, sum(v * w) / sum(w)).otherwise(avg(v))

  /** First value of `v` by ascending `ord` within a group. Polars'
    * order-dependent `.first()` is nondeterministic in Spark groupBy —
    * always use an explicit ordering key (SURVEY §7.3). */
  def firstByOrd(v: Column, ord: Column): Column = min_by(v, ord)

  /** Last value of `v` by ascending `ord` within a group. */
  def lastByOrd(v: Column, ord: Column): Column = max_by(v, ord)

  /** Last NON-NULL value of `v` by `ord` — the HTF "snapshot" rule
    * (reference `aggregation_rules.py:200-224`): the ordering key is
    * nulled when the value is null so null rows can never win. */
  def lastNonNullByOrd(v: Column, ord: Column): Column =
    max_by(v, when(v.isNotNull, ord))

  /** First NON-NULL value of `v` by `ord` (HTF mark/index open rule). */
  def firstNonNullByOrd(v: Column, ord: Column): Column =
    min_by(v, when(v.isNotNull, ord))

  /** Dense time spine: one row per `step` between `start` and `end`
    * (inclusive), column name `colName`. Mirrors the reference's
    * per-minute `datetime_range` spine (`minute_builder.py:125-143`).
    * `sequence` is generated on executors via explode — no driver loop.
    * For very long ranges, pre-split into day chunks so the generated
    * array stays bounded per row.
    */
  def timeSpine(spark: SparkSession, start: String, end: String,
                step: String = "interval 1 minute", colName: String = "ts"): DataFrame =
    spark.range(1).select(
      explode(sequence(
        lit(start).cast("timestamp"), lit(end).cast("timestamp"), expr(step)
      )).as(colName))

  /** Gaps-and-islands session ids: a new session starts when the gap to
    * the previous row (by `order` within `partitionCols`) exceeds
    * `maxGapSeconds`. Returns a session ordinal per partition (classic
    * lag + running-sum-of-breaks; reference coalesces missing-bucket
    * windows the same way — `aggregator/backfill.py:105-121`). */
  def sessionId(ts: Column, order: Seq[Column], partitionCols: Seq[Column],
                maxGapMs: Long): Column = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(order: _*)
    // millisecond precision (unix_millis) so gap math is exact and
    // engine-portable; unix_timestamp would floor to seconds.
    val break = when(
      unix_millis(ts) - unix_millis(lag(ts, 1).over(w)) > maxGapMs, 1L
    ).otherwise(lit(0L))
    sum(break).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
  }

  /** Anti-join set-minus on key columns (missing-bucket detection —
    * reference `aggregator/validator.py:45-52`). */
  def antiByKeys(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Salted equi-join for skewed keys (SURVEY §4 shuffle notes): the
    * skewed (large) side gets a deterministic salt derived from a
    * stable row expression, the small side is replicated across all
    * `saltBuckets` salt values, and the join runs on (keys…, salt) so
    * one hot key fans out over `saltBuckets` tasks instead of one.
    * AQE's skew-join split handles moderate skew on its own; this is
    * the explicit form for pathological keys (a viral symbol, a
    * hot shingle) where even one AQE sub-partition stays hot.
    *
    * @param saltSource stable per-row expression on `large` (e.g. a
    *                   monotonic id or event id) — hashed, not random,
    *                   so retries/replays salt identically
    */
  /** Hot-bucket guard for LSH-style candidate generation: self-joining
    * on a bucket key is quadratic in bucket occupancy, so one
    * pathological bucket (a boilerplate shingle, a degenerate embedding
    * region) can dominate the whole job. Splits `df` into rows whose
    * bucket holds ≤ `cap` rows and a per-bucket accounting frame of the
    * DROPPED buckets `(bucketCols…, occupancy)` — callers must surface
    * the drops (log/metric/audit output), never swallow them: a capped
    * pipeline that reports nothing reads as "covered everything".
    *
    * One partial-aggregated count + a semi/anti join pair — the count
    * frame carries one row per bucket, so the guard costs far less than
    * the quadratic work it prevents. (At LSH sizing `numPlanes ≈
    * log2(n/targetBucketSize)` the cap should rarely fire; it exists for
    * the skew the sizing rule can't see, e.g. near-constant vectors.) */
  def capBucketOccupancy(df: DataFrame, bucketCols: Seq[String],
                         cap: Long): (DataFrame, DataFrame) = {
    val occ = df.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("occupancy"))
    val kept = df.join(
      occ.where(col("occupancy") <= cap).select(bucketCols.map(col): _*),
      bucketCols, "left_semi")
    (kept, occ.where(col("occupancy") > cap))
  }

  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltSource: Column, saltBuckets: Int,
                 joinType: String = "inner"): DataFrame = {
    // replication makes right/full joins emit unmatched small-side rows
    // once PER SALT — only large-side-preserving shapes are sound
    // (semi/anti included: a large row's (key, salt) matches iff its key
    // exists on the replicated small side)
    require(Set("inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
      .contains(joinType.toLowerCase),
      s"saltedJoin requires a large-side-preserving join type, got $joinType")
    val l = large.withColumn("__salt", pmod(hash(saltSource), lit(saltBuckets)))
    val s = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    l.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
