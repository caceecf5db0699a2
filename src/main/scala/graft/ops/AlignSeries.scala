package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-series → bar-frame alignment modes (reference
  * `live_data_api_service/alignment.py:37-110`, SURVEY §2.3 J3–J5):
  *
  *  - [[Mode.AsofBackward]]: last value at-or-before the align key
  *    (unbounded — funding settlements).
  *  - [[Mode.FfillWithMaxAge]]: same, but values older than maxAge
  *    relative to the align key are nulled.
  *  - [[Mode.Exact]]: series timestamps floored to the bar bucket, then
  *    left equi-join (snapshot series that tick once per bar).
  *
  * `alignAtBarClose` aligns at bar_open + barMs instead of bar open
  * (reference call site `service.py:1477-1488`).
  */
object AlignSeries {

  sealed trait Mode
  object Mode {
    case object AsofBackward extends Mode
    final case class FfillWithMaxAge(maxAgeMs: Long) extends Mode
    case object Exact extends Mode
  }

  def align(bars: DataFrame, series: DataFrame, barTs: String, seriesTs: String,
            valueCols: Seq[String], mode: Mode,
            alignAtBarClose: Boolean = false, barMs: Long = 0L): DataFrame = {
    val alignKey = "__align_ts"
    val withKey =
      if (alignAtBarClose)
        bars.withColumn(alignKey, timestamp_millis(unix_millis(col(barTs)) + barMs))
      else bars.withColumn(alignKey, col(barTs))

    val aligned = mode match {
      case Mode.AsofBackward =>
        AsOf.asofJoinBackward(withKey, series, alignKey, seriesTs, valueCols,
          toleranceMs = None)
      case Mode.FfillWithMaxAge(maxAge) =>
        // finite max-age → bucketed composition (hash-distributed window)
        AsOf.asofJoinBackwardBucketed(withKey, series, alignKey, seriesTs,
          valueCols, toleranceMs = maxAge)
      case Mode.Exact =>
        val floored = barMs match {
          case 0L => series.withColumn(alignKey, col(seriesTs))
          case ms => series.withColumn(alignKey,
            timestamp_millis(floor(unix_millis(col(seriesTs)) / ms).cast("long") * ms))
        }
        // keep-last per bucket, then left equi-join
        val deduped = Ops.dedupKeepLast(floored, Seq(alignKey), Seq(col(seriesTs)))
          .select((alignKey +: valueCols).map(col): _*)
        withKey.join(deduped, Seq(alignKey), "left")
    }
    aligned.drop(alignKey)
  }
}
