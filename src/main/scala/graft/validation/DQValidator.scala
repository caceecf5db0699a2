package graft.validation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.schema.CanonicalSchema

final class DataQualityException(msg: String) extends RuntimeException(msg)

final case class DQResult(rowCount: Long, minTs: String, maxTs: String)

/** Pre-write data-quality gate (reference `validation/dq.py:22-63`):
  * canonical columns present, unique timestamps, no HARD_REQUIRED nulls.
  * All three checks fold into ONE aggregation pass. */
object DQValidator {

  def validate(frame: DataFrame): DQResult = validateKeyed(frame, Seq("timestamp"))

  /** [[validate]] with an explicit uniqueness key: per-symbol frames
    * dedup on `timestamp` alone; multi-symbol frames (the day-wide bulk
    * and delta-patch paths) on (symbol, timestamp). */
  def validateKeyed(frame: DataFrame, keys: Seq[String]): DQResult =
    validateKeyedCollecting(frame, keys, Nil)._1

  /** [[validateKeyed]] with caller-supplied EXTRA aggregate columns
    * folded into the same single pass — writers that need further
    * frame-level facts (touched days, distinct symbols) collect them
    * here instead of paying one more full-frame job each (r20).
    * Returns the validated result plus the extra aggregates' values in
    * `extra` order. */
  def validateKeyedCollecting(frame: DataFrame, keys: Seq[String],
                              extra: Seq[org.apache.spark.sql.Column]): (DQResult, Seq[Any]) = {
    val missing = CanonicalSchema.columnNames.toSet -- frame.columns.toSet
    if (missing.nonEmpty)
      throw new DataQualityException(
        s"Missing canonical columns: ${missing.toSeq.sorted.mkString(", ")}")

    val nullCounts = CanonicalSchema.hardRequired.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"))
    // bounds as unix_micros (absolute instants), rendered UTC driver-side:
    // these land in ledger rows the incremental tick windows on, so they
    // must not depend on spark.sql.session.timeZone (ADVICE r16 #1)
    val aggs = Seq(
      count(lit(1)).as("__rows"),
      countDistinct(struct(keys.map(col): _*)).as("__distinct_ts"),
      unix_micros(min(col("timestamp"))).as("__min_ts"),
      unix_micros(max(col("timestamp"))).as("__max_ts")) ++ nullCounts ++ extra
    val r = frame.agg(aggs.head, aggs.tail: _*).collect().head

    val rows = r.getLong(0)
    val distinctTs = r.getLong(1)
    if (distinctTs < rows)
      throw new DataQualityException(
        s"Found ${rows - distinctTs} duplicated " +
          s"${keys.mkString("(", ", ", ")")} buckets")

    // an empty frame aggregates its null counts to NULL — nothing to
    // gate (callers with empty-input semantics decide downstream)
    val violations =
      if (rows == 0) Nil
      else CanonicalSchema.hardRequired.zipWithIndex.collect {
        case (c, i) if r.getLong(4 + i) > 0 => s"$c=${r.getLong(4 + i)}"
      }
    if (violations.nonEmpty)
      throw new DataQualityException(
        s"HARD_REQUIRED null violations: ${violations.mkString(", ")}")

    def bound(i: Int): String =
      if (r.isNullAt(i)) "" else graft.sources.LedgerBounds.iso(r.getLong(i))
    val extraBase = 4 + CanonicalSchema.hardRequired.size
    (DQResult(rows, bound(2), bound(3)),
      extra.indices.map(i => r.get(extraBase + i)))
  }
}

/** Partition audit (reference `validation/partition_audit.py:18-95`):
  * row count, timestamp uniqueness, dense-minute coverage vs the
  * expected spine, HARD_REQUIRED null accounting — as a report, not a
  * gate. */
object PartitionAudit {

  final case class AuditReport(rowCount: Long, distinctTimestamps: Long,
                               expectedMinutes: Long, missingMinutes: Long,
                               duplicateTimestamps: Long,
                               hardRequiredNulls: Map[String, Long]) {
    def ok: Boolean =
      missingMinutes == 0 && duplicateTimestamps == 0 && hardRequiredNulls.isEmpty
  }

  def audit(frame: DataFrame, start: java.time.Instant, end: java.time.Instant): AuditReport = {
    val expected = (end.toEpochMilli - start.toEpochMilli) / 60000L + 1
    val nullCounts = CanonicalSchema.hardRequired.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"))
    val aggs = Seq(count(lit(1)).as("n"), countDistinct(col("timestamp")).as("d")) ++ nullCounts
    val r = frame.agg(aggs.head, aggs.tail: _*).collect().head
    val nulls = CanonicalSchema.hardRequired.zipWithIndex.collect {
      case (c, i) if r.getLong(2 + i) > 0 => c -> r.getLong(2 + i)
    }.toMap
    AuditReport(
      rowCount = r.getLong(0),
      distinctTimestamps = r.getLong(1),
      expectedMinutes = expected,
      missingMinutes = expected - r.getLong(1),
      duplicateTimestamps = r.getLong(0) - r.getLong(1),
      hardRequiredNulls = nulls)
  }
}
