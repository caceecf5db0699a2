package graft.sources

import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Retention cleanup (ST8 — reference `websocket.py:798-899`,
  * `cli/app.py:180-222`): raw live events older than N hours and
  * heartbeats older than N days are dropped. On a partitioned lake this
  * is a partition-DROP job — directory removals keyed by the partition
  * value, never a row-level delete scan. */
object Retention {

  /** Drop `day=YYYY-MM-DD`-style partitions older than `cutoff` under
    * `root/<partitionCol>=...`. Returns dropped partition values. */
  def dropDayPartitionsBefore(spark: SparkSession, root: String,
                              partitionCol: String, cutoff: Instant): Seq[String] = {
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    val rootPath = new HPath(root)
    if (!fs.exists(rootPath)) return Seq.empty
    val cutoffDay = cutoff.atZone(ZoneOffset.UTC).toLocalDate
    val dropped = Vector.newBuilder[String]
    for (status <- fs.listStatus(rootPath) if status.isDirectory) {
      val name = status.getPath.getName
      if (name.startsWith(s"$partitionCol=")) {
        val value = name.stripPrefix(s"$partitionCol=")
        val dayOpt = scala.util.Try(LocalDate.parse(value)).toOption
        if (dayOpt.exists(_.isBefore(cutoffDay))) {
          fs.delete(status.getPath, true)
          dropped += value
        }
      }
    }
    dropped.result()
  }
}
