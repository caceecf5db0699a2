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

  final case class Compaction(partition: String, filesBefore: Int,
                              filesAfter: Int, rows: Long)

  /** Small-file compaction for the events table — the partitioned-lake
    * analogue of the reference's post-cleanup `VACUUM` pass
    * (`cli/app.py:180-222`: delete old rows, then reclaim storage). A
    * streaming sink accretes one file per micro-batch, so an old day
    * partition can hold hundreds of KB-sized parquet files whose
    * per-file open/footer cost dominates any later scan; compaction
    * rewrites such a partition into `targetFiles` files.
    *
    * A partition is rewritten only when it has more than `targetFiles`
    * parquet files AND every file is below `smallFileBytes` — a
    * partition with even one healthy-sized file is left alone (it is
    * either already compacted or still hot). The rewrite is
    * tmp-dir-then-swap with a row-count check before the original is
    * deleted (same discipline as the atomic hour writer): a crash
    * before the swap leaves the original intact plus a `.compact_tmp`
    * dir that the next run overwrites. Row CONTENT is untouched —
    * files are read and rewritten column-for-column; only the file
    * layout changes.
    *
    * Scale shape: each partition is an independent bounded job (one
    * day of one table); a 100 TB lake compacts day-by-day behind the
    * retention watermark, never as one global rewrite. */
  def compactDayPartitions(spark: SparkSession, root: String,
                           partitionCol: String,
                           smallFileBytes: Long = 32L * 1024 * 1024,
                           targetFiles: Int = 1): Seq[Compaction] = {
    require(targetFiles >= 1, "targetFiles must be at least 1")
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    val rootPath = new HPath(root)
    if (!fs.exists(rootPath)) return Seq.empty
    val out = Vector.newBuilder[Compaction]
    for (status <- fs.listStatus(rootPath) if status.isDirectory) {
      val name = status.getPath.getName
      if (name.startsWith(s"$partitionCol=")) {
        val parquets = fs.listStatus(status.getPath)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        if (parquets.length > targetFiles && parquets.forall(_.getLen < smallFileBytes)) {
          val df = spark.read.parquet(status.getPath.toString)
          val before = df.count()
          val tmp = new HPath(rootPath, s".compact_tmp/$name")
          fs.delete(tmp, true)
          df.coalesce(targetFiles).write.mode("overwrite").parquet(tmp.toString)
          val after = spark.read.parquet(tmp.toString).count()
          require(after == before,
            s"compaction row-count mismatch for $name: $before -> $after; original kept")
          fs.delete(status.getPath, true)
          fs.rename(tmp, status.getPath)
          val filesAfter = fs.listStatus(status.getPath)
            .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          out += Compaction(name.stripPrefix(s"$partitionCol="),
            parquets.length, filesAfter, before)
        }
      }
    }
    fs.delete(new HPath(rootPath, ".compact_tmp"), true)
    out.result()
  }

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
