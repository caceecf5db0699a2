package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table export — the co-located-join lever for the lake's
  * biggest repeated joins.
  *
  * A 100 TB minute lake is joined on `symbol` (and a training corpus on
  * `doc_id`) over and over: enrichment, overlay merges, repair diffs.
  * Hive-style bucketing pre-hashes rows into a fixed number of files
  * per partition at WRITE time, so every later join or aggregation on
  * the bucket key reads both sides already co-partitioned — Catalyst
  * drops the Exchange on each bucketed side entirely, and `sortBy`
  * additionally pre-orders within buckets so sort-merge joins skip
  * their sort. One shuffle paid once at ingest replaces one shuffle per
  * query forever after.
  *
  * Bucket-count sizing at scale: buckets are per-partition files, so
  * `numBuckets × avg row-group size` should land near the HDFS/S3 block
  * size; too few buckets bounds join parallelism (each bucket is one
  * task), too many fragments the scan. For a 1000-executor cluster on
  * the minute lake, symbol-count ≫ bucket-count keeps buckets balanced
  * because the hash mixes many symbols per bucket.
  */
object BucketedLake {

  /** Write `df` as a bucketed (optionally bucket-sorted) parquet table
    * at an explicit path (external table — the metastore entry carries
    * the bucket spec that later plans consume). */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, numBuckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    val writer = df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) writer.sortBy(sortCols.head, sortCols.tail: _*)
     else writer).saveAsTable(table)
  }
}
