package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.MinuteBuilder
import graft.sources._

/** The object-store commit seam, pinned executable (VERDICT r14 #1):
  * a write+crash+read matrix over [[NonAtomicRenameFs]] — directory
  * rename is copy-then-delete with a crash hook, single-object PUT is
  * atomic — showing
  *
  *  1. the motivating tear: [[RenameCommit]] crashed mid-promote on
  *     the non-atomic FS exposes a PARTIAL partition to readers;
  *  2. [[ManifestCommit]] under the SAME crashes serves a complete old
  *     or complete new version at every crash point — never a subset —
  *     and a retried publish completes the swap;
  *  3. both implementations behind the one writer: writeHourPartition
  *     create+merge roundtrips unchanged through [[ManifestCommit]];
  *  4. the state-plane seam: WatermarkStore setAll/read through both.
  */
class CommitSeamSpec extends SparkSpec {
  import spark.implicits._

  private def crashyFs(): NonAtomicRenameFs = {
    val fs = new NonAtomicRenameFs
    fs.initialize(java.net.URI.create("file:///"), spark.sparkContext.hadoopConfiguration)
    fs
  }

  private def localFs(): FileSystem =
    FileSystem.get(java.net.URI.create("file:///"), spark.sparkContext.hadoopConfiguration)

  /** Stage a 2-part parquet version into a fresh tmp dir. */
  private def stage(root: String, values: Seq[Int]): String = {
    val tmp = s"$root/.tmp/${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // range partitioning: deterministic row→part placement, so crash
    // points map to stable observed subsets
    values.toDF("v").repartitionByRange(2, col("v")).write.parquet(tmp)
    tmp
  }

  private def readVia(c: CommitProtocol, fs: FileSystem, dest: String): Option[Seq[Int]] =
    c.resolve(fs, dest).map { d =>
      spark.read.parquet(d).select("v").collect().map(_.getInt(0)).toSeq.sorted
    }

  test("rename commit roundtrips create + replace on an atomic-rename FS") {
    val root = Files.createTempDirectory("graft-seam").toString
    val fs = localFs()
    val dest = s"$root/data/part=a"
    RenameCommit.publish(fs, stage(root, Seq(1, 2, 3)), dest)
    assert(readVia(RenameCommit, fs, dest).contains(Seq(1, 2, 3)))
    RenameCommit.publish(fs, stage(root, Seq(7, 8)), dest)
    assert(readVia(RenameCommit, fs, dest).contains(Seq(7, 8)))
    // no aside/tmp leftovers after a clean replace
    assert(!fs.listStatus(new HPath(s"$root/.tmp")).exists(_.getPath.getName.endsWith(".aside")))
  }

  /** Physical file count as the COPY LOOP sees it — through the raw
    * FS, which lists the `.crc` siblings LocalFileSystem hides. */
  private def rawFiles(fs: FileSystem, dir: String): Int =
    fs.listStatus(new HPath(dir)).count(_.isFile)

  test("motivating tear: rename commit on a non-atomic FS exposes a partial partition") {
    val root = Files.createTempDirectory("graft-seam").toString
    val dest = s"$root/data/part=a"
    RenameCommit.publish(localFs(), stage(root, Seq(1, 2, 3)), dest)

    val fs = crashyFs()
    val v1Raw = rawFiles(fs, dest)
    val tmp2 = stage(root, Seq(7, 8))
    val v2Raw = rawFiles(fs, tmp2)
    // the aside rename copies all of v1 (v1Raw files); crash mid-promote
    // with all of v2 EXCEPT its lexicographically-last file — a data
    // part — already landed in dest
    intercept[InjectedCrash] {
      RenameCommit.publish(fs.armed(afterCopies = v1Raw + v2Raw - 1), tmp2, dest)
    }
    val seen = readVia(RenameCommit, localFs(), dest)
    assert(seen.isDefined, "dest exists — and is torn")
    val rows = seen.get
    assert(rows != Seq(1, 2, 3) && rows != Seq(7, 8) &&
      rows.toSet.subsetOf(Set(7, 8)),
      s"reader observed a strict subset of v2: $rows — the tear ManifestCommit closes")
  }

  test("manifest commit: complete old or complete new at EVERY crash point, then retry completes") {
    val root = Files.createTempDirectory("graft-seam").toString
    val dest = s"$root/data/part=a"
    val fsClean = crashyFs()
    ManifestCommit.publish(fsClean, stage(root, Seq(1, 2, 3)), dest)
    assert(readVia(ManifestCommit, fsClean, dest).contains(Seq(1, 2, 3)))

    val v2 = Seq(7, 8)
    val nFiles = {
      val t = stage(root, v2)
      val n = rawFiles(fsClean, t)
      localFs().delete(new HPath(t), true)
      n
    }
    // crash during every prefix of the version-dir materialization,
    // plus the copied-but-not-deleted window
    (0 until nFiles).foreach { k =>
      val fs = crashyFs().armed(afterCopies = k)
      intercept[InjectedCrash] { ManifestCommit.publish(fs, stage(root, v2), dest) }
      assert(readVia(ManifestCommit, localFs(), dest).contains(Seq(1, 2, 3)),
        s"crash after $k copies must leave v1 in force")
    }
    locally {
      val fs = crashyFs().armed(beforeDelete = true)
      intercept[InjectedCrash] { ManifestCommit.publish(fs, stage(root, v2), dest) }
      assert(readVia(ManifestCommit, localFs(), dest).contains(Seq(1, 2, 3)),
        "crash before tmp delete: manifest not yet swapped, v1 in force")
    }
    // retried publish completes; crash-leftover version dirs are GC'd
    // down to live + one-grace
    ManifestCommit.publish(crashyFs(), stage(root, v2), dest)
    assert(readVia(ManifestCommit, localFs(), dest).contains(Seq(7, 8)))
    ManifestCommit.publish(crashyFs(), stage(root, Seq(9)), dest)
    assert(readVia(ManifestCommit, localFs(), dest).contains(Seq(9)))
    def versions = localFs().listStatus(new HPath(dest))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".v_"))
    assert(versions.length <= 2, s"GC keeps live + grace only, saw ${versions.length}")

    // crash AFTER the manifest PUT (commit done, GC lost): readers are
    // already on the new version — stale version dirs are garbage the
    // NEXT publish sweeps, still keeping live + grace
    localFs().mkdirs(new HPath(dest, ".v_deadbeefcrashleftover1"))
    localFs().mkdirs(new HPath(dest, ".v_deadbeefcrashleftover2"))
    assert(readVia(ManifestCommit, localFs(), dest).contains(Seq(9)),
      "stale versions are invisible to readers")
    ManifestCommit.publish(crashyFs(), stage(root, Seq(4, 5)), dest)
    assert(readVia(ManifestCommit, localFs(), dest).contains(Seq(4, 5)))
    assert(versions.length <= 2 &&
      !versions.exists(_.getPath.getName.contains("deadbeef")),
      "post-PUT crash leftovers swept by the next publish")
  }

  private def canonical(tsIso: String, open: Double): DataFrame =
    MinuteBuilder.finalizeSchema(
      Seq((ts(tsIso), open, open + 1.0, open - 1.0, open + 0.5,
        1.2, 120000.0, 10L, open + 0.1, open + 0.4, open, open + 0.2))
        .toDF("timestamp", "open", "high", "low", "close", "volume_btc",
          "volume_usdt", "trade_count", "mark_price_open", "mark_price_close",
          "index_price_open", "index_price_close"))

  test("writeHourPartition create + merge roundtrips through ManifestCommit") {
    val dir = Files.createTempDirectory("graft-seam-lake").toString
    val writer = new MinuteLakeWriter(dir, new PartitionLedger(s"$dir/_state"),
      LakeLayout.HourlySymbol, ManifestCommit)
    val fs = localFs()
    val hour = instant("2024-03-01T10:00:00Z")
    val p1 = writer.writeHourPartition("BTCUSDT", hour, canonical("2024-03-01T10:00:00Z", 100.0))
    // second write into the SAME partition must merge with the
    // manifest-resolved existing version (last-wins on timestamp)
    writer.writeHourPartition("BTCUSDT", hour,
      canonical("2024-03-01T10:00:00Z", 200.0)
        .unionByName(canonical("2024-03-01T10:01:00Z", 101.0)))
    val live = writer.resolvePartitionDir(fs, p1)
    assert(live.isDefined && live.get != p1, "reader path goes through the manifest")
    val rows = spark.read.parquet(live.get)
      .select("timestamp", "open").collect()
      .map(r => (r.getTimestamp(0).toInstant.toString, r.getDouble(1))).sorted
    assert(rows.toSeq == Seq(("2024-03-01T10:00:00Z", 200.0), ("2024-03-01T10:01:00Z", 101.0)))
  }

  test("state-plane seam: WatermarkStore roundtrips through both committers") {
    Seq(RenameCommit: CommitProtocol, ManifestCommit).foreach { c =>
      val dir = Files.createTempDirectory("graft-seam-state").toString
      val store = new WatermarkStore(dir, c)
      store.setAll(Map("BTCUSDT" -> instant("2024-03-01T10:59:00Z")))
      store.setAll(Map("ETHUSDT" -> instant("2024-03-01T11:30:00Z"),
        "BTCUSDT" -> instant("2024-03-01T11:59:00Z")))
      assert(store.get("BTCUSDT").contains(instant("2024-03-01T11:59:00Z")))
      assert(store.get("ETHUSDT").contains(instant("2024-03-01T11:30:00Z")))
    }
  }
}
