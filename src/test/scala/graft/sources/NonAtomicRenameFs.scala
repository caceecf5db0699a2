package graft.sources

import org.apache.hadoop.fs.{FileUtil, Path => HPath, RawLocalFileSystem}

/** Injected-fault filesystem modeling an S3-class object store's rename
  * semantics over local disk (CommitSeamSpec's substrate):
  *
  *  - DIRECTORY rename = copy-file-by-file-then-delete (what S3
  *    "rename" actually is), with a crash hook after N copied files
  *    and before the source delete — every window of the non-atomic
  *    rename is reachable;
  *  - single-FILE rename and `create`+close stay atomic (a single
  *    small-object PUT is atomic on real object stores — the property
  *    [[ManifestCommit]]'s pointer swap relies on).
  *
  * Copy order is lexicographic so crash points are deterministic.
  */
final class InjectedCrash extends RuntimeException("injected crash")

class NonAtomicRenameFs extends RawLocalFileSystem {

  /** Crash when about to copy file number (crashAfterCopies + 1);
    * −1 = never. The counter spans renames, so a multi-rename publish
    * (aside + promote) can be crashed in its second rename. */
  var crashAfterCopies: Int = -1

  /** Crash after the copy phase completes, before the source delete. */
  var crashBeforeDelete: Boolean = false

  /** Crash mid-`create` of any path whose name contains this substring,
    * leaving a zero-length artifact behind — models a writer dying
    * between open/truncate and close (the torn-small-object window an
    * in-place overwrite would expose on the LIVE object). */
  var crashOnCreateContaining: Option[String] = None

  /** Crash BEFORE a single-FILE rename whose source name contains this
    * substring — models a writer dying between staging a small object
    * and naming it (the staged temp is complete but never lands). */
  var crashOnFileRenameContaining: Option[String] = None

  private var copies = 0

  def armed(afterCopies: Int = -1, beforeDelete: Boolean = false,
            onCreateContaining: Option[String] = None,
            onFileRenameContaining: Option[String] = None): this.type = {
    crashAfterCopies = afterCopies
    crashBeforeDelete = beforeDelete
    crashOnCreateContaining = onCreateContaining
    crashOnFileRenameContaining = onFileRenameContaining
    copies = 0
    this
  }

  def copiedSoFar: Int = copies

  override def create(f: HPath, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    crashOnCreateContaining.filter(f.getName.contains).foreach { _ =>
      super.create(f, overwrite, bufferSize, replication, blockSize, progress)
        .close() // the zero-length torn artifact
      throw new InjectedCrash
    }
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def create(f: HPath,
                      permission: org.apache.hadoop.fs.permission.FsPermission,
                      overwrite: Boolean, bufferSize: Int, replication: Short,
                      blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    crashOnCreateContaining.filter(f.getName.contains).foreach { _ =>
      super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress).close() // the zero-length torn artifact
      throw new InjectedCrash
    }
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  override def rename(src: HPath, dst: HPath): Boolean = {
    if (getFileStatus(src).isFile) {
      crashOnFileRenameContaining.filter(src.getName.contains)
        .foreach(_ => throw new InjectedCrash)
      return super.rename(src, dst)
    }
    copyTree(src, dst)
    if (crashBeforeDelete) throw new InjectedCrash
    delete(src, true)
    true
  }

  private def copyTree(src: HPath, dst: HPath): Unit = {
    mkdirs(dst)
    listStatus(src).sortBy(_.getPath.getName).foreach { s =>
      val target = new HPath(dst, s.getPath.getName)
      if (s.isDirectory) copyTree(s.getPath, target)
      else {
        if (crashAfterCopies >= 0 && copies >= crashAfterCopies)
          throw new InjectedCrash
        FileUtil.copy(this, s.getPath, this, target, false, getConf)
        copies += 1
      }
    }
  }
}
