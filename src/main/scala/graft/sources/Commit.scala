package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => NPath, StandardCopyOption}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** The object-store commit seam (SURVEY §4.1, VERDICT r14 #1).
  *
  * Every write-atomicity decision in the engine funnels through the
  * four seams §4.1 names; this trait makes the two that are CODE here
  * (the partition publish and the small-state replace) swappable
  * implementations instead of documentation:
  *
  *  - [[RenameCommit]] — the default: directory-rename publish
  *    (tmp → aside → swap) and `ATOMIC_MOVE` state replace. Correct on
  *    POSIX/HDFS-class filesystems where rename is atomic. Readers
  *    scan the destination directory itself ([[CommitProtocol.resolve]]
  *    is the identity), so this implementation changes NOTHING about
  *    current local behavior.
  *  - [[ManifestCommit]] — the object-store shape: the new partition
  *    version is materialized under a UNIQUE hidden prefix
  *    (`<dest>/.v_<uuid>/`, invisible to any reader until named), and
  *    the commit is ONE small `_MANIFEST` object naming the live
  *    prefix — the single-object PUT that IS atomic on S3-class
  *    stores where directory rename is copy+delete. Readers resolve
  *    the manifest to the live prefix; a crash at ANY point before the
  *    manifest PUT leaves the previous manifest (and therefore the
  *    previous complete version) in force, and a crash after it leaves
  *    the new complete version in force — there is no torn window by
  *    construction. Superseded versions are garbage, GC'd on the next
  *    publish (the immediately previous version is kept one publish as
  *    grace for in-flight readers).
  *
  * The remaining two §4.1 seams are configuration, not code: bulk
  * dynamic-partition writes commit through Hadoop's committer (swap to
  * the S3A magic/manifest committer via conf), and
  * [[MinuteLakeWriter.writeDeltaPatch]] is already append-only-new-
  * objects (object-store-native as written).
  *
  * Pinned by CommitSeamSpec: a write+crash+read matrix over an
  * injected filesystem whose DIRECTORY rename is copy-then-delete with
  * a crash hook ([[graft.sources.NonAtomicRenameFs]] in test scope) —
  * the rename commit is shown torn under it (the motivating witness)
  * and the manifest commit is shown to serve a complete old or new
  * version at every crash point.
  */
trait CommitProtocol {

  /** Publish the freshly-written `tmpDir` as the live content of the
    * partition directory `destDir`, replacing any previous version.
    * `tmpDir` is consumed (moved or renamed away) on success. */
  def publish(fs: FileSystem, tmpDir: String, destDir: String): Unit

  /** The path a reader should scan for `destDir`'s live content;
    * `None` if nothing has been published. [[RenameCommit]] resolves
    * to `destDir` itself, so existing readers need no change;
    * [[ManifestCommit]] resolves through the manifest. */
  def resolve(fs: FileSystem, destDir: String): Option[String]

  /** Atomically replace the contents of a small local state object
    * (watermarks, aggregator checkpoints) — the §4.1 state-plane seam.
    * On an object store this is a conditional PUT of one small object;
    * the stores are single-coordinator so lost-update is not in play,
    * only torn reads, which a whole-object replace precludes. */
  def putState(path: NPath, bytes: Array[Byte]): Unit
}

/** Directory-rename commit — the local/HDFS default; see
  * [[CommitProtocol]]. `publish` is the aside-swap choreography the
  * writer has always used (reference `atomic.py:38-44`): rename the
  * previous partition aside, rename tmp into place, drop the aside.
  * Readers see old or new except during the instant between the two
  * renames; a crash in that window leaves the old data recoverable
  * under the aside path rather than lost. Valid ONLY where rename is
  * atomic — on an object store, deploy [[ManifestCommit]] instead. */
object RenameCommit extends CommitProtocol {

  def publish(fs: FileSystem, tmpDir: String, destDir: String): Unit = {
    val finalPath = new HPath(destDir)
    val aside = new HPath(tmpDir + ".aside")
    fs.mkdirs(finalPath.getParent)
    val hadOld = fs.exists(finalPath)
    if (hadOld && !fs.rename(finalPath, aside))
      throw new RuntimeException(s"aside rename failed for $destDir")
    if (!fs.rename(new HPath(tmpDir), finalPath)) {
      if (hadOld) fs.rename(aside, finalPath) // restore the old partition
      throw new RuntimeException(s"atomic rename failed for $destDir")
    }
    if (hadOld) fs.delete(aside, true)
  }

  def resolve(fs: FileSystem, destDir: String): Option[String] =
    if (fs.exists(new HPath(destDir))) Some(destDir) else None

  def putState(path: NPath, bytes: Array[Byte]): Unit = {
    val tmp = path.resolveSibling(
      s".${path.getFileName}.${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}

/** Manifest-pointer commit — the object-store shape; see
  * [[CommitProtocol]] for the protocol and its crash analysis. */
object ManifestCommit extends CommitProtocol {

  private[sources] val ManifestName = "_MANIFEST"
  private val VersionPrefix = ".v_"

  def publish(fs: FileSystem, tmpDir: String, destDir: String): Unit = {
    val dest = new HPath(destDir)
    fs.mkdirs(dest)
    val previous = readManifest(fs, destDir)
    val versionName = VersionPrefix +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // Materialize the new version under its unique prefix. The rename
    // may be copy+delete (non-atomic) on the deployment FS — harmless:
    // nothing reads a version the manifest does not name. On a real
    // object store this step is simply "the writer wrote its files
    // under the unique prefix in the first place".
    if (!fs.rename(new HPath(tmpDir), new HPath(dest, versionName)))
      throw new RuntimeException(s"version materialization failed for $destDir")
    // THE commit: one small object PUT (atomic on S3-class stores;
    // single-FILE create+close locally). Everything before this line
    // is invisible to readers; everything after it is garbage cleanup.
    val out = fs.create(new HPath(dest, ManifestName), true)
    try out.write(versionName.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // GC superseded versions, keeping the immediately previous one as
    // grace for in-flight readers; older ones (crash leftovers
    // included) go. Failure here is retried by the next publish.
    val keep = Set(versionName) ++ previous
    fs.listStatus(dest).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(VersionPrefix))
      .filterNot(s => keep.contains(s.getPath.getName))
      .foreach(s => fs.delete(s.getPath, true))
  }

  def resolve(fs: FileSystem, destDir: String): Option[String] =
    readManifest(fs, destDir).map(v => s"$destDir/$v")
      .filter(p => fs.exists(new HPath(p)))

  private def readManifest(fs: FileSystem, destDir: String): Option[String] = {
    val mf = new HPath(destDir, ManifestName)
    if (!fs.exists(mf)) None
    else {
      val in = fs.open(mf)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](256)
        var n = in.read(b)
        while (n >= 0) { if (n > 0) buf.write(b, 0, n); n = in.read(b) }
        Some(buf.toString(StandardCharsets.UTF_8)).map(_.trim).filter(_.nonEmpty)
      } finally in.close()
    }
  }

  def putState(path: NPath, bytes: Array[Byte]): Unit =
    // modeled single-object PUT: whole-object replace through a
    // sibling temp (REPLACE_EXISTING move — the local stand-in for a
    // conditional PUT; the coordinator is the only writer by design)
    RenameCommit.putState(path, bytes)
}
