package graft.sources

import java.nio.file.{Files, Path}
import java.time.{Instant, LocalDate}

/** Transport abstraction over the Vision HTTP client (reference
  * `sources/vision.py:52-112`): existence probe + streaming ZIP
  * download. Injected so specs (and offline runs) substitute fakes —
  * the cache layer below never talks HTTP itself.
  */
trait VisionTransport {

  /** HEAD-style existence probe (`vision.py:87-94`). */
  def exists(url: String): Boolean

  /** Download the ZIP at `url` to `destination` (parent dirs are created
    * by the caller). Must throw on failure (`vision.py:96-104`). */
  def downloadZip(url: String, destination: Path): Unit
}

/** Vision daily-ZIP disk cache with negative `.missing` TTL markers
  * (reference `sources/vision_loader.py:221-346` + URL/filename
  * conventions `sources/vision.py:23-115`).
  *
  * Layout: `cacheDir/<stream>/<SYMBOL>/<SYMBOL>-<stream>-<date>.zip`,
  * with a sibling `<name>.zip.missing` marker when the remote object was
  * probed and absent. A fresh marker (age ≤ TTL) suppresses re-probing;
  * an expired one is cleared and the object is probed again. Markers are
  * deliberately preserved by [[deleteCachedFiles]] so repeated cache
  * evictions don't turn into repeated remote misses.
  *
  * This is driver-side client code out of Spark's data plane — the
  * fetched ZIPs are then read distributedly via
  * [[VisionLoader.readZipCsv]] over a glob of the cache directory.
  */
final class VisionCache(transport: VisionTransport, cacheDir: Path,
                        baseUrl: String,
                        missingCacheTtlSeconds: Long = 1800L,
                        now: () => Instant = () => Instant.now) {

  import VisionCache._

  /** Expected daily filename for a stream (`vision.py:60-62`). */
  def expectedFilename(stream: String, symbol: String, tradeDate: LocalDate,
                       interval: String = "1m"): String =
    filePattern(stream)
      .replace("{symbol}", symbol.toUpperCase)
      .replace("{interval}", interval)
      .replace("{date}", tradeDate.toString)

  /** Full remote URL of a daily ZIP (`vision.py:64-68`). */
  def buildDailyZipUrl(stream: String, symbol: String, tradeDate: LocalDate,
                       interval: String = "1m"): String = {
    val folder = folderPattern(stream)
      .replace("{symbol}", symbol.toUpperCase)
      .replace("{interval}", interval)
    s"${baseUrl.stripSuffix("/")}/$folder" +
      expectedFilename(stream, symbol, tradeDate, interval)
  }

  /** Local cache path of a daily ZIP (`vision_loader.py:314-321`). */
  def cachePath(stream: String, symbol: String, tradeDate: LocalDate,
                interval: String = "1m"): Path =
    cacheDir.resolve(stream).resolve(symbol.toUpperCase)
      .resolve(expectedFilename(stream, symbol, tradeDate, interval))

  /** Ensure one daily ZIP is cached locally
    * (`vision_loader.py:264-293`): returns the local path when the ZIP
    * is (now) present, `None` when the remote object does not exist —
    * in which case a `.missing` marker with TTL suppresses re-probing
    * until it expires. */
  def fetchDailyZip(stream: String, symbol: String, tradeDate: LocalDate,
                    interval: String = "1m"): Option[Path] = {
    val zipPath = cachePath(stream, symbol, tradeDate, interval)
    val marker = missingMarkerPath(zipPath)
    if (Files.exists(zipPath)) {
      // a present ZIP invalidates any stale negative marker
      clearMissingMarker(marker)
      return Some(zipPath)
    }
    if (missingMarkerIsFresh(marker)) return None
    val url = buildDailyZipUrl(stream, symbol, tradeDate, interval)
    if (!transport.exists(url)) {
      writeMissingMarker(marker)
      return None
    }
    Files.createDirectories(zipPath.getParent)
    transport.downloadZip(url, zipPath)
    Some(zipPath)
  }

  /** Cache every day in [start, end] for the streams; returns the local
    * paths that exist (remote-missing days are skipped, not errors). */
  def fetchWindow(symbol: String, start: LocalDate, end: LocalDate,
                  streams: Seq[String], interval: String = "1m"): Seq[Path] =
    for {
      stream <- streams
      day <- daysInWindow(start, end)
      streamInterval = if (requiresInterval(stream)) interval else "1m"
      path <- fetchDailyZip(stream, symbol, day, streamInterval)
    } yield path

  /** Delete cached ZIPs for a materialized window
    * (`vision_loader.py:221-243`). `.missing` markers are intentionally
    * preserved — they are small and keep repeated API misses from
    * probing the remote too aggressively. Returns ZIPs removed. */
  def deleteCachedFiles(symbol: String, start: LocalDate, end: LocalDate,
                        streams: Seq[String], interval: String = "1m"): Int = {
    var removed = 0
    for (stream <- streams; day <- daysInWindow(start, end)) {
      val streamInterval = if (requiresInterval(stream)) interval else "1m"
      val path = cachePath(stream, symbol, day, streamInterval)
      if (Files.exists(path) && path.getFileName.toString.endsWith(".zip")) {
        Files.delete(path)
        removed += 1
      }
    }
    removed
  }

  private def missingMarkerPath(zipPath: Path): Path =
    zipPath.resolveSibling(zipPath.getFileName.toString + ".missing")

  /** Fresh = marker exists and its mtime is within the TTL
    * (`vision_loader.py:326-334`); an expired marker is cleared so the
    * next probe goes remote. TTL < 1 disables negative caching. */
  private def missingMarkerIsFresh(marker: Path): Boolean = {
    if (missingCacheTtlSeconds < 1 || !Files.exists(marker)) return false
    val ageSeconds =
      (now().toEpochMilli - Files.getLastModifiedTime(marker).toMillis) / 1000
    if (ageSeconds <= missingCacheTtlSeconds) true
    else { clearMissingMarker(marker); false }
  }

  private def writeMissingMarker(marker: Path): Unit = {
    Files.createDirectories(marker.getParent)
    Files.write(marker, Array.empty[Byte])
    // stamp mtime from the injected clock so TTL math is consistent
    // with `now()` (identical to the wall clock in production)
    Files.setLastModifiedTime(marker,
      java.nio.file.attribute.FileTime.from(now()))
  }

  private def clearMissingMarker(marker: Path): Unit =
    Files.deleteIfExists(marker)
}

object VisionCache {

  /** Stream → (folder pattern, file pattern) (`vision.py:30-49`). */
  private val streamPatterns: Map[String, (String, String)] = Map(
    "klines" -> ("klines/{symbol}/{interval}/", "{symbol}-{interval}-{date}.zip"),
    "aggTrades" -> ("aggTrades/{symbol}/", "{symbol}-aggTrades-{date}.zip"),
    "bookTicker" -> ("bookTicker/{symbol}/", "{symbol}-bookTicker-{date}.zip"),
    "bookDepth" -> ("bookDepth/{symbol}/", "{symbol}-bookDepth-{date}.zip"),
    "markPriceKlines" -> ("markPriceKlines/{symbol}/{interval}/",
      "{symbol}-markPriceKlines-{interval}-{date}.zip"),
    "indexPriceKlines" -> ("indexPriceKlines/{symbol}/{interval}/",
      "{symbol}-indexPriceKlines-{interval}-{date}.zip"),
    "premiumIndexKlines" -> ("premiumIndexKlines/{symbol}/{interval}/",
      "{symbol}-premiumIndexKlines-{interval}-{date}.zip"),
    "metrics" -> ("metrics/{symbol}/", "{symbol}-metrics-{date}.zip"),
    "trades" -> ("trades/{symbol}/", "{symbol}-trades-{date}.zip"))

  /** Streams whose layout embeds the kline interval (`vision.py:23-28`). */
  private val intervalStreams: Set[String] =
    Set("klines", "markPriceKlines", "indexPriceKlines", "premiumIndexKlines")

  def requiresInterval(stream: String): Boolean = intervalStreams(stream)

  def supportedStreams: Seq[String] = streamPatterns.keys.toSeq.sorted

  private def lookup(stream: String): (String, String) =
    streamPatterns.getOrElse(stream,
      throw new IllegalArgumentException(
        s"Unsupported Vision stream '$stream'. Supported: " +
          supportedStreams.mkString(", ")))

  private def folderPattern(stream: String): String = lookup(stream)._1
  private def filePattern(stream: String): String = lookup(stream)._2

  private def daysInWindow(start: LocalDate, end: LocalDate): Seq[LocalDate] =
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end)).toSeq
}
