package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.{RestClient, VisionLoader}
import graft.sources.RestClient.{HttpError, RetryingClient, Transport, WeightBudget}

/** S6–S10 semantics from reference `tests/test_vision_loader.py` and
  * `tests/test_rest_client.py`. */
class SourcesSpec extends SparkSpec {

  private def writeZip(dir: String, name: String, csvContent: String): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(s"$dir/$name"))
    zos.putNextEntry(new ZipEntry(name.stripSuffix(".zip") + ".csv"))
    zos.write(csvContent.getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
  }

  test("CSV-in-ZIP kline load: executor-side unzip, rename, window filter (vision_loader.py:28-66,264-312)") {
    val dir = Files.createTempDirectory("vision").toString
    val t0 = ms("2026-01-15T10:00:00Z")
    // 3 rows, one outside the window; 12 declared columns
    val rows = Seq(t0, t0 + 60000, t0 + 120000).zipWithIndex.map { case (t, i) =>
      s"$t,100.$i,101.$i,99.$i,100.5,2.5,${t + 59999},250000.0,20,1.2,120000.0,0"
    }.mkString("\n")
    writeZip(dir, "BTCUSDT-1m-2026-01-15.zip", rows)

    val df = VisionLoader.klinesFromZips(spark, s"$dir/*.zip", t0, t0 + 60000)
    val got = df.orderBy("open_time").collect()
    assert(got.length == 2)
    assert(df.columns.toSeq == Seq("open_time", "open", "high", "low", "close",
      "volume_btc", "volume_usdt", "trade_count", "taker_buy_vol_btc", "taker_buy_vol_usdt"))
    assert(got.head.getDouble(1) == 100.0 && got.head.getDouble(5) == 2.5)
  }

  test("schema tolerance: missing columns become typed NULLs, extras dropped (vision_loader.py:303-310)") {
    val dir = Files.createTempDirectory("vision2").toString
    val t0 = ms("2026-01-15T10:00:00Z")
    // only 5 of 12 kline columns present (plus junk column)
    writeZip(dir, "short.zip", s"$t0,100.0,101.0,99.0,100.5")
    val df = VisionLoader.readZipCsv(spark, s"$dir/*.zip", VisionLoader.klineCsvSchema)
    val r = df.collect().head
    assert(r.getLong(0) == t0 && r.getDouble(1) == 100.0)
    assert(r.isNullAt(df.columns.indexOf("quote_volume")))
    assert(df.columns.length == 12)
  }

  test("retrying client: backoff on 429/5xx, honors Retry-After, rate limit spacing (rest.py:27-148)") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val transport = new Transport {
      def get(path: String, params: Map[String, String]): String = {
        calls += 1
        if (calls == 1) throw HttpError(429, retryAfterSeconds = Some(2))
        else if (calls == 2) throw HttpError(503)
        else "ok"
      }
    }
    var clock = 0L
    val client = new RetryingClient(transport, minIntervalMs = 100,
      sleep = d => { sleeps += d; clock += d }, jitterMs = () => 0,
      now = () => clock)
    assert(client.get("/klines", Map()) == "ok")
    assert(calls == 3)
    assert(sleeps.contains(2000L)) // Retry-After honored
    // 4xx other than 429 is not retried
    val badTransport = new Transport {
      def get(p: String, q: Map[String, String]): String = throw HttpError(400)
    }
    val client2 = new RetryingClient(badTransport, sleep = _ => (), jitterMs = () => 0, now = () => 0)
    assertThrows[HttpError](client2.get("/x", Map()))
  }

  test("weight budget: 2400/min with tier weights (binance_usage.py:18-30)") {
    assert(RestClient.klineRequestWeight(99) == 1)
    assert(RestClient.klineRequestWeight(499) == 2)
    assert(RestClient.klineRequestWeight(1000) == 5)
    assert(RestClient.klineRequestWeight(1500) == 10)
    var t = 0L
    val budget = new WeightBudget(maxPerMinute = 10, now = () => t)
    assert(budget.tryAcquire(6) && budget.tryAcquire(4))
    assert(!budget.tryAcquire(1)) // exhausted
    t += 61000
    assert(budget.tryAcquire(10)) // window reset
  }

  test("pagination advances the cursor and stops on short pages (binance_provider.py:477-651)") {
    // rows every 10 ms in [0, 100]; pages of 4
    val all = (0L to 100L by 10).toSeq
    var fetches = 0
    def fetch(cursor: Long, size: Int): Seq[Long] = {
      fetches += 1
      all.filter(_ >= cursor).take(size)
    }
    val got = RestClient.paginate[Long](5, 95, 4, fetch, identity)
    assert(got == (10L to 90L by 10).toSeq)
    assert(fetches >= 3)
  }

  test("ratio dedup keeps the last row per data_time (binance_provider.py:643-651)") {
    val rows = Seq((100L, "a"), (200L, "b"), (100L, "c"))
    val got = RestClient.dedupByTimeKeepLast[(Long, String)](rows, _._1)
    assert(got == Seq((100L, "c"), (200L, "b")))
  }

  test("parallel fan-out returns all group results (parallel_provider.py:380-466)") {
    val got = RestClient.fanOut(Seq(() => 1, () => 2, () => 3))
    assert(got == Seq(1, 2, 3))
  }
}
