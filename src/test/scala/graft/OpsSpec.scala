package graft

import org.apache.spark.sql.functions._

import graft.ops.{AsOf, Ops}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("dedupKeepLast keeps the greatest order tuple per key") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 3L, 30.0), ("a", 2L, 20.0),
      ("b", 5L, 50.0)).toDF("k", "ord", "v")
    val out = Ops.dedupKeepLast(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(2))).toSeq ==
      Seq(("a", 30.0), ("b", 50.0)))
  }

  test("boundedFfill respects the limit") {
    val df = (1 to 10).map(i => (i, if (i == 1) Some(10.0) else None))
      .toDF("i", "v")
    val out = df.select(col("i"),
      Ops.boundedFfill(col("v"), Seq(col("i")), Some(3)).as("f"))
      .orderBy("i").collect()
    // value at i=1 fills rows 2..4 (3 preceding rows), gone at i=5
    assert(out.map(r => Option(r.get(1))).toSeq ==
      Seq(Some(10.0), Some(10.0), Some(10.0), Some(10.0), None, None, None, None, None, None))
  }

  test("asofJoinBackward: backward-inclusive with tolerance") {
    val left = Seq(ts("2026-01-01T00:00:00Z"), ts("2026-01-01T00:10:00Z"),
      ts("2026-01-01T01:00:00Z")).map(Tuple1(_)).toDF("t")
    val right = Seq((ts("2026-01-01T00:00:00Z"), 1.0),
      (ts("2026-01-01T00:05:00Z"), 2.0)).toDF("rt", "v")
    val out = AsOf.asofJoinBackward(left, right, "t", "rt", Seq("v"),
      toleranceMs = Some(30L * 60 * 1000))
      .orderBy("t").collect()
    // 00:00 → exact match 1.0; 00:10 → 2.0 (5 min old); 01:00 → null (55 min > 30)
    assert(out.map(r => Option(r.get(1))).toSeq == Seq(Some(1.0), Some(2.0), None))
  }

  test("as-of join returns the matched ROW's null, not an older value (join_asof row semantics)") {
    // right rows: 00:00 → 10.0, 00:05 → NULL. Probing at 00:06 matches the
    // 00:05 row; its NULL must come through — backfilling 10.0 from 00:00
    // would pair a value with a freshness check it never saw.
    val left = Seq(Tuple1(ts("2026-01-01T00:06:00Z"))).toDF("t")
    val right = Seq((ts("2026-01-01T00:00:00Z"), Some(10.0)),
      (ts("2026-01-01T00:05:00Z"), Option.empty[Double])).toDF("rt", "v")
    val tol = 30L * 60 * 1000
    val a = AsOf.asofJoinBackward(left, right, "t", "rt", Seq("v"), Some(tol)).collect()
    assert(a.head.isNullAt(1))
    val b = AsOf.asofJoinBackwardBucketed(left, right, "t", "rt", Seq("v"), tol).collect()
    assert(b.head.isNullAt(1))
  }

  test("bucketed as-of join equals the windowed as-of join") {
    val rnd = new scala.util.Random(42)
    val left = (0 until 500).map(i => Tuple1(java.sql.Timestamp.from(
      instant("2026-01-01T00:00:00Z").plusSeconds(i * 61L)))).toDF("t")
    val right = (0 until 80).map { i =>
      (java.sql.Timestamp.from(instant("2026-01-01T00:00:00Z")
        .plusSeconds(rnd.nextInt(500 * 61))), rnd.nextDouble())
    }.toDF("rt", "v")
    val tol = 15L * 60 * 1000
    val a = AsOf.asofJoinBackward(left, right, "t", "rt", Seq("v"), Some(tol))
      .orderBy("t").collect().map(r => (r.getTimestamp(0), Option(r.get(1))))
    val b = AsOf.asofJoinBackwardBucketed(left, right, "t", "rt", Seq("v"), tol)
      .orderBy("t").collect().map(r => (r.getTimestamp(0), Option(r.get(1))))
    assert(a.toSeq == b.toSeq)
  }

  test("sessionId splits on gaps greater than the threshold") {
    val df = Seq(
      ("u", ts("2026-01-01T00:00:00Z")), ("u", ts("2026-01-01T00:10:00Z")),
      ("u", ts("2026-01-01T01:00:00Z")), ("u", ts("2026-01-01T01:05:00Z"))
    ).toDF("u", "t")
    val out = df.withColumn("s", Ops.sessionId(col("t"), Seq(col("t")),
      Seq(col("u")), 30L * 60 * 1000)).orderBy("t").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 0L, 1L, 1L))
  }

  test("AlignSeries modes: exact, max-age, bar-close alignment (alignment.py:37-110)") {
    import graft.ops.AlignSeries
    import graft.ops.AlignSeries.Mode
    val bars = Seq(ts("2026-01-01T00:00:00Z"), ts("2026-01-01T00:05:00Z"),
      ts("2026-01-01T00:10:00Z")).map(Tuple1(_)).toDF("bar_ts")
    val series = Seq((ts("2026-01-01T00:02:00Z"), 1.0),
      (ts("2026-01-01T00:06:00Z"), 2.0)).toDF("sts", "v")

    // exact: series floored to 5m buckets, equi join
    val exact = AlignSeries.align(bars, series, "bar_ts", "sts", Seq("v"),
      Mode.Exact, barMs = 300000L).orderBy("bar_ts").collect()
    assert(exact.map(r => Option(r.get(1))).toSeq == Seq(Some(1.0), Some(2.0), None))

    // max-age 3 minutes: 00:05 sees 00:02 (3 min old, kept); 00:10 sees
    // 00:06 (4 min old, nulled)
    val aged = AlignSeries.align(bars, series, "bar_ts", "sts", Seq("v"),
      Mode.FfillWithMaxAge(3L * 60 * 1000)).orderBy("bar_ts").collect()
    assert(aged.map(r => Option(r.get(1))).toSeq == Seq(None, Some(1.0), None))

    // unbounded as-of at bar close: 00:00 bar aligns at 00:05 → sees 1.0
    val atClose = AlignSeries.align(bars, series, "bar_ts", "sts", Seq("v"),
      Mode.AsofBackward, alignAtBarClose = true, barMs = 300000L)
      .orderBy("bar_ts").collect()
    assert(atClose.map(r => Option(r.get(1))).toSeq == Seq(Some(1.0), Some(2.0), Some(2.0)))
  }

  test("weightedAvgFallback uses weights when present, mean otherwise") {
    val df = Seq((1.0, 100.0), (3.0, 300.0)).toDF("v", "w")
    val got = df.agg(Ops.weightedAvgFallback(col("v"), col("w"))).head.getDouble(0)
    assert(got == 2.5)
    val df0 = Seq((1.0, 0.0), (3.0, 0.0)).toDF("v", "w")
    val got0 = df0.agg(Ops.weightedAvgFallback(col("v"), col("w"))).head.getDouble(0)
    assert(got0 == 2.0)
  }

  test("last/first non-null by ordering key") {
    val df = Seq(
      (1L, Option.empty[Double]), (2L, Some(10.0)), (3L, Option.empty[Double]),
      (4L, Some(11.0)), (5L, Option.empty[Double])).toDF("t", "v")
    val r = df.agg(
      Ops.lastNonNullByOrd(col("v"), col("t")).as("l"),
      Ops.firstNonNullByOrd(col("v"), col("t")).as("f")).head
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 10.0)
  }

  test("saltedJoin equals the plain join and spreads a hot key across salts") {
    // 1000 rows of ONE hot key + a few cold ones, joined to a small dim
    val large = ((1 to 1000).map(i => ("HOT", i.toLong)) ++
      Seq(("c1", 2000L), ("c2", 3000L))).toDF("k", "id")
    val small = Seq(("HOT", 10.0), ("c1", 20.0), ("c3", 99.0)).toDF("k", "w")
    val salted = Ops.saltedJoin(large, small, Seq("k"), col("id"), saltBuckets = 8)
    val plain = large.join(small, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.agg(sum(col("w"))).head.getDouble(0) ==
      plain.agg(sum(col("w"))).head.getDouble(0))
    // the hot key's rows really are spread over multiple salt values
    val saltSpread = large.where(col("k") === "HOT")
      .select(pmod(hash(col("id")), lit(8)).as("s"))
      .distinct().count()
    assert(saltSpread > 4)
    // left join keeps unmatched large rows exactly once
    val left = Ops.saltedJoin(large, small, Seq("k"), col("id"),
      saltBuckets = 8, joinType = "left")
    assert(left.count() == large.count())
    assert(left.where(col("k") === "c2").head.isNullAt(
      left.columns.indexOf("w")))
  }

  test("capBucketOccupancy splits hot buckets out and accounts for every drop") {
    // bucket "hot" holds 5 rows, "warm" 3, "cold" 1 — cap at 3
    val df = (Seq.fill(5)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .zipWithIndex.map { case (b, i) => (b, i.toLong) }.toDF("bucket", "id")
    val (kept, dropped) = Ops.capBucketOccupancy(df, Seq("bucket"), cap = 3)
    assert(kept.select("bucket").distinct().collect().map(_.getString(0)).toSet ==
      Set("warm", "cold"))
    assert(kept.count() == 4) // every row of every surviving bucket
    val d = dropped.collect()
    assert(d.length == 1 && d.head.getString(0) == "hot" && d.head.getLong(1) == 5)
    // kept + dropped account for the full input — nothing silently lost
    assert(kept.count() + d.map(_.getLong(1)).sum == df.count())
    // cap >= max occupancy: pass-through, empty drop accounting
    val (all, none) = Ops.capBucketOccupancy(df, Seq("bucket"), cap = 5)
    assert(all.count() == df.count() && none.isEmpty)
  }
}
