package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{Multimodal, TextFns}

/** Property-based coverage for the byte-level parsers and native kernels
  * — randomized inputs catch the edge the fixed cases didn't think of.
  * Scalacheck drives pure-JVM properties directly; for the Spark kernels
  * it GENERATES one randomized batch that runs as a single job (per-case
  * Spark roundtrips would be two orders of magnitude slower). */
class KernelPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, cases: Int = 200): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(r.passed, s"$name failed: ${r.status}")
  }

  test("decodeHeader roundtrips every synthesizable header (randomized dims)") {
    val u16 = Gen.chooseNum(1, 65535)
    check("png", Prop.forAll(Gen.chooseNum(1, 1 << 24), Gen.chooseNum(1, 1 << 24)) {
      (w: Int, h: Int) =>
        Multimodal.decodeHeader(Multimodal.Synth.png(w, h)).contains((w, h, "png"))
    })
    check("gif", Prop.forAll(u16, u16) { (w: Int, h: Int) =>
      Multimodal.decodeHeader(Multimodal.Synth.gif(w, h)).contains((w, h, "gif"))
    })
    check("jpeg", Prop.forAll(u16, u16, Gen.oneOf(true, false)) {
      (w: Int, h: Int, prog: Boolean) =>
        Multimodal.decodeHeader(Multimodal.Synth.jpeg(w, h, prog))
          .contains((w, h, "jpeg"))
    })
  }

  test("decodeHeader is total on arbitrary bytes (never throws, never misreads)") {
    // fuzz: random byte soup must parse to None or a well-formed triple —
    // and arbitrary TRUNCATIONS of valid headers must not throw either
    val bytes = Gen.containerOf[Array, Byte](Gen.choose(-128, 127).map(_.toByte))
    check("fuzz", Prop.forAll(bytes) { (b: Array[Byte]) =>
      Multimodal.decodeHeader(b) match {
        case Some((w, h, f)) => Seq("png", "gif", "jpeg").contains(f) && w >= 0 && h >= 0
        case None => true
      }
    }, cases = 500)
    val u16 = Gen.chooseNum(1, 65535)
    check("truncation", Prop.forAll(u16, u16, Gen.chooseNum(0, 44)) {
      (w: Int, h: Int, cut: Int) =>
        val full = Multimodal.Synth.png(w, h)
        Multimodal.decodeHeader(full.take(math.min(cut, full.length))) match {
          case Some(t) => t == ((w, h, "png")) // enough bytes survived
          case None => true
        }
    })
  }

  test("native simhash/minhash kernels match HOF forms on a randomized batch") {
    // one Spark job over 300 scalacheck-generated hash arrays (incl.
    // nulls, empties, negatives, full-u32 values)
    val elem: Gen[Option[Long]] = Gen.frequency(
      8 -> Gen.chooseNum(0L, (1L << 32) - 1).map(Option(_)),
      1 -> Gen.const(Option.empty[Long]),
      1 -> Gen.chooseNum(-100L, 100L).map(Option(_)))
    val arr: Gen[Option[Seq[Option[Long]]]] = Gen.frequency(
      9 -> Gen.listOfN(20, elem).map(l => Some(l: Seq[Option[Long]])),
      1 -> Gen.oneOf(Some(Seq.empty[Option[Long]]), Option.empty[Seq[Option[Long]]]))
    val seed = org.scalacheck.rng.Seed(20260813L)
    val cases = Gen.listOfN(300, arr).pureApply(Gen.Parameters.default, seed)
    val df = cases.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "hs")
    val rows = df.select(col("id"),
      expr("graft_simhash32(hs)").as("sim_native"),
      TextFns.simhash32FromHashes("hs").as("sim_hof"),
      TextFns.minhashSignature("hs", 16).as("mh_native"),
      TextFns.minhashSignatureHof("hs", 16).as("mh_hof")).collect()
    assert(rows.length == 300)
    for (r <- rows) {
      assert(r.getLong(1) == r.getLong(2), s"simhash mismatch id ${r.getLong(0)}")
      assert(r.getSeq[Any](3) == r.getSeq[Any](4), s"minhash mismatch id ${r.getLong(0)}")
    }
  }

  test("native hyperplane-bucket kernel matches the HOF form on a randomized batch") {
    import graft.functions.VectorFns
    // scalacheck vectors incl. null elements, NaN, wrong lengths, empty
    // and null arrays — every shape the HOF null/NaN semantics covers
    val fElem: Gen[Option[Float]] = Gen.frequency(
      12 -> Gen.chooseNum(-1.0f, 1.0f).map(Option(_)),
      1 -> Gen.const(Option.empty[Float]),
      1 -> Gen.const(Option(Float.NaN)))
    val vec: Gen[Option[Seq[Option[Float]]]] = Gen.frequency(
      8 -> Gen.listOfN(12, fElem).map(l => Some(l: Seq[Option[Float]])),
      1 -> Gen.listOfN(5, fElem).map(l => Some(l: Seq[Option[Float]])),
      1 -> Gen.oneOf(Some(Seq.empty[Option[Float]]), Option.empty[Seq[Option[Float]]]))
    val seed = org.scalacheck.rng.Seed(20260813L)
    val cases = Gen.listOfN(300, vec).pureApply(Gen.Parameters.default, seed)
    val df = cases.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "emb")
    def run(f: (org.apache.spark.sql.DataFrame, String, String, Int, Int, Int) => org.apache.spark.sql.DataFrame) =
      f(df, "emb", "bucket", 12, 8, 7).select("id", "bucket").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = run(VectorFns.withHyperplaneBucket)
    val hof = run(VectorFns.withHyperplaneBucketHof)
    assert(native.size == 300 && native == hof)
  }

  test("native shingle-hash kernel matches the md5 SQL form on a randomized batch") {
    import graft.functions.TextFns
    // token arrays with multi-byte unicode, empty strings, null
    // elements, short/empty/null arrays — the joined-bytes + top-60-bit
    // rule must match conv(substr(md5(concat_ws(' ', ...)),1,15),16,10)
    // byte for byte, incl. concat_ws's null-skip
    val tok: Gen[Option[String]] = Gen.frequency(
      8 -> Gen.nonEmptyListOf(Gen.frequency(
        6 -> Gen.alphaNumChar.map(_.toString),
        1 -> Gen.oneOf("é", "ß", "中", "🦀", "Ж"),
        1 -> Gen.oneOf("-", "_", "."))).map(_.mkString),
      1 -> Gen.const(""),
      1 -> Gen.const(null: String)).map(Option(_).filter(_ != null))
    val arr: Gen[Option[Seq[Option[String]]]] = Gen.frequency(
      7 -> Gen.chooseNum(3, 12).flatMap(k => Gen.listOfN(k, tok))
        .map(l => Some(l: Seq[Option[String]])),
      1 -> Gen.listOfN(2, tok).map(l => Some(l: Seq[Option[String]])),
      1 -> Gen.oneOf(Some(Seq.empty[Option[String]]), Option.empty[Seq[Option[String]]]))
    val seed = org.scalacheck.rng.Seed(20260813L)
    val cases = Gen.listOfN(300, arr).pureApply(Gen.Parameters.default, seed)
    val df = cases.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "toks")
    val rows = df.select(col("id"),
      expr("graft_shingle_hash(toks, 3)").as("native"),
      TextFns.shingleHashesFromTokens("toks", 3).as("hof"),
      expr("graft_token_hash32(toks)").as("th_native"),
      TextFns.tokenHashes32("toks").as("th_hof")).collect()
    assert(rows.length == 300)
    for (r <- rows) {
      assert(!r.isNullAt(1) && !r.isNullAt(2),
        s"shingle arrays must be non-null (id ${r.getLong(0)})")
      assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"shingle hash mismatch id ${r.getLong(0)}")
      // token-hash kernel: null array -> null, null token -> null
      // element, values = md5's first 8 hex digits — same rows exercise
      // the same unicode/null edges
      assert(r.isNullAt(3) == r.isNullAt(4),
        s"token hash nullability mismatch id ${r.getLong(0)}")
      if (!r.isNullAt(3))
        assert(r.getSeq[Any](3) == r.getSeq[Any](4),
          s"token hash mismatch id ${r.getLong(0)}")
    }
  }

  test("native sq8 pack/dot kernels match the HOF integer dot on a randomized batch") {
    // scalacheck code vectors in and OUTSIDE the quantizer's 0..255
    // domain (the pack wraps mod 256 like CAST AS BYTE; pairs whose
    // codes stay in-domain must match the HOF dot bit-for-bit), plus
    // null elements, empties, nulls, and length mismatches
    val inDomain: Gen[Option[Long]] = Gen.frequency(
      10 -> Gen.chooseNum(0L, 255L).map(Option(_)),
      1 -> Gen.const(Option.empty[Long]))
    val vec: Gen[Option[Seq[Option[Long]]]] = Gen.frequency(
      8 -> Gen.listOfN(16, inDomain).map(l => Some(l: Seq[Option[Long]])),
      1 -> Gen.listOfN(9, inDomain).map(l => Some(l: Seq[Option[Long]])),
      1 -> Gen.oneOf(Some(Seq.empty[Option[Long]]), Option.empty[Seq[Option[Long]]]))
    val seed = org.scalacheck.rng.Seed(20260813L)
    val cases = Gen.listOfN(300, Gen.zip(vec, vec))
      .pureApply(Gen.Parameters.default, seed)
    val df = cases.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "ca", "cb")
    val rows = df.select(col("id"),
      expr("graft_sq8_dot(graft_sq8_pack(ca), graft_sq8_pack(cb))").as("native"),
      expr("aggregate(zip_with(ca, cb, (a, b) -> a * b), 0L, (acc, x) -> acc + x)").as("hof"))
      .collect()
    assert(rows.length == 300)
    for (r <- rows) {
      val native = if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))
      val hof = if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2))
      assert(native == hof, s"sq8 dot mismatch id ${r.getLong(0)}: $native vs $hof")
    }
  }
}
