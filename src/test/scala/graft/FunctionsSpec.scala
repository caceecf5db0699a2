package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{DotProduct, SimHash32, TextFns, VectorFns}

/** TextFns / VectorFns unit coverage. The one-shot `...FromText` forms
  * exist for plan quality (token array bound to a lambda variable so
  * pushed-down predicate copies don't re-tokenize — see TextFns docs);
  * these tests pin them to the staged column-by-column forms so the
  * optimization can never drift semantically. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "  leading  and   trailing   whitespace  runs  "),
    (3L, "two tokens"),
    (4L, "one"),
    (5L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (6L, "a b c a b c a b c") // repeated shingles collapse (distinct sets)
  ).toDF("doc_id", "text")

  test("shingleHashesFromText equals tokens -> shingleHashesFromTokens") {
    val staged = docs.withColumn("toks", TextFns.tokens(col("text")))
      .select(col("doc_id"), TextFns.shingleHashesFromTokens("toks", 3).as("sh"))
    val oneShot = docs.select(col("doc_id"),
      TextFns.shingleHashesFromText("text", 3).as("sh"))
    assert(oneShot.collect().toSeq.sortBy(_.getLong(0)) ===
      staged.collect().toSeq.sortBy(_.getLong(0)))
  }

  test("short docs produce empty shingle sets, not descending sequences") {
    val r = docs.where(col("doc_id").isin(3L, 4L))
      .select(TextFns.shingleHashesFromText("text", 3))
      .collect().map(_.getSeq[Long](0))
    assert(r.forall(_.isEmpty))
  }

  test("non-distinct ngrams keep repeats, guard short docs, and match rolling prefixes") {
    val withToks = docs.withColumn("toks", TextFns.tokens(col("text")))
    // repeats preserved (6 has "a b" three times; distinct shingles collapse)
    val rep = withToks.where(col("doc_id") === 6L)
      .select(TextFns.ngramsFromTokens("toks", 2)).head().getSeq[String](0)
    assert(rep.count(_ == "a b") == 3)
    assert(withToks.where(col("doc_id") === 6L)
      .select(TextFns.shinglesFromTokens("toks", 2)).head().getSeq[String](0)
      .count(_ == "a b") == 1)
    // size < n guard: empty, not a descending sequence
    assert(withToks.where(col("doc_id") === 4L)
      .select(TextFns.ngramsFromTokens("toks", 2)).head().getSeq[String](0).isEmpty)
    // prefix-rolling fingerprint over n >= len equals the full fingerprint
    val full = docs.select(TextFns.rollingFingerprint("text")).collect().map(_.getLong(0))
    val pfx = docs.select(TextFns.rollingFingerprintN("text", 1000)).collect().map(_.getLong(0))
    assert(full.sameElements(pfx))
    // order sensitivity: same tokens, different order, different fingerprint
    val Seq(fpAsc, fpDup) = docs.where(col("doc_id").isin(1L, 5L))
      .select(TextFns.rollingFingerprint("text")).collect().map(_.getLong(0)).toSeq
    assert(fpAsc == fpDup) // exact dup docs agree
    val reversed = Seq((9L, "dog lazy the over jumps fox brown quick the"))
      .toDF("doc_id", "text")
    assert(reversed.select(TextFns.rollingFingerprint("text")).head().getLong(0) != fpAsc)
  }

  test("minhashSignatureFromText equals staged shingle -> signature") {
    val staged = docs.withColumn("toks", TextFns.tokens(col("text")))
      .withColumn("sh", TextFns.shingleHashesFromTokens("toks", 3))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), TextFns.minhashSignature("sh", 16).as("sig"))
    val oneShot = docs
      .where(size(TextFns.shingleHashesFromText("text", 3)) > 0)
      .select(col("doc_id"), TextFns.minhashSignatureFromText("text", 3, 16).as("sig"))
    assert(oneShot.collect().toSeq.sortBy(_.getLong(0)) ===
      staged.collect().toSeq.sortBy(_.getLong(0)))
  }

  test("identical docs share identical minhash signatures") {
    val sigs = docs.where(col("doc_id").isin(1L, 5L))
      .select(TextFns.minhashSignatureFromText("text", 3, 16))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) === sigs(1))
    assert(sigs(0).length === 16)
  }

  test("simhash32FromText equals staged tokenHashes32 -> simhash32FromHashes") {
    val staged = docs.withColumn("toks", TextFns.tokens(col("text")))
      .withColumn("hs", TextFns.tokenHashes32("toks"))
      .select(col("doc_id"), TextFns.simhash32FromHashes("hs").as("sim"))
    val oneShot = docs.select(col("doc_id"), TextFns.simhash32FromText("text").as("sim"))
    assert(oneShot.collect().toSeq.sortBy(_.getLong(0)) ===
      staged.collect().toSeq.sortBy(_.getLong(0)))
    val values = oneShot.collect().map(_.getLong(1))
    assert(values.forall(v => v >= 0L && v < (1L << 32)))
  }

  test("fingerprint is whitespace- and case-insensitive") {
    val fp = Seq("The  Quick\tBrown ", "the quick brown").toDF("text")
      .select(TextFns.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fp(0) === fp(1))
  }

  test("langId ties break toward the first listed language") {
    val langs = Seq("en" -> Seq("the"), "de" -> Seq("der"))
    val r = Seq("the der", "der", "nothing matches").toDF("text")
      .select(TextFns.langIdExpr("text", langs)).collect().map(_.getString(0))
    assert(r(0) === "en") // tie → first listed
    assert(r(1) === "de")
    assert(r(2) === "en") // 0-0 tie → first listed
  }

  test("vector dot/norm/cosine basics") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (3L, Array(3.0f, 4.0f), Array(3.0f, 4.0f))
    ).toDF("id", "a", "b")
    val r = df.select(col("id"), VectorFns.dot("a", "b").as("dot"),
        VectorFns.l2Norm("a").as("na"), VectorFns.cosine("a", "b").as("cos"))
      .collect().sortBy(_.getLong(0))
    assert(r(0).getDouble(1) === 1.0 && r(0).getDouble(3) === 1.0)
    assert(r(1).getDouble(1) === 0.0 && r(1).getDouble(3) === 0.0)
    assert(r(2).getDouble(2) === 5.0)
    assert(math.abs(r(2).getDouble(3) - 1.0) < 1e-12)
  }

  test("native graft_dot is bit-identical to the HOF formulation, float and double") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 200L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val f = vecs.toDF("id", "a", "b")
    val hof = expr("aggregate(zip_with(a, b, " +
      "(x, y) -> cast(x as double) * cast(y as double)), 0.0d, (acc, v) -> acc + v)")
    val rows = f.select(VectorFns.dot("a", "b").as("native"), hof.as("hof")).collect()
    assert(rows.length == 200 &&
      rows.forall(r => r.getDouble(0) == r.getDouble(1))) // bitwise, no tolerance

    // double arrays take the getDouble path
    val d = vecs.map { case (i, a, b) => (i, a.map(_.toDouble), b.map(_.toDouble)) }
      .toDF("id", "a", "b")
    val dRows = d.select(VectorFns.dot("a", "b").as("native"), hof.as("hof")).collect()
    assert(dRows.forall(r => r.getDouble(0) == r.getDouble(1)))

    // interpreted eval (codegen fallback) agrees with codegen
    val one = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.5f, -2.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2.0f, 0.5f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(one.eval(null) == 1.5 * 2.0 + -2.0 * 0.5)

    // null array propagates null; wrong types are rejected at analysis
    val withNull = Seq((1L, Option.empty[Array[Float]], Array(1.0f)))
      .toDF("id", "a", "b")
    assert(withNull.select(VectorFns.dot("a", "b")).head.isNullAt(0))
    assertThrows[org.apache.spark.sql.AnalysisException](
      Seq((1, "x")).toDF("id", "a").select(expr("graft_dot(a, a)")).collect())
  }

  test("native kernels resolve via register() and the extension path stays in sync") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import graft.functions.NativeVectorExprs
    NativeVectorExprs.register(spark) // idempotent
    val kernels = Set("graft_dot", "graft_simhash32", "graft_minhash",
      "graft_hyperplane_bucket", "graft_nearest_centroid",
      "graft_sq8_pack", "graft_sq8_dot", "graft_shingle_hash",
      "graft_token_hash32", "graft_sig_agree")
    for (f <- kernels)
      assert(spark.sessionState.functionRegistry.functionExists(FunctionIdentifier(f)),
        s"$f not registered")
    // GraftExtensions injects exactly `injectables` — pin the set so a
    // new kernel registered only at runtime can't silently miss the
    // spark.sql.extensions path
    assert(NativeVectorExprs.injectables.map(_._1.funcName).toSet == kernels)
  }

  test("native graft_minhash is bit-identical to the HOF formulation, incl. edges") {
    // real shingle hashes + empty array, null elements, all-null, null array
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("hs", TextFns.shingleHashesFromText("text", 3))
    val cmp = docs.select(
      TextFns.minhashSignature("hs", 16).as("native"),
      TextFns.minhashSignatureHof("hs", 16).as("hof")).collect()
    assert(cmp.nonEmpty)
    for (r <- cmp) assert(r.getSeq[Any](0) == r.getSeq[Any](1))
    val edges = Seq(
      (1L, Some(Seq[Option[Long]]())),
      (2L, Some(Seq[Option[Long]](Some(123456789L), None, Some(42L)))),
      (3L, Some(Seq[Option[Long]](None))),
      (4L, Option.empty[Seq[Option[Long]]]))
      .toDF("id", "hs")
    val e = edges.select(col("id"),
      TextFns.minhashSignature("hs", 4).as("native"),
      TextFns.minhashSignatureHof("hs", 4).as("hof")).collect()
    for (r <- e) {
      assert(!r.isNullAt(1) && !r.isNullAt(2)) // outer array never null
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"id ${r.getLong(0)}")
    }
    // non-literal permutation count rejected at analysis/build
    assertThrows[Exception](
      edges.select(expr("graft_minhash(hs, id)")).collect())
  }

  test("native graft_simhash32 is bit-identical to the HOF formulation, incl. edges") {
    // empty array, single token, negative longs (div/% truncation-sign
    // semantics), null elements (vote -1 on every bit in both forms)
    val rows = Seq(
      (1L, Some(Seq[Option[Long]]())),
      (2L, Some(Seq[Option[Long]](Some(0L)))),
      (3L, Some(Seq[Option[Long]](Some(0xffffffffL), Some(0x12345678L), Some(7L)))),
      (4L, Some(Seq[Option[Long]](Some(-3L), Some(-4L), Some(5L)))),
      (5L, Some(Seq[Option[Long]](Some(42L), None, Some(42L)))),
      (6L, Option.empty[Seq[Option[Long]]]))
      .toDF("id", "hs")
    val both = rows.select(col("id"),
      expr("graft_simhash32(hs)").as("native"),
      TextFns.simhash32FromHashes("hs").as("hof")).collect()
    for (r <- both) {
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch on id ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) == r.getLong(2),
          s"id ${r.getLong(0)}: native ${r.getLong(1)} != hof ${r.getLong(2)}")
    }
    // interpreted eval agrees with codegen
    val one = SimHash32(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0xffffffffL, 7L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    val viaSql = spark.sql("select graft_simhash32(array(4294967295, 7))")
      .head.getLong(0)
    assert(one.eval(null) == viaSql)
    // wrong element type rejected at analysis
    assertThrows[org.apache.spark.sql.AnalysisException](
      Seq((1, Seq(1.5))).toDF("id", "hs")
        .select(expr("graft_simhash32(hs)")).collect())
  }

  test("hyperplane bucket is deterministic and bounded") {
    val df = Seq((1L, Array.fill(8)(0.25f)), (2L, Array.fill(8)(-0.25f)))
      .toDF("vec_id", "embedding")
    def run() = VectorFns.withHyperplaneBucket(df, "embedding", "bucket", 8, 4)
      .select("bucket").collect().map(_.getLong(0))
    val r1 = run()
    val r2 = run()
    assert(r1.toSeq === r2.toSeq)
    assert(r1.forall(b => b >= 0 && b < 16))
    assert(r1(0) !== r1(1)) // opposite vectors land in complementary buckets
  }

  test("hyperplane components are bit-identical to the SQL md5 formula") {
    // the driver-side plane matrix must reproduce EXACTLY what the old
    // inlined-SQL form (and any cross-engine oracle) computes:
    // (conv(substr(md5('s:p:d'),1,15),16,10) % 1000) / 1000.0 - 0.5
    val seed = 7
    val cases = for (p <- 0 until 3; d <- 0 until 5) yield (p, d)
    val sql = cases.map { case (p, d) =>
      s"(cast(conv(substr(md5('$seed:$p:$d'), 1, 15), 16, 10) as bigint) % 1000) / 1000.0d - 0.5d"
    }
    val fromSql = spark.sql(s"select ${sql.mkString(",")}").head()
    // recover the driver-side values through the public API: the bucket
    // of a one-hot vector selects exactly component (p, d) in the dot,
    // so sign(bucket bit) == sign(component)
    for (((p, d), i) <- cases.zipWithIndex) {
      val sqlVal = fromSql.getDouble(i)
      // dim=d+1 one-hot selects exactly component (p, d) in the dot
      val v = Array.fill(d + 1)(0.0f); v(d) = 1.0f
      val bucket = VectorFns.withHyperplaneBucket(
        Seq(Tuple1(v)).toDF("e"), "e", "b", d + 1, p + 1, seed)
        .select("b").head().getLong(0)
      val bitSet = (bucket & (1L << p)) != 0
      assert(bitSet === (sqlVal > 0),
        s"sign mismatch at plane $p dim $d: sql=$sqlVal bucket bit=$bitSet")
    }
  }

  test("hyperplane bucket plan is O(1) in dim x planes (planes are data, not literals)") {
    // mirror of the k-means plan-size pin: the broadcast-relation
    // formulation must keep the physical plan constant-size as the plane
    // matrix grows (the old form generated O(dim*planes) md5/conv
    // subexpressions — ~12k chains at dim=768 x 16 planes).
    val df = Seq((1L, Array.fill(768)(0.25f))).toDF("vec_id", "embedding")
    def planLen(dim: Int, planes: Int): Int =
      VectorFns.withHyperplaneBucket(df, "embedding", "bucket", dim, planes)
        .queryExecution.executedPlan.toString.length
    val small = planLen(8, 2)
    val large = planLen(768, 16)
    assert(large < small + 200,
      s"plan grew with dim x planes: 8x2 -> $small chars, 768x16 -> $large chars")
  }

  test("native graft_hyperplane_bucket is bit-identical to the HOF formulation, incl. edges") {
    val rnd = new scala.util.Random(1234)
    // randomized batch + the HOF-semantics edges: a null ELEMENT or a
    // length mismatch poisons that plane's sum (-> bit 0), a NaN sum
    // fails > 0, an all-negative vector flips every bit off
    val rows: Seq[(Long, Seq[Option[Float]])] =
      (0 until 200).map { i =>
        (i.toLong, Seq.fill(16)(Some(rnd.nextFloat() * 2 - 1): Option[Float]))
      } ++ Seq(
        (900L, Seq.fill(16)(Some(-0.5f): Option[Float])),
        (901L, Seq.tabulate(16)(d => if (d == 3) None else Some(0.25f)): Seq[Option[Float]]),
        (902L, Seq.fill(7)(Some(0.25f): Option[Float])),   // wrong length
        (903L, Seq.tabulate(16)(d => Some(if (d == 0) Float.NaN else 0.25f)): Seq[Option[Float]]),
        (904L, Seq.empty[Option[Float]]))
    val df = rows.toDF("vec_id", "embedding")
    def buckets(f: (org.apache.spark.sql.DataFrame, String, String, Int, Int, Int) => org.apache.spark.sql.DataFrame) =
      f(df, "embedding", "bucket", 16, 10, 7)
        .select("vec_id", "bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val native = buckets(VectorFns.withHyperplaneBucket)
    val hof = buckets(VectorFns.withHyperplaneBucketHof)
    assert(native == hof)
    val byId = native.toMap
    // every plane's sum spans all dims, so a single null element poisons
    // EVERY plane (null sum fails > 0) — as do the length mismatch and
    // the empty vector (zip_with padding)...
    assert(Seq(901L, 902L, 904L).forall(byId(_) == 0L))
    // ...but a NaN sum sets EVERY bit: Spark SQL orders NaN above all
    // values, so NaN > 0 is TRUE (the Java-primitive intuition is wrong,
    // and this row is what pins the kernel to the SQL semantics)
    assert(byId(903L) == (1L << 10) - 1)
    assert(native.map(_._2).exists(_ != 0L)) // the healthy batch still buckets
  }

  test("native graft_nearest_centroid is bit-identical to the HOF argmin, incl. ties and poisoned rows") {
    val rnd = new scala.util.Random(77)
    val rows: Seq[(Long, Seq[Option[Float]])] =
      (0 until 200).map { i =>
        (i.toLong, Seq.fill(8)(Some(rnd.nextFloat() * 4 - 2): Option[Float]))
      } ++ Seq(
        (900L, Seq.tabulate(8)(d => if (d == 2) None else Some(0.5f)): Seq[Option[Float]]),
        (901L, Seq.fill(3)(Some(0.5f): Option[Float])), // wrong length
        (902L, Seq.empty[Option[Float]]))
    val df = rows.toDF("vec_id", "embedding")
    // centroid 5 duplicates centroid 2's vector: equal distances must
    // break toward the LOWER cid on both paths
    val base: Seq[(Int, Seq[Double])] = (0 until 5).map { c =>
      (c, Seq.fill(8)(rnd.nextDouble() * 4 - 2))
    }
    val cents2 = base :+ (5 -> base(2)._2)
    def run(f: (org.apache.spark.sql.DataFrame, String, Seq[(Int, Seq[Double])], Int) => org.apache.spark.sql.DataFrame) =
      f(df, "embedding", cents2, 6).select("vec_id", "cluster").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1))).sortBy(_._1).toSeq
    val native = run(VectorFns.assignWithCentroids(_, _, _, _))
    val hof = run(VectorFns.assignWithCentroidsHof(_, _, _, _))
    assert(native == hof)
    val byId = native.toMap
    // a poisoned vector (null element / wrong length / empty) NULLs every
    // distance; array_min's struct ordering puts null first and ties
    // break to the lowest cid — so these land in cluster 0, not null
    assert(Seq(900L, 901L, 902L).forall(byId(_) == 0))
    // ties on distance (duplicate centroid 5 == centroid 2) never pick 5
    assert(!native.exists(_._2 == 5))
    assert(native.map(_._2).distinct.size > 1) // healthy rows spread out
  }

  test("native graft_sq8_pack/graft_sq8_dot are bit-identical to the HOF integer dot, incl. edges") {
    val rnd = new scala.util.Random(42)
    // randomized code vectors in the quantizer's 0..255 domain, plus the
    // edges: length mismatch (zip_with padding poisons the HOF sum ->
    // NULL), empty arrays (aggregate over empty = 0), a null element
    // (pack nulls -> dot NULL; HOF: null product poisons the sum), and
    // the 255 extremes (unsigned-byte read must not sign-flip)
    val rows: Seq[(Long, Seq[Option[Long]], Seq[Option[Long]])] =
      (0 until 100).map { i =>
        (i.toLong,
          Seq.fill(64)(Some(rnd.nextInt(256).toLong): Option[Long]),
          Seq.fill(64)(Some(rnd.nextInt(256).toLong): Option[Long]))
      } ++ Seq(
        (900L, Seq.fill(64)(Some(255L): Option[Long]), Seq.fill(64)(Some(255L): Option[Long])),
        (901L, Seq.fill(7)(Some(3L): Option[Long]), Seq.fill(64)(Some(3L): Option[Long])),
        (902L, Seq.empty[Option[Long]], Seq.empty[Option[Long]]),
        (903L, Seq(Some(1L), None, Some(2L)), Seq.fill(3)(Some(1L): Option[Long])))
    val df = rows.toDF("row_id", "ca", "cb")
    val out = df.select(col("row_id"),
      expr("graft_sq8_dot(graft_sq8_pack(ca), graft_sq8_pack(cb))").as("native"),
      expr("aggregate(zip_with(ca, cb, (a, b) -> a * b), 0L, (acc, x) -> acc + x)").as("hof"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)),
        if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2))))
    out.foreach { case (id, native, hof) =>
      assert(native == hof, s"row $id: native=$native hof=$hof")
    }
    val byId = out.map(t => t._1 -> t._2).toMap
    assert(byId(900L) == 64L * 255L * 255L) // unsigned extremes
    assert(byId(901L) == null)              // length mismatch
    assert(byId(902L) == 0L)                // empty
    assert(byId(903L) == null)              // null element
  }

  test("native graft_sig_agree is bit-identical to the HOF agreement count, incl. edges") {
    val rnd = new scala.util.Random(7)
    // randomized signature pairs with forced agreement positions, plus
    // the edges: length mismatch (zip_with pads with nulls -> CASE's
    // ELSE 0, so the shorter prefix still counts), empty arrays (0),
    // null elements (null-false equality counts 0), and a NULL side
    // (whole result NULL)
    val rows: Seq[(Long, Seq[Option[Long]], Seq[Option[Long]])] =
      (0 until 100).map { i =>
        val a = Seq.fill(16)(Some(rnd.nextLong(1000000L)): Option[Long])
        val b = a.zipWithIndex.map { case (v, j) =>
          if (rnd.nextBoolean()) v else Some(rnd.nextLong(1000000L)): Option[Long] }
        (i.toLong, a, b)
      } ++ Seq(
        (900L, Seq.fill(5)(Some(9L): Option[Long]), Seq.fill(16)(Some(9L): Option[Long])),
        (901L, Seq.empty[Option[Long]], Seq.fill(16)(Some(1L): Option[Long])),
        (902L, Seq(Some(1L), None, Some(2L)), Seq(Some(1L), None, Some(2L))),
        (903L, null, Seq.fill(16)(Some(1L): Option[Long])))
    val df = rows.toDF("row_id", "sa", "sb")
    val out = df.select(col("row_id"),
      expr("graft_sig_agree(sa, sb)").as("native"),
      expr("aggregate(zip_with(sa, sb, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), 0, (acc, v) -> acc + v)").as("hof"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else java.lang.Integer.valueOf(r.getInt(1)),
        if (r.isNullAt(2)) null else java.lang.Integer.valueOf(r.getInt(2))))
    out.foreach { case (id, native, hof) =>
      assert(native == hof, s"row $id: native=$native hof=$hof")
    }
    val byId = out.map(t => t._1 -> t._2).toMap
    assert(byId(900L) == 5)    // mismatch: shorter prefix still counts
    assert(byId(901L) == 0)    // empty side
    assert(byId(902L) == 2)    // null elements count 0, others match
    assert(byId(903L) == null) // null side
  }

  test("kernel edges pinned (ADVICE r7): null planes null-propagates, bad pid type rejected, null cid never reads garbage") {
    // 1. NULL planes: the HOF `aggregate(NULL, 0L, ...)` yields NULL and
    //    the native kernel must match (it used to return 0L)
    val nullPlanes = spark.sql(
      """SELECT graft_hyperplane_bucket(array(cast(1.0 as double)),
        |         cast(null as array<struct<pid:int,pvec:array<double>>>)) AS native,
        |       aggregate(cast(null as array<struct<pid:int,pvec:array<double>>>),
        |                 0L, (b, pl) -> b) AS hof""".stripMargin).head
    assert(nullPlanes.isNullAt(0) && nullPlanes.isNullAt(1))
    // ...while a null VECTOR over real planes stays 0L on both paths
    // (every plane sum poisons to NULL, fails > 0, contributes nothing)
    val nullVec = spark.sql(
      """SELECT graft_hyperplane_bucket(cast(null as array<double>),
        |         array(named_struct('pid', 0, 'pvec', array(1.0d)))) AS native,
        |       aggregate(array(named_struct('pid', 0, 'pvec', array(1.0d))), 0L,
        |         (b, pl) -> b + (case when aggregate(zip_with(
        |             cast(null as array<double>), pl.pvec, (x, y) -> x * y),
        |           0.0d, (a, v) -> a + v) > 0
        |           then shiftleft(1L, pl.pid) else 0L end)) AS hof""".stripMargin).head
    assert(nullVec.getLong(0) == 0L && nullVec.getLong(1) == 0L)
    // 2. a non-int pid must be REJECTED at analysis time — the old
    //    precedence bug admitted any pid type when pvec was
    //    array<double> containsNull=false, then read garbage via getInt
    assertThrows[org.apache.spark.sql.AnalysisException](spark.sql(
      """SELECT graft_hyperplane_bucket(array(cast(1.0 as double)),
        |  array(named_struct('pid', 1L, 'pvec', array(1.0d))))""".stripMargin)
      .collect())
    // 3. a NULL cid ranks below every non-null cid in array_min's struct
    //    ordering (nulls-first ascending) — a winning null-cid centroid
    //    yields NULL on both paths, never a silent 0
    val nullCid = spark.sql(
      """SELECT graft_nearest_centroid(array(1.0d), cents, 6) AS native,
        |  array_min(transform(cents, c -> named_struct('d',
        |    round(round(aggregate(zip_with(array(1.0d), c.cvec,
        |      (x, y) -> (x - y) * (x - y)), 0.0d, (a, v) -> a + v), 11), 6),
        |    'cid', c.cid))).cid AS hof
        |FROM (SELECT array(
        |  named_struct('cid', cast(null as int), 'cvec', array(1.0d)),
        |  named_struct('cid', 7, 'cvec', array(1.0d))) AS cents)""".stripMargin).head
    assert(nullCid.isNullAt(0) && nullCid.isNullAt(1))
    // a farther null-cid centroid loses normally: the non-null winner
    // comes through untouched on both paths
    val farNull = spark.sql(
      """SELECT graft_nearest_centroid(array(1.0d), cents, 6) AS native,
        |  array_min(transform(cents, c -> named_struct('d',
        |    round(round(aggregate(zip_with(array(1.0d), c.cvec,
        |      (x, y) -> (x - y) * (x - y)), 0.0d, (a, v) -> a + v), 11), 6),
        |    'cid', c.cid))).cid AS hof
        |FROM (SELECT array(
        |  named_struct('cid', cast(null as int), 'cvec', array(9.0d)),
        |  named_struct('cid', 7, 'cvec', array(1.0d))) AS cents)""".stripMargin).head
    assert(farNull.getInt(0) == 7 && farNull.getInt(1) == 7)
  }

  test("hyperplane bucket rejects reserved working-column collisions") {
    val df = Seq((1L, Array(1.0f), 0)).toDF("vec_id", "embedding", "__planes")
    assertThrows[IllegalArgumentException](
      VectorFns.withHyperplaneBucket(df, "embedding", "bucket", 1, 1))
  }

  test("kmeansLloyd separates well-formed clusters deterministically") {
    import graft.functions.VectorFns
    // two tight blobs in 4-d: around (0,0,0,0) and (10,10,10,10)
    val vecs = (0 until 20).map { i =>
      val base = if (i < 10) 0.0f else 10.0f
      (i.toLong, Seq(base + i % 3 * 0.1f, base, base + 0.05f * (i % 2), base))
    }.toDF("vec_id", "embedding")
    val (assigned, centroids) = VectorFns.kmeansLloyd(
      vecs, "vec_id", "embedding", k = 2, iters = 2, dim = 4)
    val byCluster = assigned.select("vec_id", "cluster").collect()
      .groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    // the two blobs must be exactly the two clusters
    assert(byCluster.values.toSet == Set((0L until 10L).toSet, (10L until 20L).toSet))
    // centroids land near the blob centers (stable-rounded)
    assert(centroids.size == 2)
    val means = centroids.map(_._2.head).sorted
    assert(math.abs(means.head - 0.1) < 0.2 && math.abs(means(1) - 10.1) < 0.2)
    // rerun → identical assignment (deterministic seeding + rounding)
    val (again, _) = VectorFns.kmeansLloyd(
      vecs, "vec_id", "embedding", k = 2, iters = 2, dim = 4)
    assert(again.select("vec_id", "cluster").collect().map(r => (r.getLong(0), r.getInt(1))).sorted
      .sameElements(assigned.select("vec_id", "cluster").collect().map(r => (r.getLong(0), r.getInt(1))).sorted))
  }

  test("incremental IVF tick: yesterday+delta merge equals one-shot full assignment") {
    import graft.functions.VectorFns
    import org.apache.spark.sql.DataFrame
    // the ann_ivf_incremental identity on an adversarial split: the
    // increment is NOT uniform (every 3rd vector, including whole-blob
    // slices), so a merge bug that only balances on uniform splits fails
    val vecs = (0 until 60).map { i =>
      val base = (i % 3) * 5.0f
      (i.toLong, Seq(base + i % 2 * 0.1f, base, base + 0.05f * (i % 4), base))
    }.toDF("vec_id", "embedding")
    val existing = vecs.where($"vec_id" % 3 =!= 0)
    val newVecs = vecs.where($"vec_id" % 3 === 0)
    val (_, cents) = VectorFns.kmeansLloyd(
      existing, "vec_id", "embedding", k = 3, iters = 2, dim = 4)
    def stats(df: DataFrame) =
      VectorFns.assignWithCentroids(df, "embedding", cents)
        .groupBy("cluster").agg(
          count(lit(1)).as("n"), min("vec_id").as("mn"),
          max("vec_id").as("mx"), sum("vec_id").as("sm"))
    val merged = stats(existing).unionByName(stats(newVecs))
      .groupBy("cluster").agg(
        sum("n").as("n"), min("mn").as("mn"), max("mx").as("mx"), sum("sm").as("sm"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val full = stats(vecs)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(merged.sameElements(full))
  }

  test("kmeans assignment plan is O(1) in k (centroids are data, not literals)") {
    import graft.functions.VectorFns
    // same corpus, k=2 vs k=32: the physical plan string must not grow
    // with k — the broadcast-relation formulation keeps the argmin
    // expression constant-size (the old inlined-literal form was
    // O(k*dim) and would blow up the parser/codegen at k=4096*768).
    val vecs = (0 until 64).map(i => (i.toLong, Seq.fill(8)(i * 0.1f)))
      .toDF("vec_id", "embedding")
    def planLen(k: Int): Int = {
      val (assigned, _) = VectorFns.kmeansLloyd(
        vecs, "vec_id", "embedding", k = k, iters = 1, dim = 8)
      assigned.queryExecution.executedPlan.toString.length
    }
    val small = planLen(2)
    val large = planLen(32)
    // additive slack, not a ratio: a 16x k increase may cost at most a
    // few chars of stats/id noise — linear-in-k growth cannot hide here
    assert(large < small + 200,
      s"plan grew with k: k=2 -> $small chars, k=32 -> $large chars")
  }

  test("planesFor: ceil-log2 sizing, clamps, and the measured sf1 operating point") {
    import graft.functions.VectorFns.planesFor
    // n <= target: one plane minimum (never zero buckets)
    assert(planesFor(100, 128) == 1)
    assert(planesFor(128, 128) == 1)
    // the oracle-mirrored points: sf0.01 / sf0.1 / sf1 embedding counts
    assert(planesFor(500, 128) == 2)    // ceil(500/128)=4 -> log2=2
    assert(planesFor(5000, 128) == 6)   // 40 buckets -> 2^6=64
    assert(planesFor(50000, 128) == 9)  // 391 buckets -> 2^9=512
    // the §8.10 manual probe chose 8-10 planes at sf1 by measurement;
    // the rule lands inside that band without a human in the loop
    assert((8 to 10).contains(planesFor(50000, 128)))
    // exact power-of-two boundaries can't ulp-flip (integer arithmetic)
    assert(planesFor(128 * 8, 128) == 3)
    assert(planesFor(128 * 8 + 1, 128) == 4)
    // clamp and monotonicity
    assert(planesFor(Long.MaxValue / 2, 1) == 30)
    assert(planesFor(1L << 40, 128, maxPlanes = 12) == 12)
    val sizes = Seq(100L, 1000L, 10000L, 100000L, 1000000L).map(planesFor(_, 128))
    assert(sizes == sizes.sorted)
    intercept[IllegalArgumentException](planesFor(0, 128))
    intercept[IllegalArgumentException](planesFor(100, 0))
  }

  test("minhashGeometryFor: rows-per-band tracks log(n), band budget follows") {
    import graft.functions.TextFns.minhashGeometryFor
    // small corpus: 1-row bands, full band budget (max recall)
    assert(minhashGeometryFor(16, 100, 128) == (16, 1))
    // sf0.01 documents (500): n*s0 = 50 <= 128 -> still r=1
    assert(minhashGeometryFor(16, 500, 128) == (16, 1))
    // sf1-scale corpora need wider bands to hold occupancy
    assert(minhashGeometryFor(16, 50000, 128) == (5, 3))   // 391x over -> r=3
    assert(minhashGeometryFor(16, 5000000, 128) == (3, 5)) // r=ceil(4.59)=5
    // rows never exceed the signature budget; bands never hit zero
    val (b, r) = minhashGeometryFor(4, Long.MaxValue / 2, 1, backgroundSim = 0.5)
    assert(b == 1 && r == 4)
    // monotone: more data never narrows the bands
    val rows = Seq(1000L, 100000L, 10000000L)
      .map(minhashGeometryFor(16, _, 128)._2)
    assert(rows == rows.sorted)
    intercept[IllegalArgumentException](minhashGeometryFor(16, 100, 128, backgroundSim = 1.0))

    // the dedup_minhash_autosize ORACLE derives r with integer threshold
    // comparisons (smallest r with n <= 128*10^r, capped at 16) — pin the
    // float-log Scala rule to that chain across magnitudes incl. the
    // exact power-of-ten boundaries where a log ulp could flip a ceil
    def oracleRows(n: Long): Int =
      (1 to 15).find(r => n <= 128L * math.pow(10, r).toLong).getOrElse(16)
    val probes = Seq(1L, 127L, 128L, 129L, 500L, 1279L, 1280L, 1281L,
      5000L, 12800L, 12801L, 50000L, 500000L, 128L * 10000000L,
      128L * 10000000L + 1) ++ (1 to 14).map(r => 128L * math.pow(10, r).toLong)
    for (n <- probes)
      assert(minhashGeometryFor(16, n, 128)._2 == oracleRows(n),
        s"geometry rule diverges from oracle chain at n=$n")
  }

  test("Misra-Gries sketch: fixed memory, undercount <= N/k, heavy items always present") {
    import graft.functions.HeavyHitters
    val sfDir = "/root/testdata/sf0.001"
    val tokens = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(TextFns.tokens(col("text"))).as("t"))
      .as[String]
    val exact = tokens.groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 16

    def check(sketch: Map[String, Long]): Unit = {
      assert(sketch.size <= k - 1, s"sketch kept ${sketch.size} counters, bound ${k - 1}")
      // every item with true count > N/k must be tracked
      for ((t, c) <- exact if c > n / k)
        assert(sketch.contains(t), s"heavy item '$t' (count $c > ${n / k}) missing")
      // every estimate undercounts by at most N/k
      for ((t, est) <- sketch) {
        val truth = exact.getOrElse(t, 0L)
        assert(est <= truth, s"'$t' overcounted: est $est > true $truth")
        assert(truth - est <= n / k, s"'$t' undercounted past N/k: $truth - $est")
      }
    }

    check(tokens.select(HeavyHitters.misraGries(k)).head())
    // guarantees are partitioning-independent (mergeable summaries)
    check(tokens.repartition(7).select(HeavyHitters.misraGries(k)).head())
  }

  test("dedup_minhash_pairs_est: signature gate loses no qualifying pair (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val gated = SparkEntry.queries("dedup_minhash_pairs_est")(spark, dir)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // UNGATED reference: every LSH candidate pair exact-scored — same
    // AUTO-SIZED bands as the query, same exact-Jaccard integer
    // threshold, NO agreement gate. Equality proves the est-gate costs
    // zero recall on this corpus (precision is free: the gate only
    // ever removes pairs, and any removed pair failing 3i >= ssum was
    // never in the reference).
    val docsSf = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), TextFns.shingleHashesFromText("text", 3).as("sh"))
    val nDocs = docsSf.count()
    val (gBands, gRows) = TextFns.minhashGeometryFor(16, nDocs, targetBucketSize = 128)
    val withSig = docsSf
      .select(col("doc_id"), TextFns.minhashSignature("sh", 16).as("sig"))
    val bandExprs = (0 until gBands).map { b =>
      md5(concat_ws("|",
        (0 until gRows).map(r => col("sig").getItem(b * gRows + r).cast("string")): _*))
    }
    val bands = withSig
      .select(col("doc_id"), explode(array(bandExprs: _*)).as("bucket"))
    val cand = bands.select(col("doc_id").as("id_a"), col("bucket"))
      .join(bands.select(col("doc_id").as("id_b"), col("bucket")), Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val ungated = cand
      .join(docsSf.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(docsSf.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("ssum", (size(col("sh_a")) + size(col("sh_b"))).cast("long"))
      .where(col("i") >= 1 && col("i") * 3 >= col("ssum"))
      .withColumn("jaccard", org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.round(
          col("i").cast("double") / (col("ssum") - col("i")).cast("double"), 11), 6))
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    assert(ungated.nonEmpty, "reference produced no qualifying pairs — corpus assumption broken")
    assert(gated.keySet === ungated.keySet,
      s"gate changed the qualifying pair set: missing=${ungated.keySet -- gated.keySet} extra=${gated.keySet -- ungated.keySet}")
    for ((k, v) <- ungated) assert(gated(k) === v, s"jaccard drifted for $k")
  }
}
