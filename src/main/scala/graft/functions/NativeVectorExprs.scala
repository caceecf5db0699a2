package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over `array<float|double>` columns —
  * the one vector kernel hot enough to justify tier (b) of the custom-
  * operator ladder (a codegen'd `Expression` beating composed
  * built-ins): the `aggregate(zip_with(...))` formulation materializes
  * an intermediate product array and runs two HOF lambda loops per row
  * pair, while this compiles to a single fused primitive-double loop
  * over the two `ArrayData` buffers (no allocation, no per-element
  * lambda dispatch) inside whole-stage codegen.
  *
  * Numerics are IDENTICAL to the HOF version: elements are widened to
  * double (exact for float) and accumulated left-to-right, so every
  * oracle-checked cosine/distance result is bit-unchanged.
  *
  * Array elements must be non-null (embedding vectors are); a null
  * ELEMENT reads as 0.0 rather than poisoning the sum — the arrays
  * themselves are null-propagating like any binary expression.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_dot requires two array<float> or array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left)
    val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val lGet = if (isFloat(left)) s"$a.getFloat($i)" else s"$a.getDouble($i)"
      val rGet = if (isFloat(right)) s"$b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $lGet) * ((double) $rGet);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native 32-bit SimHash over pre-hashed tokens (`array<bigint>`) — the
  * second kernel hot enough for tier (b): the SQL formulation runs 32
  * separate `aggregate` lambda passes over the hash array per row (one
  * per bit), while this accumulates all 32 bit-votes in ONE primitive
  * loop with an `int[32]` of counters, then packs the sign bits.
  *
  * Semantics are IDENTICAL to the SQL form
  * `Σ_b (case when (Σ_x ±1 by (x div 2^b) % 2) > 0 then 2^b else 0)`:
  * votes use Java `/` and `%` (same truncation/sign rules as Spark's
  * `div`/`%` on longs, exact for any input including negatives), a null
  * ELEMENT votes −1 on every bit (`CASE WHEN NULL = 1` falls to the
  * else branch in SQL), an empty array yields 0, and a null ARRAY also
  * yields 0 — NOT null — because in the SQL form every per-bit CASE
  * falls to `else 0` when the aggregate is null, and the sum of 32
  * zeros is 0. Every oracle-checked simhash is bit-unchanged. */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash32 requires array<bigint>, got ${t.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val h = child.eval(input)
    if (h == null) return 0L
    val arr = h.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < 32) { counts(b) -= 1; b += 1 }
      } else {
        val x = arr.getLong(i)
        var b = 0
        while (b < 32) {
          counts(b) += (if ((x / (1L << b)) % 2L == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var res = 0L
    var b = 0
    while (b < 32) { if (counts(b) > 0) res |= 1L << b; b += 1 }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val a = childGen.value
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val b = ctx.freshName("b")
    val x = ctx.freshName("x")
    // the 32-slot vote buffer is per-INSTANCE mutable state, allocated
    // once at operator init and zeroed per row — a per-row `new int[32]`
    // is young-gen churn on a trillion-row pass
    val counts = ctx.addMutableState("int[]", "simhashCounts",
      v => s"$v = new int[32];")
    val res = ctx.freshName("res")
    val body =
      s"""
         |long $res = 0L;
         |if (!${childGen.isNull}) {
         |  int $n = $a.numElements();
         |  java.util.Arrays.fill($counts, 0);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) {
         |      for (int $b = 0; $b < 32; $b++) $counts[$b] -= 1;
         |    } else {
         |      long $x = $a.getLong($i);
         |      for (int $b = 0; $b < 32; $b++) {
         |        $counts[$b] += ((($x / (1L << $b)) % 2L) == 1L) ? 1 : -1;
         |      }
         |    }
         |  }
         |  for (int $b = 0; $b < 32; $b++) {
         |    if ($counts[$b] > 0) $res |= (1L << $b);
         |  }
         |}
       """.stripMargin
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"${childGen.code}$body",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .variable(res, LongType))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The one-pass MinHash loop behind [[MinHashSig]], shared by
  * interpreted eval and generated code (the codegen emits ONE static
  * call, so the expression stays inside whole-stage codegen without a
  * 3-level inline loop nest). Permutation constants are
  * [[TextFns.minhashPerm]]'s, cached per signature width. */
object MinHashKernel {
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def perms(numPerm: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(numPerm, { n =>
      val ps = (0 until n).map(TextFns.minhashPerm)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })

  /** Mirrors `array(array_min(transform(hs, h -> (a_p*(h%2^32)+b_p)%P)),
    * …)` exactly: null ELEMENTS are skipped (array_min semantics), an
    * empty/all-null/NULL input yields an array of numPerm nulls (the
    * SQL outer `array(...)` literal is never null; its elements are),
    * and the arithmetic is the same exact sub-2^53 long math. */
  def compute(arr: ArrayData, numPerm: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    if (arr == null) return new GenericArrayData(new Array[Any](numPerm))
    val (as, bs) = perms(numPerm)
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var any = false
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val hm = arr.getLong(i) % 4294967296L
        var p = 0
        while (p < numPerm) {
          val v = (as(p) * hm + bs(p)) % TextFns.MinhashPrime
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](numPerm))
    else new GenericArrayData(mins.map(java.lang.Long.valueOf(_): Any))
  }
}

/** The fused token-hash loop behind [[TokenHash32]]. */
object TokenHash32Kernel {

  /** Mirrors `transform(tk, t -> cast(conv(substr(md5(t), 1, 8), 16,
    * 10) as bigint))` EXACTLY: per token the first 8 hex digits of its
    * UTF-8 md5 = the digest's first 4 bytes as an unsigned 32-bit
    * value; a null TOKEN yields a null element (md5(NULL) is NULL); a
    * null ARRAY yields NULL (`transform` null-propagates). One reused
    * MessageDigest, no hex strings. */
  def compute(tokens: ArrayData): ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    if (tokens == null) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        md.update(tokens.getUTF8String(i).getBytes)
        val d = md.digest()
        out(i) = java.lang.Long.valueOf(
          ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
            ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL))
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native 32-bit token hashing (`array<string>` → `array<bigint>`) —
  * ninth tier-(b) kernel, the SimHash twin of [[ShingleHash]]: the SQL
  * form pays the md5 hex-string round-trip per TOKEN on the simhash
  * path. Composes with [[SimHash32]] —
  * `graft_simhash32(graft_token_hash32(tokens))` — so both hot loops
  * of the simhash pipeline are native. Bit-identical to the SQL form
  * ([[TokenHash32Kernel.compute]]); the SQL form stays as
  * [[TextFns.tokenHashes32]], the spec cross-check. */
case class TokenHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_token_hash32 requires array<string>, got ${t.sql}")
  }

  override def nullSafeEval(tokens: Any): Any =
    TokenHash32Kernel.compute(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.functions.TokenHash32Kernel.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The fused shingle-hash loop behind [[ShingleHash]]. */
object ShingleHashKernel {

  /** Mirrors
    * `case when size(tk) >= n then array_distinct(transform(
    *    sequence(0, size(tk) - n),
    *    i -> cast(conv(substr(md5(concat_ws(' ', tk[i], …, tk[i+n-1])),
    *                   1, 15), 16, 10) as bigint)))
    *  else cast(array() as array<bigint>) end`
    * EXACTLY, byte for byte: the joined shingle is the tokens' UTF-8
    * bytes separated by 0x20 with `concat_ws`'s null-skip rule (a null
    * token contributes neither bytes nor separator); the hash value is
    * the digest's first 15 hex digits = its first 60 bits (eight
    * big-endian bytes >>> 4, always non-negative so the signed parse
    * agrees); `array_distinct` keeps first-occurrence order; a NULL or
    * shorter-than-n token array yields the non-null EMPTY array (size's
    * NULL falls to the else branch). One reused MessageDigest and zero
    * string allocations replace, per shingle, a concat string, a
    * 32-char hex string, a substr and a base-16 parse. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    if (tokens == null) return new GenericArrayData(Array.empty[Any])
    val sz = tokens.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= sz - n) {
      md.reset()
      var first = true
      var j = 0
      while (j < n) {
        if (!tokens.isNullAt(i + j)) {
          if (!first) md.update(' '.toByte)
          md.update(tokens.getUTF8String(i + j).getBytes)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xFFL); k += 1 }
      seen.add(java.lang.Long.valueOf(v >>> 4))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]]
      .map(x => x: Any))
  }
}

/** Native n-gram shingle hashing over a token array (`array<string>` →
  * `array<bigint>`) — eighth tier-(b) kernel, and the one that attacks
  * the dedup family's measured dominant term: after the r8 star-edge +
  * single-scan work, ~90% of the cc pipeline wall IS the
  * tokenize→shingle→md5→minhash scan, and per shingle the SQL form
  * allocates a concatenated string, md5's 32-char hex string, a substr
  * and a conv parse. The kernel feeds token bytes straight into one
  * reused MessageDigest and emits the digest's top 60 bits.
  * Bit-identical to the SQL form ([[ShingleHashKernel.compute]]); the
  * SQL form stays as [[TextFns.shingleHashesFromTextHof]], the spec
  * cross-check. */
case class ShingleHash(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hash requires a positive shingle width, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hash requires array<string>, got ${t.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    ShingleHashKernel.compute(
      child.eval(input).asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val res = ctx.freshName("shingles")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData $res =
        |  graft.functions.ShingleHashKernel.compute(
        |    ${childGen.isNull} ? null : ${childGen.value}, $n);
        |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .variable(res, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native MinHash signature over pre-hashed shingles (`array<bigint>`) —
  * third tier-(b) kernel: the SQL formulation runs `numPerm` separate
  * `array_min(transform(...))` lambda passes per row (16 on the dedup
  * path, feeding FOUR oracle queries); this computes every permutation
  * minimum in one pass. Bit-identical (exact integer math — see
  * [[MinHashKernel.compute]]); the HOF form stays as the spec
  * cross-check. */
case class MinHashSig(child: Expression, numPerm: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numPerm > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires a positive permutation count, got $numPerm")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<bigint>, got ${t.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    MinHashKernel.compute(
      child.eval(input).asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val res = ctx.freshName("sig")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData $res =
        |  graft.functions.MinHashKernel.compute(
        |    ${childGen.isNull} ? null : ${childGen.value}, $numPerm);
        |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .variable(res, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The fused hyperplane-bucket loop behind [[HyperplaneBucket]], shared
  * by interpreted eval and generated code (codegen emits ONE static
  * call — same packaging as [[MinHashKernel]]). */
object HyperplaneBucketKernel {

  /** Mirrors the HOF form
    * `aggregate(planes, 0L, (b, pl) -> b + (case when
    *   aggregate(zip_with(vec, pl.pvec, (x, y) -> cast(x as double) * y),
    *             0.0d, (a, v) -> a + v) > 0
    *   then shiftleft(1L, pl.pid) else 0L end))`
    * EXACTLY: per-plane dot products widen to double and accumulate
    * left-to-right in ascending dim order (bit-identical IEEE sums); a
    * null vector, a null element, or a length mismatch (zip_with pads
    * the shorter side with nulls, and `a + null` poisons the sum)
    * yields a NULL plane sum, which fails `> 0` and contributes 0; a
    * NaN sum SETS the bit — Spark SQL orders NaN larger than every
    * value, so `NaN > 0` is TRUE there (unlike Java's primitive
    * comparison, which the kernel must therefore special-case). Bits
    * ADD (`b + …`, matching the HOF
    * accumulator — identical to OR while pids are distinct), and
    * `1L << pid` wraps mod 64 exactly like `shiftleft`. */
  def compute(vec: ArrayData, planes: ArrayData, vecIsFloat: Boolean): Long = {
    if (planes == null) return 0L
    var bucket = 0L
    val np = planes.numElements()
    var p = 0
    while (p < np) {
      if (!planes.isNullAt(p)) {
        val pl = planes.getStruct(p, 2)
        if (!pl.isNullAt(0)) {
          val pid = pl.getInt(0)
          val pvec = if (pl.isNullAt(1)) null else pl.getArray(1)
          if (planeSumPositive(vec, pvec, vecIsFloat)) bucket += (1L << pid)
        }
      }
      p += 1
    }
    bucket
  }

  private def planeSumPositive(vec: ArrayData, pvec: ArrayData,
                               vecIsFloat: Boolean): Boolean = {
    if (vec == null || pvec == null) return false
    val n = vec.numElements()
    if (pvec.numElements() != n) return false // a padded null poisons the sum
    var s = 0.0
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i) || pvec.isNullAt(i)) return false
      val x = if (vecIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      s += x * pvec.getDouble(i)
      i += 1
    }
    // Spark SQL: NaN compares larger than any value, so NaN > 0 is true
    java.lang.Double.isNaN(s) || s > 0
  }
}

/** Native hyperplane-LSH bucket id over an embedding column and the
  * broadcast plane row (`array<struct<pid:int,pvec:array<double>>>`) —
  * fourth tier-(b) kernel: the HOF formulation runs, per row, one
  * outer `aggregate` plus per plane a `zip_with` (allocating a dim-long
  * product array) and an inner `aggregate` — 2·planes lambda passes and
  * planes intermediate arrays; this fuses the whole thing into one
  * allocation-free primitive loop nest inside whole-stage codegen.
  * Bit-identical to the HOF form ([[HyperplaneBucketKernel.compute]]);
  * the HOF form stays in [[VectorFns.withHyperplaneBucketHof]] as the
  * spec cross-check. */
case class HyperplaneBucket(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  // NULL planes must yield NULL, exactly like the HOF
  // `aggregate(NULL, 0L, ...)`; a null VECTOR stays non-null 0L (every
  // plane sum poisons to NULL, fails `> 0`, contributes 0) — also HOF.
  override def nullable: Boolean = right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _),
          ArrayType(StructType(Array(pid, pvec)), _))
        if pid.dataType == IntegerType &&
           pvec.dataType.isInstanceOf[ArrayType] &&
           pvec.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "graft_hyperplane_bucket requires (array<float|double>, " +
        s"array<struct<pid:int,pvec:array<double>>>), got ${l.sql} and ${r.sql}")
  }

  private def vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val planes = right.eval(input)
    if (planes == null) return null
    java.lang.Long.valueOf(HyperplaneBucketKernel.compute(
      left.eval(input).asInstanceOf[ArrayData],
      planes.asInstanceOf[ArrayData], vecIsFloat))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val res = ctx.freshName("bucket")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    if (nullable) {
      ev.copy(
        code = code"""
          |${leftGen.code}
          |${rightGen.code}
          |boolean ${ev.isNull} = ${rightGen.isNull};
          |long ${ev.value} = ${ev.isNull} ? 0L :
          |  graft.functions.HyperplaneBucketKernel.compute(
          |    ${leftGen.isNull} ? null : ${leftGen.value},
          |    ${rightGen.value}, $vecIsFloat);
          |""".stripMargin)
    } else {
      ev.copy(
        code = code"""
          |${leftGen.code}
          |${rightGen.code}
          |long $res = graft.functions.HyperplaneBucketKernel.compute(
          |  ${leftGen.isNull} ? null : ${leftGen.value},
          |  ${rightGen.value}, $vecIsFloat);
          |""".stripMargin,
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
        value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
          .variable(res, LongType))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The fused nearest-centroid loop behind [[NearestCentroid]], shared by
  * interpreted eval and generated code (ONE static call, same packaging
  * as [[MinHashKernel]]/[[HyperplaneBucketKernel]]). */
object NearestCentroidKernel {

  /** Spark's `round(round(v, scale+5), scale)` for doubles, exactly:
    * `RoundBase` passes NaN/Infinity through unchanged and otherwise
    * rounds via `BigDecimal.valueOf(v).setScale(s, HALF_UP)` (the
    * shortest-decimal valueOf semantics, not the exact binary
    * constructor). */
  def stableRound(v: Double, scale: Int): Double = {
    def r(x: Double, s: Int): Double =
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
      else java.math.BigDecimal.valueOf(x)
        .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    r(r(v, scale + 5), scale)
  }

  /** Mirrors
    * `array_min(transform(cents, c -> named_struct('d',
    *    round(round(aggregate(zip_with(vec, c.cvec,
    *      (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),
    *    0.0d, (a, v) -> a + v), scale+5), scale), 'cid', c.cid))).cid`
    * EXACTLY: per-centroid squared-L2 accumulates left-to-right in
    * double; a null vec / null element / length mismatch poisons that
    * distance to NULL (zip_with padding + `a + null`); `array_min`'s
    * struct ordering puts a NULL distance FIRST (nulls smallest), ranks
    * NaN above every number (`Double.compare`), and breaks distance
    * ties toward the lowest cid — with a NULL cid ranking below every
    * non-null cid (struct ordering is nulls-first ascending), so a
    * winning null-cid struct yields a NULL result, never a garbage 0.
    * Returns null when `cents` is null/empty (`array_min` over an
    * empty array) or the winner's cid is null. */
  def compute(vec: ArrayData, cents: ArrayData, scale: Int,
              vecIsFloat: Boolean): Integer = {
    if (cents == null) return null
    val nc = cents.numElements()
    var bestCid = 0
    var bestCidIsNull = false
    var bestDist = 0.0
    var bestIsNull = false
    var found = false
    var c = 0
    while (c < nc) {
      if (!cents.isNullAt(c)) {
        val cent = cents.getStruct(c, 2)
        val cidIsNull = cent.isNullAt(0)
        val cid = if (cidIsNull) 0 else cent.getInt(0)
        val cvec = if (cent.isNullAt(1)) null else cent.getArray(1)
        var dNull = vec == null || cvec == null ||
          cvec.numElements() != vec.numElements()
        var d = 0.0
        if (!dNull) {
          val n = vec.numElements()
          var i = 0
          while (i < n && !dNull) {
            if (vec.isNullAt(i) || cvec.isNullAt(i)) dNull = true
            else {
              val x = if (vecIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
              val diff = x - cvec.getDouble(i)
              d += diff * diff
            }
            i += 1
          }
        }
        if (!dNull) d = stableRound(d, scale)
        // struct(d, cid) ascending: null d first; then Double.compare
        // (NaN greatest); then cid (null cid first)
        val better =
          if (!found) true
          else {
            val distCmp =
              if (dNull && bestIsNull) 0
              else if (dNull != bestIsNull) { if (dNull) -1 else 1 }
              else java.lang.Double.compare(d, bestDist)
            if (distCmp != 0) distCmp < 0
            else if (cidIsNull != bestCidIsNull) cidIsNull
            else !cidIsNull && cid < bestCid
          }
        if (better) {
          bestCid = cid; bestCidIsNull = cidIsNull
          bestDist = d; bestIsNull = dNull; found = true
        }
      }
      c += 1
    }
    if (!found || bestCidIsNull) null else Integer.valueOf(bestCid)
  }
}

/** Native nearest-centroid assignment over an embedding column and the
  * broadcast centroid row (`array<struct<cid:int,cvec:array<double>>>`)
  * — fifth tier-(b) kernel: the HOF formulation runs, per row, one
  * `transform` plus per centroid a `zip_with` (allocating a dim-long
  * diff array) and an `aggregate` — 2·k lambda passes and k
  * intermediate arrays (k=64 on the IVF path); this fuses the whole
  * argmin into one allocation-free loop nest inside whole-stage
  * codegen. Bit-identical to the HOF form
  * ([[NearestCentroidKernel.compute]] — incl. Spark's double `round`
  * semantics and `array_min`'s struct ordering); the HOF form stays in
  * [[VectorFns]] as the spec cross-check. */
case class NearestCentroid(left: Expression, right: Expression, scale: Int)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _),
          ArrayType(StructType(Array(cid, cvec)), _))
        if cid.dataType == IntegerType &&
           cvec.dataType.isInstanceOf[ArrayType] &&
           cvec.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "graft_nearest_centroid requires (array<float|double>, " +
        s"array<struct<cid:int,cvec:array<double>>>), got ${l.sql} and ${r.sql}")
  }

  private def vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val cents = right.eval(input)
    if (cents == null) return null
    NearestCentroidKernel.compute(
      left.eval(input).asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], scale, vecIsFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val res = ctx.freshName("cid")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        |${leftGen.code}
        |${rightGen.code}
        |java.lang.Integer $res = ${rightGen.isNull} ? null :
        |  graft.functions.NearestCentroidKernel.compute(
        |    ${leftGen.isNull} ? null : ${leftGen.value},
        |    ${rightGen.value}, $scale, $vecIsFloat);
        |boolean ${ev.isNull} = ($res == null);
        |int ${ev.value} = ${ev.isNull} ? -1 : $res.intValue();
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The pack loop behind [[Sq8Pack]], shared by interpreted eval and
  * generated code (one static call, same packaging as the other
  * kernels). */
object Sq8PackKernel {

  /** Packs an `array<bigint>` of SQ8 codes (the quantizer's 0..255
    * output domain) into one byte per element — an 8× narrower pair-
    * shuffle payload than the long array (and 64× narrower than the
    * original doubles). A null ARRAY or a null ELEMENT yields NULL (a
    * byte array cannot carry an element null, and a poisoned code
    * vector must not silently score); values wrap mod 256 exactly like
    * a CAST to BYTE — unreachable from the quantizer, pinned so the
    * kernel is total. */
  def compute(codes: ArrayData): Array[Byte] = {
    if (codes == null) return null
    val n = codes.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i)) return null
      out(i) = codes.getLong(i).toByte
      i += 1
    }
    out
  }
}

/** Packs SQ8 codes (`array<bigint>`, 0..255) into a `binary` column —
  * sixth tier-(b) kernel, the carrier half of the SQ8 pair scorer: the
  * candidate-pair join then shuffles 64 BYTES per side instead of 64
  * longs (or the 64 doubles of the exact path). Unpack never happens —
  * [[Sq8Dot]] scores the packed form directly. */
case class Sq8Pack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sq8_pack requires array<bigint>, got ${t.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    Sq8PackKernel.compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        |${childGen.code}
        |byte[] ${ev.value} = graft.functions.Sq8PackKernel.compute(
        |  ${childGen.isNull} ? null : ${childGen.value});
        |boolean ${ev.isNull} = (${ev.value} == null);
        |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The fused unsigned-byte dot loop behind [[Sq8Dot]]. */
object Sq8DotKernel {

  /** Integer dot product of two packed SQ8 code vectors, read as
    * UNSIGNED bytes (codes are 0..255). Mirrors the HOF reference form
    * `aggregate(zip_with(codes_a, codes_b, (a, b) -> a * b), 0L,
    * (acc, x) -> acc + x)` over the unpacked long arrays EXACTLY: NULL
    * on a null side, and NULL on a length mismatch (zip_with pads the
    * shorter side with nulls and `acc + null` poisons the sum). Exact
    * in long arithmetic — no rounding anywhere. */
  def compute(a: Array[Byte], b: Array[Byte]): java.lang.Long = {
    if (a == null || b == null || a.length != b.length) return null
    var acc = 0L
    var i = 0
    while (i < a.length) {
      acc += ((a(i) & 0xFF).toLong * (b(i) & 0xFF).toLong)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** Unsigned-byte integer dot product over two [[Sq8Pack]]ed code
  * columns — seventh tier-(b) kernel, the scoring half of the SQ8 pair
  * scorer: one primitive byte loop per candidate pair inside
  * whole-stage codegen, no unpacking, no doubles until the survivors'
  * exact re-rank. Bit-identical to the HOF form over the unpacked long
  * arrays ([[Sq8DotKernel.compute]]); FunctionsSpec pins the two. */
case class Sq8Dot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_sq8_dot requires two binary arguments, got ${l.sql} and ${r.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    Sq8DotKernel.compute(
      left.eval(input).asInstanceOf[Array[Byte]],
      right.eval(input).asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val res = ctx.freshName("iscore")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        |${leftGen.code}
        |${rightGen.code}
        |java.lang.Long $res = graft.functions.Sq8DotKernel.compute(
        |  ${leftGen.isNull} ? null : ${leftGen.value},
        |  ${rightGen.isNull} ? null : ${rightGen.value});
        |boolean ${ev.isNull} = ($res == null);
        |long ${ev.value} = ${ev.isNull} ? 0L : $res.longValue();
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SigAgreeKernel {

  /** Count of positionally-equal elements of two long arrays — the
    * MinHash signature-agreement statistic (matching minima / numPerm
    * estimates Jaccard). Mirrors the HOF reference form
    * `aggregate(zip_with(a, b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0
    * END), 0, (acc, v) -> acc + v)` EXACTLY: a null side → NULL;
    * zip_with pads a length mismatch with nulls and `null = x` is
    * null-false through the CASE, so unmatched tails and null elements
    * count 0. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Integer = {
    if (a == null || b == null) return null
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        acc += 1
      i += 1
    }
    java.lang.Integer.valueOf(acc)
  }
}

/** Signature-agreement count over two `array<bigint>` MinHash
  * signatures — tenth tier-(b) kernel, the gating half of the text
  * est-gate (`dedup_minhash_pairs_est`): the agreement statistic runs
  * per candidate-pair JOIN ROW, and the HOF `aggregate(zip_with(...))`
  * form is CodegenFallback — measured ~7 s of interpreted lambda per
  * 25 M join rows at the sf1 16×1 probe, dominating the very work the
  * gate exists to avoid. One primitive loop in whole-stage codegen
  * instead; bit-identical to the HOF form ([[SigAgreeKernel.compute]],
  * FunctionsSpec parity rows). */
case class SigAgree(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_sig_agree requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SigAgreeKernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      .intValue()

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("agree")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NativeVectorExprs {

  private val dotIdent = FunctionIdentifier("graft_dot")
  private val simhashIdent = FunctionIdentifier("graft_simhash32")
  private val minhashIdent = FunctionIdentifier("graft_minhash")
  private val hyperplaneIdent = FunctionIdentifier("graft_hyperplane_bucket")
  private val nearestIdent = FunctionIdentifier("graft_nearest_centroid")
  private val sq8PackIdent = FunctionIdentifier("graft_sq8_pack")
  private val sq8DotIdent = FunctionIdentifier("graft_sq8_dot")
  private val shingleIdent = FunctionIdentifier("graft_shingle_hash")
  private val tokenHashIdent = FunctionIdentifier("graft_token_hash32")
  private val sigAgreeIdent = FunctionIdentifier("graft_sig_agree")

  private def dotInfo = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")
  private def simhashInfo =
    new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32")
  private def minhashInfo =
    new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash")
  private def hyperplaneInfo =
    new ExpressionInfo(classOf[HyperplaneBucket].getName, "graft_hyperplane_bucket")
  private def nearestInfo =
    new ExpressionInfo(classOf[NearestCentroid].getName, "graft_nearest_centroid")
  private def sq8PackInfo =
    new ExpressionInfo(classOf[Sq8Pack].getName, "graft_sq8_pack")
  private def sq8DotInfo =
    new ExpressionInfo(classOf[Sq8Dot].getName, "graft_sq8_dot")
  private def shingleInfo =
    new ExpressionInfo(classOf[ShingleHash].getName, "graft_shingle_hash")
  private def tokenHashInfo =
    new ExpressionInfo(classOf[TokenHash32].getName, "graft_token_hash32")
  private def sigAgreeInfo =
    new ExpressionInfo(classOf[SigAgree].getName, "graft_sig_agree")

  private def dotBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 2, s"graft_dot expects 2 arguments, got ${children.size}")
    DotProduct(children.head, children(1))
  }

  private def simhashBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 1,
      s"graft_simhash32 expects 1 argument, got ${children.size}")
    SimHash32(children.head)
  }

  private def minhashBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"graft_minhash expects 2 arguments, got ${children.size}")
    val numPerm = children(1) match {
      case lit: org.apache.spark.sql.catalyst.expressions.Literal
          if lit.dataType == IntegerType && lit.value != null =>
        lit.value.asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"graft_minhash's second argument must be an integer literal, got $other")
    }
    MinHashSig(children.head, numPerm)
  }

  private def hyperplaneBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"graft_hyperplane_bucket expects 2 arguments, got ${children.size}")
    HyperplaneBucket(children.head, children(1))
  }

  private def nearestBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 3,
      s"graft_nearest_centroid expects 3 arguments, got ${children.size}")
    val scale = children(2) match {
      case lit: org.apache.spark.sql.catalyst.expressions.Literal
          if lit.dataType == IntegerType && lit.value != null =>
        lit.value.asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"graft_nearest_centroid's third argument must be an integer literal, got $other")
    }
    NearestCentroid(children.head, children(1), scale)
  }

  private def sq8PackBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 1,
      s"graft_sq8_pack expects 1 argument, got ${children.size}")
    Sq8Pack(children.head)
  }

  private def sq8DotBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"graft_sq8_dot expects 2 arguments, got ${children.size}")
    Sq8Dot(children.head, children(1))
  }

  private def shingleBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"graft_shingle_hash expects 2 arguments, got ${children.size}")
    val n = children(1) match {
      case lit: org.apache.spark.sql.catalyst.expressions.Literal
          if lit.dataType == IntegerType && lit.value != null =>
        lit.value.asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"graft_shingle_hash's second argument must be an integer literal, got $other")
    }
    ShingleHash(children.head, n)
  }

  private def tokenHashBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 1,
      s"graft_token_hash32 expects 1 argument, got ${children.size}")
    TokenHash32(children.head)
  }

  private def sigAgreeBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"graft_sig_agree expects 2 arguments, got ${children.size}")
    SigAgree(children.head, children(1))
  }

  /** Runtime registration for sessions not built with
    * [[graft.GraftExtensions]] (tests, the driver's own builders).
    * Idempotent. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    injectables.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident))
        registry.registerFunction(ident, info, builder)
    }
  }

  private[graft] def injectables
    : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((dotIdent, dotInfo, dotBuilder _),
      (simhashIdent, simhashInfo, simhashBuilder _),
      (minhashIdent, minhashInfo, minhashBuilder _),
      (hyperplaneIdent, hyperplaneInfo, hyperplaneBuilder _),
      (nearestIdent, nearestInfo, nearestBuilder _),
      (sq8PackIdent, sq8PackInfo, sq8PackBuilder _),
      (sq8DotIdent, sq8DotInfo, sq8DotBuilder _),
      (shingleIdent, shingleInfo, shingleBuilder _),
      (tokenHashIdent, tokenHashInfo, tokenHashBuilder _),
      (sigAgreeIdent, sigAgreeInfo, sigAgreeBuilder _))
}
