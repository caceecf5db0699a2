package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis & dedup column builders for a training-data pipeline:
  * tokenization, quality scoring, language-ID heuristic, fingerprinting,
  * word-shingles, MinHash and SimHash — all pure Catalyst expressions
  * (codegen-friendly; no UDFs), so they stay inside whole-stage codegen
  * and push down/prune like any built-in.
  *
  * Cross-engine determinism: every hash is derived from `md5` (identical
  * in Spark and DuckDB) — `conv(substr(md5(x),1,15),16,10)` gives a
  * 60-bit integer both engines agree on, unlike xxhash64/murmur which
  * differ per engine.
  */
object TextFns {

  /** Whitespace tokenization of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-style pre-tokenization (GPT-2 pattern family, RE2-safe — no
    * lookahead): simplified contractions, space-prefixed letter runs,
    * digit runs, punctuation runs, whitespace runs. Leftmost-first
    * alternation matches identically under Java regex and RE2, so token
    * counts are engine-portable. */
  val BpePattern: String =
    "'\\p{L}{1,2}| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  // -------------------------------------------------- expression binding
  //
  // Catalyst substitutes aliased expressions into predicates it pushes
  // down (PushDownPredicates, InferFiltersFromGenerate) regardless of
  // cost, and HOF lambdas are interpreted — no codegen subexpression
  // elimination. A token-array column inlined into a lambda therefore
  // re-runs the regex split at EVERY element access (~3 splits per
  // shingle), which turns an exploded-shingle plan into hundreds of
  // full-text regex splits per document. `bound` pins a subexpression
  // to a lambda variable via a one-element transform, so any substituted
  // copy of the whole expression still evaluates the subexpression once.

  private def bound(arg: String, v: String)(body: String): String =
    s"element_at(transform(array($arg), $v -> $body), 1)"

  private def tokensSql(textCol: String): String =
    s"split(trim($textCol), '\\\\s+')"

  private def shingleHashesSql(tk: String, n: Int): String = {
    val parts = (0 until n)
      .map(j => if (j == 0) s"$tk[i]" else s"$tk[i+$j]").mkString(", ")
    s"case when size($tk) >= $n then " +
      s"array_distinct(transform(sequence(0, size($tk) - $n), " +
      s"i -> cast(conv(substr(md5(concat_ws(' ', $parts)), 1, 15), 16, 10) as bigint))) " +
      s"else cast(array() as array<bigint>) end"
  }

  private def minhashArraySql(hs: String, numPerm: Int): String =
    (0 until numPerm).map { p =>
      val (a, b) = minhashPerm(p)
      s"array_min(transform($hs, h -> ($a * (h % 4294967296) + $b) % $MinhashPrime))"
    }.mkString("array(", ", ", ")")

  private def simhashSql(hs: String): String =
    (0 until 32).map { b =>
      val vote = s"aggregate($hs, 0L, (a, x) -> " +
        s"a + (case when (x div ${1L << b}L) % 2 = 1 then 1 else -1 end))"
      s"(case when ($vote) > 0 then ${1L << b}L else 0L end)"
    }.mkString(" + ")

  /** Distinct 60-bit shingle hashes straight from the text column, with
    * the token array BOUND (one regex split per evaluation, even after
    * predicate-pushdown substitution) and the hashing fused into the
    * native [[graft.functions.ShingleHash]] kernel (sessions must run
    * [[NativeVectorExprs.register]] or load [[graft.GraftExtensions]]).
    * Prefer this over `tokens` + [[shingleHashesFromTokens]] in query
    * plans. */
  def shingleHashesFromText(textCol: String, n: Int): Column =
    expr(bound(tokensSql(textCol), "__tk")(s"graft_shingle_hash(__tk, $n)"))

  /** The pre-kernel SQL formulation (one md5 hex round-trip per
    * shingle) — retained as the bit-parity cross-check for
    * [[graft.functions.ShingleHashKernel]] (FunctionsSpec /
    * KernelPropertiesSpec). */
  def shingleHashesFromTextHof(textCol: String, n: Int): Column =
    expr(bound(tokensSql(textCol), "__tk")(shingleHashesSql("__tk", n)))

  /** MinHash signature straight from text: tokens bound, then BOTH hot
    * loops native — [[graft.functions.ShingleHash]] for the shingle
    * hashing and [[MinHashSig]] for the permutation minima (sessions
    * must run [[NativeVectorExprs.register]] or load
    * [[graft.GraftExtensions]]). */
  def minhashSignatureFromText(textCol: String, shingleN: Int, numPerm: Int): Column =
    expr(bound(tokensSql(textCol), "__tk")(
      s"graft_minhash(graft_shingle_hash(__tk, $shingleN), $numPerm)"))

  /** 32-bit SimHash straight from text (tokens bound, then BOTH hot
    * loops native — [[graft.functions.TokenHash32]] for the per-token
    * md5 and [[SimHash32]] for the bit votes; sessions must run
    * [[NativeVectorExprs.register]] or load [[graft.GraftExtensions]]). */
  def simhash32FromText(textCol: String): Column =
    expr(bound(tokensSql(textCol), "__tk")(
      "graft_simhash32(graft_token_hash32(__tk))"))

  /** Document fingerprint: md5 of lower-cased whitespace-collapsed text
    * (exact-dedup key). */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Polynomial rolling-hash fingerprint over the token sequence
    * (Rabin–Karp: h = (h·B + tok) mod M, B=131, M=1e9+7) — ORDER-
    * sensitive unlike the md5-of-normalized-text fingerprint, and the
    * basis for windowed substring fingerprinting. All math stays in
    * exact 64-bit range ((M-1)·131 + M-1 < 2^63) so both engines agree
    * bit-for-bit; token hashes are pre-reduced mod M, which also makes
    * DuckDB's init-less `list_reduce` equal to Spark's `aggregate` with
    * init 0 (0·B + x0 ≡ x0 when x0 < M). */
  def rollingFingerprint(textCol: String): Column =
    rollingFingerprintN(textCol, Int.MaxValue)

  /** Rolling fingerprint over the first `n` tokens only — the windowed
    * form (prefix fingerprints detect shared openings; sliding windows
    * compose from the same recurrence). */
  def rollingFingerprintN(textCol: String, n: Int): Column = {
    val tk = if (n == Int.MaxValue) "__tk" else s"slice(__tk, 1, $n)"
    expr(bound(tokensSql(textCol), "__tk")(
      bound(s"transform($tk, t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint) % 1000000007)",
            "__hs")(
        "aggregate(__hs, 0L, (a, x) -> (a * 131 + x) % 1000000007)")))
  }

  /** Distinct word n-gram shingles ("a b c") from a token-array column
    * (referenced by NAME so the token array is computed once). Guards the
    * size < n case — Spark's `sequence(0, -1)` would otherwise generate a
    * DESCENDING sequence, not an empty one. */
  def shinglesFromTokens(tokCol: String, n: Int): Column = {
    val parts = (0 until n)
      .map(j => if (j == 0) s"$tokCol[i]" else s"$tokCol[i+$j]").mkString(", ")
    expr(
      s"case when size($tokCol) >= $n then " +
        s"array_distinct(transform(sequence(0, size($tokCol) - $n), i -> concat_ws(' ', $parts))) " +
        s"else slice($tokCol, 1, 0) end")
  }

  /** NON-distinct word n-grams from a token-array column — one entry per
    * position (repetition analysis needs occurrence counts, which
    * [[shinglesFromTokens]]'s `array_distinct` would destroy). Same
    * size-guard as shinglesFromTokens. */
  def ngramsFromTokens(tokCol: String, n: Int): Column = {
    val parts = (0 until n)
      .map(j => if (j == 0) s"$tokCol[i]" else s"$tokCol[i+$j]").mkString(", ")
    expr(
      s"case when size($tokCol) >= $n then " +
        s"transform(sequence(0, size($tokCol) - $n), i -> concat_ws(' ', $parts)) " +
        s"else slice($tokCol, 1, 0) end")
  }

  /** Jaccard similarity of two string arrays (distinct semantics —
    * array_intersect / array_union both deduplicate). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Punctuation ratio per character. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("double") /
      length(text)

  /** Language-ID by stopword-hit scoring; ties broken by the fixed
    * language order given (first listed wins). */
  def langIdExpr(textCol: String, langWords: Seq[(String, Seq[String])]): Column = {
    val scores = langWords.map { case (lang, words) =>
      val pat = words.mkString("\\\\b(", "|", ")\\\\b")
      (lang, s"size(regexp_extract_all(lower($textCol), '$pat', 0))")
    }
    val caseExpr = scores.zipWithIndex.map { case ((lang, sc), i) =>
      val conds = scores.zipWithIndex.collect {
        case ((_, s2), j) if j < i => s"$sc > $s2"
        case ((_, s2), j) if j > i => s"$sc >= $s2"
      }
      s"when ${if (conds.isEmpty) "true" else conds.mkString(" and ")} then '$lang'"
    }.mkString("case ", " ", " end")
    expr(caseExpr)
  }

  /** Distinct 60-bit hashes of word n-gram shingles — the cheap set
    * representation for Jaccard/minhash at scale: one md5 per shingle,
    * long-array set ops instead of string-array set ops. Jaccard over
    * the hashed sets equals Jaccard over the string sets (60-bit
    * collisions are negligible), and both engines agree on the hash. */
  def shingleHashesFromTokens(tokCol: String, n: Int): Column =
    expr(shingleHashesSql(tokCol, n))

  /** Universal-hash MinHash permutation constants: (a, b) pairs small
    * enough that a*h32 + b stays under 2^62 (no int64 overflow in either
    * engine). Shared by the Spark expression and the SQL oracle. */
  def minhashPerm(i: Int): (Long, Long) = (40503L * (i + 1) + 12345L, 9176L * (i + 1) + 1L)
  val MinhashPrime = 4294967291L // largest 32-bit prime

  /** MinHash signature from PRE-HASHED shingles: permutation i is the
    * arithmetic universal hash (a_i * (h mod 2^32) + b_i) mod p — ONE
    * md5 per shingle total, instead of one per (shingle, permutation).
    * Exact in both engines (all intermediates < 2^62). Native one-pass
    * kernel on the hot path ([[MinHashSig]]). */
  def minhashSignature(hashCol: String, numPerm: Int): Column =
    expr(s"graft_minhash($hashCol, $numPerm)")

  /** HOF REFERENCE form of [[minhashSignature]] (numPerm separate
    * `array_min(transform(...))` passes) — kept as the cross-check for
    * the native kernel; FunctionsSpec pins the two bit-identical. */
  def minhashSignatureHof(hashCol: String, numPerm: Int): Column =
    expr(minhashArraySql(hashCol, numPerm))

  /** Band-geometry twin of [[VectorFns.planesFor]] for MinHash LSH:
    * choose (bands, rowsPerBand) with `bands * rowsPerBand <= numPerm`
    * so band-bucket occupancy tracks the corpus. A band keyed by r
    * minhash values collides two NON-duplicate docs with probability
    * ≈ s0^r (s0 = background Jaccard of unrelated docs), so the
    * expected random collisions against one doc are n * s0^r per band;
    * bounding that by `targetBucketSize` gives
    * `r ≥ log(n / targetBucketSize) / log(1 / s0)`. Wider bands (bigger
    * r) raise precision and shrink buckets; the band count is whatever
    * the signature budget leaves (`numPerm / r`), keeping recall as
    * high as the budget allows. A fixed geometry has the same failure
    * mode as a fixed plane count: per-bucket pair work is quadratic in
    * occupancy, and occupancy grows linearly in n. */
  def minhashGeometryFor(numPerm: Int, n: Long, targetBucketSize: Long,
                         backgroundSim: Double = 0.1): (Int, Int) = {
    require(numPerm > 0 && n > 0 && targetBucketSize > 0,
      "minhashGeometryFor needs positive numPerm, corpus count, target size")
    require(backgroundSim > 0 && backgroundSim < 1,
      "backgroundSim must be in (0, 1)")
    val need = math.log(math.max(1.0, n.toDouble / targetBucketSize)) /
      math.log(1.0 / backgroundSim)
    val rows = math.min(numPerm, math.max(1, math.ceil(need).toInt))
    (math.max(1, numPerm / rows), rows)
  }

  /** 32-bit token hashes (input to [[simhash32FromHashes]]) in the SQL
    * md5 hex round-trip form — retained as the bit-parity cross-check
    * for the native [[graft.functions.TokenHash32]] kernel the hot path
    * uses (FunctionsSpec / KernelPropertiesSpec). */
  def tokenHashes32(tokCol: String): Column =
    expr(s"transform($tokCol, t -> cast(conv(substr(md5(t), 1, 8), 16, 10) as bigint))")

  /** 32-bit SimHash from pre-hashed tokens — the HOF REFERENCE form (32
    * `aggregate` passes, one per bit), kept as the cross-check for the
    * native single-pass kernel [[SimHash32]] that [[simhash32FromText]]
    * uses on the hot path; FunctionsSpec pins the two bit-identical. */
  def simhash32FromHashes(hashCol: String): Column =
    expr(simhashSql(hashCol))
}
