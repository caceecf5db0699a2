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

  /** Document fingerprint: md5 of lower-cased whitespace-collapsed text
    * (exact-dedup key). */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

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

  /** MinHash signature: array of `numPerm` 60-bit minima over a shingle
    * array column (referenced by name). One transform per permutation —
    * each is a single pass over the (already materialized) shingles. */
  def minhashSignature(shingleCol: String, numPerm: Int): Column = {
    val mins = (0 until numPerm).map { p =>
      s"array_min(transform($shingleCol, s -> " +
        s"cast(conv(substr(md5(concat('$p', ':', s)), 1, 15), 16, 10) as bigint)))"
    }
    expr(mins.mkString("array(", ", ", ")"))
  }

  /** 32-bit token hashes (input to [[simhash32FromHashes]]): computed
    * once into a column so the 32 bit-votes below don't re-hash. */
  def tokenHashes32(tokCol: String): Column =
    expr(s"transform($tokCol, t -> cast(conv(substr(md5(t), 1, 8), 16, 10) as bigint))")

  /** 32-bit SimHash from pre-hashed tokens: per bit, sum +1/-1 votes by
    * the hash's bit value, then pack the sign bits into a bigint. */
  def simhash32FromHashes(hashCol: String): Column = {
    val packed = (0 until 32).map { b =>
      val vote = s"aggregate($hashCol, 0L, (a, x) -> " +
        s"a + (case when (x div ${1L << b}L) % 2 = 1 then 1 else -1 end))"
      s"(case when ($vote) > 0 then ${1L << b}L else 0L end)"
    }.mkString(" + ")
    expr(packed)
  }
}
