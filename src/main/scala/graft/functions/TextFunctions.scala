package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data
  * pipelines: tokenization, shingles, fingerprints, language ID,
  * quality metrics. Everything is composed from built-in codegen'd
  * functions — no UDFs — so plans stay inside whole-stage codegen and
  * scale linearly with rows.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Distinct token set (for set-similarity ops). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** BPE-ish subword token estimate: word tokens plus a char/4 bound —
    * the standard fast estimator when no tokenizer model is loadable. */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text) / lit(4.0)).cast("int")

  /** Tokens from a BPE-ish regex split (alnum runs, lowercased). */
  def regexTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Word k-shingles over the whitespace tokens. Docs with fewer than k
    * tokens yield an empty array (an unguarded sequence(1, size-k+1)
    * would produce a DESCENDING range and crash slice() at runtime). */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    // sequence(1, n) with n < 1 would generate a DESCENDING range (not
    // an empty one), so the short-doc case needs an explicit branch.
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - lit(k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** SQL-string form of [[shingles]] for use inside expr() pipelines. */
  def shinglesSql(textCol: String, k: Int): String = {
    val toks = s"split($textCol, '\\\\s+')"
    s"CASE WHEN size($toks) >= $k THEN " +
      s"transform(sequence(1, size($toks) - ${k - 1}), " +
      s"i -> array_join(slice($toks, i, $k), ' ')) " +
      s"ELSE cast(array() AS array<string>) END"
  }

  /** Polynomial rolling-hash fingerprint of the first `maxChars` chars:
    * h = (h * 31 + code) mod 10^15, folded left-to-right — exact integer
    * arithmetic, so it is engine-portable (oracle computes the same
    * fold with list_reduce).
    */
  def fingerprint(text: Column, maxChars: Int): Column =
    aggregate(
      transform(split(substring(text, 1, maxChars), ""), c => ascii(c)),
      lit(0L),
      (h, c) => pmod(h * lit(31L) + c.cast("long"), lit(1000000000000000L)))

  /** Per-language function-word lists for the language-ID heuristic. */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "los", "que", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Count of tokens belonging to `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** n-gram-heuristic language ID: score each language by function-word
    * hits, predict the argmax with a deterministic preference order. */
  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** langId over an already-tokenized column — use when the caller
    * has projected the token array once and reuses it (re-splitting
    * the text per language score is the expensive path). */
  def langIdFromTokens(toks: Column): Column = {
    val order = Seq("en", "de", "es", "fr", "zh")
    val scores = order.map(l => stopwordHits(toks, langStopwords(l)))
    val best = scores.reduce((a, b) => greatest(a, b))
    order.zip(scores).foldRight(lit("unknown")) { case ((l, s), els) =>
      when(s === best && best > 0, lit(l)).otherwise(els)
    }
  }
}
