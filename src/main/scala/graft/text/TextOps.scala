package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expressions for large-scale training-data pipelines:
  * tokenization, quality scoring, n-gram-heuristic language ID, and
  * document fingerprinting. All are composed from codegen'd built-in
  * higher-order functions (`split`/`filter`/`transform`/`aggregate`) —
  * no UDFs, so they stay inside whole-stage codegen and scale linearly
  * with a plain projection over 100 TB of text.
  */
object TextOps {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish sub-token split: words plus standalone punctuation marks,
    * the usual pre-tokenizer regex family.
    */
  def roughTokens(text: Column): Column =
    filter(split(text, "(?=[^\\w])|(?<=[^\\w])"), t => trim(t) =!= "")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Mean token length, derived from char count minus separators. */
  def avgWordLen(text: Column): Column = {
    val n = size(tokens(text))
    (length(text) - (n - lit(1))).cast("double") / n
  }

  /** Fraction of tokens found in `words` (stopword density — a standard
    * fluency signal in quality filters).
    */
  def wordRatio(text: Column, words: Seq[String]): Column =
    hitCount(text, words).cast("double") / size(tokens(text))

  /** Count of tokens found in `words`. */
  def hitCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit): _*))).cast("long")

  /** Count of tokens longer than `n` chars. */
  def longWordCount(text: Column, n: Int): Column =
    size(filter(tokens(text), t => length(t) > n)).cast("long")

  /** Punctuation density: punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") / length(text)

  /** Language-marker word lists for the n-gram/stopword language-ID
    * heuristic. Deterministic constants; extend per deployment.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "it"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "es" -> Seq("el", "la", "los", "las", "que", "un", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "nicht"),
    "zh" -> Seq("de", "shi", "bu", "le", "ren", "wo", "zai", "you"))

  /** Per-language marker hit-count columns, aliased `score_<lang>`. */
  def langScores(text: Column): Seq[Column] =
    LangMarkers.map { case (lang, words) => hitCount(text, words).as(s"score_$lang") }

  /** Arg-max language with deterministic priority order on ties (list
    * order above). Expects the `score_<lang>` columns to be in scope.
    */
  def langIdFromScores: Column = {
    val langs = LangMarkers.map(_._1)
    langs.init.foldRight(lit(langs.last)) { (lang, rest) =>
      val mine = col(s"score_$lang")
      val ge = langs.filterNot(_ == lang)
        .map(o => mine >= col(s"score_$o")).reduce(_ && _)
      when(ge, lit(lang)).otherwise(rest)
    }
  }

  /** Polynomial rolling-hash fingerprint over the character stream
    * (base 31 mod 1e9+7). Order-sensitive — "ab c" and "ba c" differ —
    * and engine-portable (no overflow: the accumulator stays < 2^35).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % 1000000007L)

  /** Token n-gram shingles ("w1 w2 w3" strings) — the MinHash unit. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
}
