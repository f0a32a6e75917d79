package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-page text extraction — the step between a crawl and every other
  * text operator in this library: strip markup, drop boilerplate
  * blocks (script/style/nav/footer/…), decode the common entities, and
  * compute the link-density signal boilerplate classifiers key on
  * (jusText/trafilatura's core heuristic: navigation-heavy blocks are
  * link-dense, content blocks are not).
  *
  * Everything here is a PURE PROJECTION over codegen'd string
  * expressions — no shuffle, no UDF, no state; at 100 TB this runs at
  * scan speed inside whole-stage codegen. Regex subset chosen for
  * cross-engine parity (Java regex on the Spark side, RE2 in the SQL
  * oracle twins): inline `(?s)`, non-greedy `.*?`, character classes —
  * no backrefs, no lookaround.
  *
  * Boundary (documented like the media decoders'): this is the
  * regex-grade extractor for pipeline curation signals, not a
  * spec-complete HTML5 parser — CDATA, comments containing tags, and
  * malformed nesting degrade to extra whitespace, never to a crash.
  */
object Html {
  /** Blocks that are navigation/markup, never content (`head` included:
    * a page's title is metadata, not body text — [[extractTitle]] reads
    * it separately from the raw page).
    */
  val BoilerplateTags: Seq[String] =
    Seq("script", "style", "head", "nav", "footer", "header", "aside")

  /** Remove whole `<tag …>…</tag>` blocks (content and all). The open
    * pattern requires `>` or whitespace right after the tag name so
    * `head` never swallows `<header>`.
    */
  def dropBlocks(html: Column, tags: Seq[String]): Column =
    tags.foldLeft(html)((h, t) =>
      regexp_replace(h, s"(?s)<$t(>|\\s[^>]*>).*?</$t>", " "))

  /** Replace every remaining tag with a space (word-boundary safe:
    * `a</p><p>b` must not fuse into `ab`).
    */
  def stripTags(html: Column): Column =
    regexp_replace(html, "<[^>]*>", " ")

  /** Decode the six entities that dominate real corpora. `&amp;` LAST —
    * decoding it first would double-decode `&amp;lt;`.
    */
  def decodeEntities(s: Column): Column = {
    val pairs = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    pairs.foldLeft(s)((c, p) => regexp_replace(c, p._1, p._2))
  }

  /** Collapse runs of whitespace and trim. */
  def normalizeWs(s: Column): Column =
    trim(regexp_replace(s, "\\s+", " "))

  /** The full content-text pipeline: boilerplate blocks out, tags to
    * spaces, entities decoded, whitespace normalized.
    */
  def extractText(html: Column): Column =
    normalizeWs(decodeEntities(stripTags(dropBlocks(html, BoilerplateTags))))

  /** Page text with navigation KEPT (only script/style dropped) — the
    * denominator of [[linkDensity]]: nav links are exactly what the
    * density signal must see.
    */
  def pageText(html: Column): Column =
    normalizeWs(decodeEntities(stripTags(
      dropBlocks(html, Seq("script", "style", "head")))))

  /** First `<title>` contents (empty string when absent). */
  def extractTitle(html: Column): Column =
    regexp_extract(html, "<title>([^<]*)</title>", 1)

  /** Number of anchors on the raw page (match counting, not
    * length-difference arithmetic — the latter silently breaks when
    * the needle length drifts from the divisor).
    */
  def linkCount(html: Column): Column =
    size(regexp_extract_all(html, lit("<a[\\s>]"), lit(0))).cast("long")

  /** Characters of anchor inner text (plain-text anchors). */
  def linkChars(html: Column): Column =
    length(array_join(
      regexp_extract_all(html, lit("(?s)<a[^>]*>([^<]*)</a>"), lit(1)), " "))
      .cast("long")

  /** Linked characters / page-text characters — the boilerplate
    * signal; ∈ [0, ~1], high for navigation shells.
    */
  def linkDensity(html: Column): Column =
    linkChars(html).cast("double") /
      greatest(length(pageText(html)), lit(1)).cast("double")
}
