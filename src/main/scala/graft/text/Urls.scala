package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the key extractor for crawl-level dedup and
  * domain curation: the same page arrives under `HTTP://WWW.Site.COM:80
  * /p/?utm_source=feed&b=2&a=1#top` and `http://site.com/p?a=1&b=2`,
  * and a URL-keyed dedup or frontier only works after both collapse to
  * one canonical form. Rules (the standard crawl-dedup set): lowercase
  * scheme and host, strip default ports and a leading `www.`, drop the
  * fragment, drop tracking parameters (`utm_*` and the click-id set),
  * sort the surviving query parameters, collapse a trailing slash.
  * Paths stay case-sensitive (RFC 3986: only scheme and host are
  * case-insensitive).
  *
  * Pure codegen'd projections (regex + array HOFs — no UDF, no
  * shuffle); the regex subset is Java/RE2-portable so every rule has
  * an exact SQL oracle twin. Boundary: no IDN/percent-encoding
  * normalization and no userinfo handling — the curation-grade
  * canonicalizer, not a URL library.
  */
object Urls {
  /** scheme://authority path ?query #fragment */
  private val P = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  /** Query-parameter keys that identify the request, not the resource. */
  val TrackingKeys: Seq[String] = Seq("gclid", "fbclid", "msclkid", "ref")

  def scheme(url: Column): Column = lower(regexp_extract(url, P, 1))

  /** Lowercased host: default port and leading `www.` stripped. */
  def host(url: Column): Column = {
    val raw = lower(regexp_extract(url, P, 2))
    val noPort = when(scheme(url) === "http", regexp_replace(raw, ":80$", ""))
      .when(scheme(url) === "https", regexp_replace(raw, ":443$", ""))
      .otherwise(raw)
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Naive registrable domain: the last two dot-labels (documented
    * approximation — a public-suffix list is a deployment artifact).
    */
  def registrableDomain(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)

  /** Path with trailing slashes collapsed; empty path becomes `/`. */
  private def canonPath(url: Column): Column = {
    val p = regexp_replace(regexp_extract(url, P, 3), "/+$", "")
    when(p === "", lit("/")).otherwise(p)
  }

  /** Surviving query parameters, sorted (empty array when none). */
  private def canonParams(url: Column): Column = {
    val parts = split(regexp_extract(url, P, 4), "&")
    array_sort(filter(parts, p =>
      p =!= "" &&
        !p.startsWith("utm_") &&
        !substring_index(p, "=", 1).isin(TrackingKeys.map(lit): _*)))
  }

  /** The canonical form — the dedup/frontier key. NULL for a string
    * that is not an absolute URL: crawl garbage must NOT collapse onto
    * one shared `'://'` key, where a URL-keyed dedup would silently
    * merge unrelated documents.
    */
  def canonicalize(url: Column): Column = {
    val params = canonParams(url)
    when(url.rlike(P),
      concat(scheme(url), lit("://"), host(url), canonPath(url),
        when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
          .otherwise(lit(""))))
  }
}
