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

  /** The common two-label public suffixes (co.uk, com.au, …): an
    * embedded subset of the Public Suffix List covering the
    * multi-label national TLD namespaces a web crawl actually hits in
    * volume. Under the naive last-two-labels rule every `*.co.uk` site
    * collapses to one "domain" key — a domain-keyed blocklist or quota
    * (q202/q214 family) would then cap an entire national namespace as
    * one entity. The full PSL remains a deployment artifact (it
    * changes monthly); this table fixes the practically common case
    * and the boundary is documented.
    */
  val MultiLabelSuffixes: Seq[String] = Seq(
    // UK / IE
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "ltd.uk", "plc.uk",
    // Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    // Japan / Korea / China / Taiwan / Hong Kong / Singapore
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg",
    // South / Southeast Asia
    "co.in", "net.in", "org.in", "ac.in", "edu.in", "gov.in", "gen.in",
    "firm.in", "ind.in",
    "co.id", "net.id", "or.id", "ac.id", "go.id",
    "com.my", "net.my", "org.my", "edu.my",
    "co.th", "net.th", "or.th", "ac.th", "go.th",
    "com.vn", "net.vn", "org.vn", "edu.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph",
    "com.pk", "com.bd",
    // Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "org.mx", "net.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.co", "net.co", "com.pe", "com.ve", "com.uy", "com.ec",
    // Europe / Middle East / Africa
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr",
    "com.pl", "net.pl", "org.pl", "edu.pl",
    "com.ua", "in.ua", "net.ua", "org.ua",
    "co.il", "net.il", "org.il", "ac.il", "gov.il",
    "com.sa", "net.sa", "org.sa", "edu.sa",
    "com.eg", "com.ng", "co.ke",
    "co.za", "net.za", "org.za", "web.za", "gov.za", "ac.za")

  /** Registrable domain: last two dot-labels, EXCEPT when those two
    * labels are themselves a known multi-label public suffix
    * ([[MultiLabelSuffixes]]) — then the last three. A bare suffix
    * host (`co.uk` itself) falls back to the two-label form rather
    * than emitting NULL. Pure codegen'd projection (two anchored
    * regex extracts + an IN over a literal set — no UDF, no shuffle).
    */
  def registrableDomain(url: Column): Column = {
    val h = host(url)
    val last2 = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(last2.isin(MultiLabelSuffixes: _*) && last3 =!= "", last3)
      .otherwise(last2)
  }

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
