package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

class UrlsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Urls.canonicalize(col("u")))
      .as[String].collect().head

  test("the three crawl spellings of one page collapse to one key") {
    val a = canon("HTTP://WWW.Site.COM:80/p/?utm_source=f&b=2&a=1#top")
    val b = canon("http://site.com/p?a=1&b=2")
    val c = canon("http://Site.com:80/p?b=2&gclid=xyz&a=1")
    assert(a == "http://site.com/p?a=1&b=2")
    assert(b == a && c == a)
  }

  test("paths stay case-sensitive; only scheme and host fold") {
    assert(canon("HTTPS://EX.COM/CaseSensitive/Path") ==
      "https://ex.com/CaseSensitive/Path")
  }

  test("default ports strip per scheme; explicit ports survive") {
    assert(canon("https://ex.com:443/x") == "https://ex.com/x")
    assert(canon("http://ex.com:8080/x") == "http://ex.com:8080/x")
    assert(canon("https://ex.com:80/x") == "https://ex.com:80/x",
      ":80 is NOT the https default")
  }

  test("empty path becomes /; root slash is kept; fragment dropped") {
    assert(canon("http://ex.com") == "http://ex.com/")
    assert(canon("http://ex.com/#frag") == "http://ex.com/")
  }

  test("tracking params go, the rest sort; bare click-ids go too") {
    assert(canon("http://e.com/p?z=1&ref=tw&utm_medium=m&a=2&fbclid=q") ==
      "http://e.com/p?a=2&z=1")
    assert(canon("http://e.com/p?ref") == "http://e.com/p",
      "a valueless tracking key still identifies the request")
  }

  test("crawl garbage canonicalizes to NULL, never a shared key") {
    val got = Seq("not a url", "ftp//broken", "http://ok.com/x")
      .toDF("u").select(Urls.canonicalize(col("u")))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(None, None, Some("http://ok.com/x")),
      "two garbage strings must not dedup-collide on '://'")
  }

  test("host and registrable domain") {
    val df = Seq("https://www.a.b.example.co:443/x").toDF("u")
    val (h, d) = df.select(Urls.host(col("u")), Urls.registrableDomain(col("u")))
      .as[(String, String)].collect().head
    assert(h == "a.b.example.co")
    assert(d == "example.co")
  }

  test("multi-label public suffixes take three labels, never collapse") {
    // the q202/q214 failure mode the suffix table exists for: under
    // the naive last-two rule every *.co.uk site keyed as 'co.uk' and
    // a domain blocklist capped the whole namespace as one entity
    def dom(u: String): String =
      Seq(u).toDF("u").select(Urls.registrableDomain(col("u")))
        .as[String].collect().head
    assert(dom("http://www.news.bbc.co.uk/x") == "bbc.co.uk")
    assert(dom("https://shop.example.com.au/") == "example.com.au")
    assert(dom("http://a.b.mycorp.co.jp/p") == "mycorp.co.jp")
    assert(dom("https://lojas.site.com.br/") == "site.com.br")
    // distinct sites stay distinct keys
    assert(dom("http://alpha.co.uk/") != dom("http://beta.co.uk/"))
    // plain gTLDs keep the two-label rule
    assert(dom("https://sub.deep.example.com/") == "example.com")
    // a bare suffix host falls back to two labels, not NULL
    assert(dom("http://co.uk/") == "co.uk")
  }
}
