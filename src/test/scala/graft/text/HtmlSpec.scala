package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

class HtmlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def run(html: String, c: org.apache.spark.sql.Column): String =
    Seq(html).toDF("h").select(c.cast("string")).as[String].collect().head

  test("extractText: boilerplate out, body and inline anchor text kept") {
    val page = "<html><head><title>T</title><style>p{x}</style></head>" +
      "<body><script>var a=1;</script><nav><a href=\"/\">home</a></nav>" +
      "<p>hello <b>bold</b> world</p><a href=\"/m\">more</a>" +
      "<footer>foot</footer></body></html>"
    assert(run(page, Html.extractText(col("h"))) == "hello bold world more")
  }

  test("head block never swallows header (and both are boilerplate)") {
    val page = "<body><header>site chrome</header><p>content</p>" +
      "<head>meta</head></body>"
    assert(run(page, Html.extractText(col("h"))) == "content")
  }

  test("entity decode order: &amp;lt; decodes to the LITERAL '&lt;'") {
    // the classic double-decode bug: &amp;lt; means the four characters
    // "&lt;" in the source text, NOT "<"
    assert(run("a &amp;lt; b", Html.decodeEntities(col("h"))) == "a &lt; b")
    assert(run("x &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;y",
      Html.decodeEntities(col("h"))) == "x <tag> \"q\" 's' y")
  }

  test("linkCount counts <a> and <a href=...>, never <abbr>") {
    val page = "<a href=\"/x\">x</a><abbr>ab</abbr><a>bare</a><a\nhref=\"/y\">y</a>"
    assert(run(page, Html.linkCount(col("h"))) == "3")
  }

  test("link density separates a nav shell from a content page") {
    val shell = "<body><nav><a href=\"/a\">aaaa</a><a href=\"/b\">bbbb</a>" +
      "</nav>x</body>"
    val content = "<body><p>" + ("word " * 50) + "</p>" +
      "<a href=\"/m\">more</a></body>"
    val dShell = run(shell, Html.linkDensity(col("h"))).toDouble
    val dContent = run(content, Html.linkDensity(col("h"))).toDouble
    assert(dShell > 0.7, s"nav shell density $dShell")
    assert(dContent < 0.1, s"content density $dContent")
  }

  test("extractTitle reads head metadata; empty when absent") {
    assert(run("<head><title>My Page</title></head>",
      Html.extractTitle(col("h"))) == "My Page")
    assert(run("<p>no title</p>", Html.extractTitle(col("h"))) == "")
  }

  test("the whole extractor stays a single codegen'd projection") {
    // a real scan (range), not a literal local table the optimizer
    // would constant-fold into a LocalTableScan
    val df = spark.range(4)
      .select(concat(lit("<p>x"), col("id").cast("string"),
        lit("</p>")).as("h"))
      .select(Html.extractText(col("h")).as("t"),
        Html.linkDensity(col("h")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(1) Project" = the projection runs inside WholeStageCodegen
    // stage 1, fused with the scan
    assert(plan.contains("*(1) Project"), plan.take(800))
    assert(!plan.contains("Exchange"), "a projection must not shuffle")
  }
}
