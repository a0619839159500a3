package graft

import org.apache.spark.sql.functions._
import graft.ops.Html

/** HTML text extraction semantics (ops/Html.scala): hand-written
  * expected forms per rule, malformed-markup degradation, plan shape. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def ext(htmls: String*): Seq[(String, Long, String)] = {
    val df = htmls.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "html")
    Html.extract(df, "id", "html").orderBy("id")
      .select("title", "n_links", "text_clean")
      .as[(String, Long, String)].collect().toSeq
  }

  test("script/style vanish whole, tags strip, whitespace collapses") {
    val Seq((title, links, text)) = ext(
      """<html><head><title>T1</title><script>var x = "<p>not text</p>";
        |more lines;</script><style>.a { color: red }</style></head>
        |<body><h1>Head</h1>  <p>body   text</p></body></html>""".stripMargin)
    assert(title == "T1")
    assert(links == 0L)
    assert(text == "Head body text")
  }

  test("entities decode once, &amp; last") {
    val Seq((_, _, text)) = ext(
      "<p>a &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y &amp; z &amp;lt; stays</p>")
    assert(text == "a <tag> \"q\" 's' x y & z &lt; stays")
  }

  test("anchors counted, multi-link docs") {
    val Seq((_, n, text)) = ext(
      "<a href=\"/1\">one</a><a href=\"/2\">two</a><a name=\"x\">anchor-only</a>")
    assert(n == 2L) // name-only <a> is not a hyperlink
    assert(text == "one two anchor-only")
  }

  test("uppercase/mixed-case markup is handled: SCRIPT/STYLE/HEAD drop " +
      "whole, TITLE and A HREF extract") {
    import graft.ops.Html
    // older crawled pages use uppercase tags ubiquitously; the old
    // case-sensitive patterns leaked raw JavaScript/CSS into the
    // training text (r11 self-review)
    val html = "<HTML><HEAD><TITLE>Up</TITLE></HEAD><BODY>" +
      "<SCRIPT>var x=1;</SCRIPT><Style>.c{}</Style><P>hello</P>" +
      "<A HREF=\"/up1\">l</A><a href=\"/lo\">m</a></BODY></HTML>"
    val r = Seq(html).toDF("html").select(
        Html.title(col("html")).as("t"),
        Html.linkCount(col("html")).as("n"),
        Html.visibleText(col("html")).as("v"),
        Html.links(col("html")).as("ls"))
      .as[(String, Long, String, Seq[String])].collect().head
    assert(r._1 == "Up")
    assert(r._2 == 2L)
    assert(r._3 == "hello l m", s"script/style leaked: '${r._3}'")
    assert(r._4 == Seq("/up1", "/lo"))
    // attributed open tags (React Helmet / SSR idiom) still extract
    // (review r12: the bare pattern returned '' for any attributed title)
    val attributed = Seq(
      "<title data-react-helmet=\"true\">My Page</title>").toDF("html")
      .select(Html.title(col("html"))).as[String].collect().head
    assert(attributed == "My Page")
  }

  test("malformed markup degrades without losing following text") {
    val Seq((t1, _, x1), (t2, _, x2)) = ext(
      "<p>before <unclosed after</p> end",
      "no markup at all")
    assert(t1 == "" && x1 == "before end")
    assert(t2 == "" && x2 == "no markup at all")
  }

  test("linkGraph: in-degree over extracted hrefs") {
    val df = Seq(
      (1L, "<a href=\"/a\">x</a><a href=\"/b\">y</a><a href=\"/a\">z</a>"),
      (2L, "<a href=\"/a\">w</a>"),
      (3L, "no links")).toDF("id", "html")
    val got = Html.linkGraph(df, "id", "html").orderBy("target")
      .as[(String, Long, Long)].collect().toSeq
    // /a: 3 refs from 2 docs (doc 1 links it twice); /b: 1 ref
    assert(got == Seq(("/a", 3L, 2L), ("/b", 1L, 1L)))
  }

  test("extraction plan is map-only: no exchange, no join, no UDF") {
    val df = Seq((1L, "<p>x</p>")).toDF("id", "html")
    val plan = Html.extract(df, "id", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join")
      && !plan.toLowerCase.contains("batchevalpython"))
  }
}
