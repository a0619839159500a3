package graft

import org.apache.spark.sql.functions._
import graft.ops.Urls

/** URL canonicalization semantics (ops/Urls.scala) — hand-written
  * expected forms for every normalization rule and the documented
  * non-rules. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalize(col("u"))).as[String].collect().toSeq

  test("case, default ports, fragments, tracking params collapse") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/A/b?utm_source=x&id=3#frag",
      "https://www.example.com/A/b?id=3",
      "HTTP://host:80/p/",
      "http://host/p",
      "https://h.io/x?utm_a=1&utm_b=2",
      "https://h.io/x/"
    ) == Seq(
      "https://www.example.com/A/b?id=3", // path case PRESERVED, host lowered
      "https://www.example.com/A/b?id=3",
      "http://host/p",
      "http://host/p",
      "https://h.io/x",
      "https://h.io/x"))
  }

  test("only the scheme's OWN default port is stripped") {
    import graft.ops.Urls
    // http-on-443 / https-on-80 are real, distinct endpoints — the old
    // scheme-blind strip merged them with the default-port URL and
    // urlDedup dropped genuine documents (r11 self-review)
    val got = Seq(
      "http://h.example:80/a", "http://h.example:443/a",
      "https://h.example:443/a", "https://h.example:80/a")
      .toDF("url").select(Urls.canonicalize(col("url")))
      .as[String].collect().toSeq
    assert(got == Seq(
      "http://h.example/a", "http://h.example:443/a",
      "https://h.example/a", "https://h.example:80/a"), s"got $got")
  }

  test("separator repair: first surviving param gets '?' back") {
    assert(canon("https://h/p?utm_x=1&keep=2&gclid=g&also=3")
      == Seq("https://h/p?keep=2&also=3"))
    assert(canon("https://h/p?fbclid=abc&a=1") == Seq("https://h/p?a=1"))
  }

  test("non-default port, non-tracking params, deep paths survive") {
    assert(canon("https://h:8443/a//b?x=1&y=2")
      == Seq("https://h:8443/a//b?x=1&y=2"))
  }

  test("schemeless input gets tail normalization only") {
    assert(canon("example.com/p/?utm_s=1#f", "no scheme here")
      == Seq("example.com/p", "no scheme here"))
  }

  test("root URL and bare host") {
    assert(canon("https://Host.com/", "https://Host.com")
      == Seq("https://host.com", "https://host.com"))
  }

  test("urlDedup collapses raw variants to one canonical row, keep-min id") {
    val df = Seq(
      (3L, "HTTPS://A.com:443/x?utm_c=1"),
      (1L, "https://a.com/x"),
      (2L, "https://a.com/x/#top"),
      (9L, "https://b.com/y")).toDF("doc_id", "url")
    val got = Urls.urlDedup(df, "url", "doc_id")
      .orderBy("canonical_url")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("https://a.com/x", 1L, 3L), ("https://b.com/y", 9L, 1L)))
  }

  test("mirrorReport finds cross-host byte-identical content only") {
    val pages = Seq(
      ("a.com", "same content"), ("b.com", "same content"),
      ("c.com", "same content"),
      ("a.com", "same content"),     // same host twice: not a mirror fact
      ("a.com", "only here"),
      ("b.com", "also only here")).toDF("host", "text")
    val got = Urls.mirrorReport(pages, "host", "text")
      .as[(String, Long, String)].collect().toSeq
    assert(got.length == 1)
    assert(got.head._2 == 3L && got.head._3 == "a.com|b.com|c.com")
  }

  test("recrawlPriorities counts transitions, not distinct versions") {
    val history = Seq(
      // oscillating page: A->B->A = 2 changes over 3 fetches
      (1L, 0, "A"), (1L, 1, "B"), (1L, 2, "A"),
      // static page: 0 changes
      (2L, 0, "X"), (2L, 1, "X"), (2L, 2, "X"),
      // single observation: no evidence, rate 0
      (3L, 0, "Y")).toDF("url_id", "fetch_no", "content_fp")
    val got = Urls.recrawlPriorities(history,
        "url_id", "fetch_no", "content_fp")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((3L, 2L, 1000000L)),
      2L -> ((3L, 0L, 0L)),
      3L -> ((1L, 0L, 0L))), s"got $got")
  }

  test("canonicalization plan is join-free and exchange-free") {
    val df = Seq((1L, "https://a.com/x")).toDF("doc_id", "url")
    val plan = df.select(Urls.canonicalize(col("url")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"))
  }
}
