package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training-text extraction — the step between a raw crawl and
  * every text operator in this library (C4/CCNet run exactly this before
  * any quality or dedup pass): drop script/style machinery, strip markup,
  * decode the entities that actually occur at volume, collapse
  * whitespace. Everything is a per-row chain of codegen'd string
  * expressions — no UDF, no shuffle, no parser state; at 100 TB this is
  * a map-only pass that pipelines inside the scan stage.
  *
  * The regex subset is RE2-safe (non-greedy `[\s\S]*?` instead of
  * DOTALL, no lookaround/backrefs) so the identical semantics replay in
  * RE2-based engines. Deliberately NOT a browser: no nesting awareness,
  * no CSS visibility, no charset sniffing — a tag-stripper that is
  * simple enough to be exactly reproducible beats a "smart" extractor
  * that can't be verified. Malformed markup degrades gracefully (an
  * unclosed `<` drops the tail of its line's markup, text survives). */
object Html {

  /** `<title>` contents ('' when absent). Tag names match
    * case-insensitively — <TITLE>/<Title> markup is ubiquitous in
    * older crawled pages (r11 self-review; all tag patterns here carry
    * (?i), which replays identically in RE2) — and the open tag may
    * carry attributes (<title data-react-helmet="true">, the Helmet/SSR
    * idiom), matched with the same [^>]* allowance the script/style
    * patterns use (review r12: the bare pattern extracted '' from any
    * attributed title). */
  def title(html: Column): Column =
    regexp_extract(html, "(?i)<title[^>]*>([^<]*)</title>", 1)

  /** Anchor count: case-insensitive `<a href` occurrences. */
  def linkCount(html: Column): Column =
    size(regexp_extract_all(html, lit("(?i)<a href"), lit(0))).cast("long")

  /** Visible text: script/style blocks dropped whole, remaining tags
    * stripped, the 6 high-volume entities decoded, whitespace
    * collapsed. */
  def visibleText(html: Column): Column = {
    // the whole <head> is metadata, not content (title/meta/script/style)
    // (?i): uppercase <SCRIPT>/<STYLE>/<HEAD> blocks otherwise leak
    // their raw JavaScript/CSS into the training text — exactly the
    // contamination this extraction exists to remove
    val noHead = regexp_replace(html, "(?i)<head[ >][\\s\\S]*?</head>", " ")
    val noScript = regexp_replace(noHead, "(?i)<script[^>]*>[\\s\\S]*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?i)<style[^>]*>[\\s\\S]*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    // &amp; decodes LAST: the standard order, so '&amp;lt;' becomes the
    // literal text '&lt;' instead of double-decoding to '<'
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Outbound link targets: every `<a href="...">` value, in document
    * order. */
  def links(html: Column): Column =
    regexp_extract_all(html, lit("(?i)<a href=\"([^\"]*)\""), lit(1))

  /** Site link graph: one row per distinct link target with its total
    * reference count and distinct referring documents — the in-degree
    * table a crawl frontier / PageRank-style prior is seeded from.
    * Explode + one target-keyed aggregation; link lists are per-page
    * bounded, so the exploded stream is a small multiple of the page
    * count. */
  def linkGraph(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol), explode(links(col(htmlCol))).as("target"))
      .groupBy(col("target"))
      .agg(count(lit(1)).as("n_refs"),
        countDistinct(col(idCol)).as("n_docs"))

  /** Per-document extraction: (idCol, title, n_links, text_clean,
    * n_chars_clean). */
  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol), title(col(htmlCol)).as("title"),
      linkCount(col(htmlCol)).as("n_links"),
      visibleText(col(htmlCol)).as("text_clean"))
      .withColumn("n_chars_clean", length(col("text_clean")).cast("long"))
}
