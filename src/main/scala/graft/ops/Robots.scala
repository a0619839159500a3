package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL admission — the crawl-frontier gate that
  * sits in front of every fetch (REP, RFC 9309). Complements the WARC
  * ingest path ([[graft.sources.Warc]]): robots decides what may be
  * fetched, WARC carries what was.
  *
  * Everything is declarative (windows + host-keyed joins — no UDFs, no
  * driver loops), so both stages are SQL-replayable and the DuckDB
  * oracle can replay the full parse→match pipeline. Scale shape: one
  * robots.txt per host (the rules table is hosts×rules — tiny next to
  * a frontier), so [[filterAllowed]] is a broadcast-ready equi-join on
  * host; the per-URL longest-match argmax is a window over that join's
  * matches, keyed by URL. Nothing is ever all-pairs and the frontier
  * never shuffles on anything but its own host/url keys.
  *
  * Reference scope note: the reference engine has no crawl surface;
  * this is part of the training-data-pipeline extension.
  */
object Robots {

  /** Parse per-host robots.txt into `(host, prefix, allow)` rules for
    * the given agent (default `*`), implementing the REP grammar
    * subset that governs admission:
    *
    *  - lines are `key: value`, `#` starts a comment, blanks ignored;
    *  - consecutive `User-agent` lines open ONE group; the group's
    *    rules apply if ANY of its agents matches (exact, or `*`);
    *  - `Allow` / `Disallow` lines carry a path prefix; an EMPTY
    *    `Disallow:` means "nothing disallowed" and yields no rule
    *    (RFC 9309 §2.2.2), so it simply drops out;
    *  - other keys (`Crawl-delay`, `Sitemap`, …) are ignored here.
    *
    * Output: one row per rule — (host, prefix, allow: boolean). */
  def parseRobots(robots: DataFrame, hostCol: String, txtCol: String,
      agent: String = "*"): DataFrame = {
    val grouped = groupedLines(robots, hostCol, txtCol)
    grouped
      .where(col("key").isin("allow", "disallow") && col("value") =!= "")
      .join(matchingGroups(grouped, agent), Seq("host", "gid"), "left_semi")
      .select(col("host"), col("value").as("prefix"),
        (col("key") === "allow").as("allow"))
      .distinct()
  }

  /** Shared robots.txt line grammar: strip comments/blanks, split
    * `key: value`, and assign REP group ids — a User-agent line starts
    * a NEW group only if the previous kv line was not also a
    * User-agent line (consecutive UA lines share one group). */
  private def groupedLines(robots: DataFrame, hostCol: String,
      txtCol: String): DataFrame = {
    val byLine = Window.partitionBy(col("host")).orderBy(col("line_no"))
    robots
      .select(col(hostCol).as("host"),
        // RFC 9309 NL is CR, LF, or CRLF: splitting on bare \n left a
        // trailing \r on every Windows-served robots.txt line that
        // trim() (ASCII space only) never removed — rule prefixes and
        // User-agent values silently matched nothing (r11 self-review)
        posexplode(split(col(txtCol), "\r\n|\r|\n"))
          .as(Seq("line_no", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .where(col("line") =!= "" && col("line").contains(":"))
      .withColumn("key", lower(trim(substring_index(col("line"), ":", 1))))
      .withColumn("value",
        trim(expr("substring(line, instr(line, ':') + 1)")))
      .withColumn("is_ua", col("key") === "user-agent")
      .withColumn("new_group",
        (col("is_ua") &&
          !coalesce(lag(col("is_ua"), 1).over(byLine), lit(false)))
          .cast("int"))
      .withColumn("gid", sum(col("new_group")).over(byLine))
  }

  /** (host, gid) pairs of the groups that GOVERN `agent` under RFC
    * 9309 §2.2.1: the most specific match wins per host — groups whose
    * agent token equals `agent` (case-insensitively, as the RFC
    * requires) when any exist, otherwise the host's `*` groups. The
    * previous union of both let a `*` group's longer Allow override an
    * exact group's Disallow — a compliance violation. */
  private def matchingGroups(grouped: DataFrame, agent: String): DataFrame = {
    val ua = grouped.where(col("is_ua"))
      .select(col("host"), col("gid"),
        (lower(col("value")) ===
          agent.toLowerCase(java.util.Locale.ROOT)).as("_exact"),
        (col("value") === "*").as("_star"))
    val exact = ua.where(col("_exact"))
      .select(col("host"), col("gid")).distinct()
    val star = ua.where(col("_star"))
      .join(exact.select(col("host")).distinct(), Seq("host"), "left_anti")
      .select(col("host"), col("gid")).distinct()
    exact.unionByName(star)
  }

  /** Admission verdict per URL under [[parseRobots]] rules, with the
    * REP precedence: among rules whose prefix matches the URL's path,
    * the LONGEST prefix wins; at equal length `Allow` beats `Disallow`
    * (RFC 9309 §2.2.2). A URL whose host has no matching rule — or no
    * robots.txt at all — is allowed (crawl-by-default).
    *
    * `urls` must carry a unique row key `idCol` (a frontier always has
    * one — the URL itself or a crawl id; NEVER a synthesized
    * monotonically_increasing_id, whose mid-plan nondeterminism under
    * task retry can mispair rows) plus (hostCol, pathCol); the result
    * is the input plus an `allowed` boolean. Join is host-keyed; the
    * argmax is one window over the match rows keyed by `idCol`. */
  def filterAllowed(urls: DataFrame, rules: DataFrame, hostCol: String,
      pathCol: String, idCol: String): DataFrame = {
    // RFC 9309 §2.2.3 special characters: '*' matches any char run and
    // a trailing '$' anchors the end — crawlers MUST support both, and
    // the previous literal startsWith treated "/*.pdf$"-style rules as
    // ordinary bytes that matched nothing (every URL they were meant to
    // block was admitted). Plain prefixes keep the cheap startsWith;
    // rules carrying a special compile to an anchored regex per match
    // row (rules are hosts x rules — tiny next to the frontier).
    val hasDollar = col("prefix").endsWith("$")
    val body = when(hasDollar,
      expr("substring(prefix, 1, length(prefix) - 1)")).otherwise(col("prefix"))
    val quoted = regexp_replace(body,
      "([\\\\.\\^\\$\\+\\?\\(\\)\\[\\]\\{\\}\\|])", "\\\\$1")
    val pattern = concat(lit("^"),
      regexp_replace(quoted, "\\*", ".*"),
      when(hasDollar, lit("$")).otherwise(lit("")))
    val matches = urls.select(col(idCol), col(hostCol), col(pathCol))
      .join(rules.withColumnRenamed("host", hostCol),
        Seq(hostCol), "left")
      .withColumn("_plain",
        !col("prefix").contains("*") && !hasDollar)
      .withColumn("_pat", when(!col("_plain"), pattern))
      .where(col("prefix").isNull ||
        when(col("_plain"), col(pathCol).startsWith(col("prefix")))
          .otherwise(expr(s"`$pathCol` RLIKE _pat")))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(
          // longest matching prefix first; allow beats disallow on ties;
          // NULL prefix (no robots for the host) sorts last
          coalesce(length(col("prefix")), lit(-1)).desc,
          col("allow").desc)))
      .where(col("_rn") === 1)
      .select(col(idCol),
        coalesce(col("allow"), lit(true)).as("allowed"))
    urls.join(matches, Seq(idCol), "left")
      // rules existed for the host but none prefix-matched: the where
      // dropped every joined row -> no match row; crawl-by-default
      .withColumn("allowed", coalesce(col("allowed"), lit(true)))
  }

  /** Per-host politeness: the `Crawl-delay` (seconds) each host's
    * matching group declares for `agent`, as (host, crawl_delay_s).
    * Multiple matching declarations take the MAX (the conservative
    * reading); hosts that declare none are absent — join `left` and
    * coalesce to your default. Unparseable values are ignored. Feeds
    * the per-host rate-limit window (the q_rate_limit shape) to turn
    * policy into a fetch schedule. */
  def crawlDelays(robots: DataFrame, hostCol: String, txtCol: String,
      agent: String = "*"): DataFrame = {
    val grouped = groupedLines(robots, hostCol, txtCol)
    grouped
      .where(col("key") === "crawl-delay")
      .join(matchingGroups(grouped, agent), Seq("host", "gid"), "left_semi")
      .withColumn("delay", expr("try_cast(value AS LONG)"))
      .where(col("delay").isNotNull && col("delay") >= 0)
      .groupBy(col("host"))
      .agg(max(col("delay")).as("crawl_delay_s"))
  }

  /** Sitemap URL discovery: extract every `<loc>` entry from sitemap
    * XML payloads — the OTHER half of the frontier (robots gates,
    * sitemaps feed). One row per (host, url); regexp-based on purpose
    * (sitemap <loc> is flat by spec — no nesting, entity-escaped
    * URLs), per-row inside the scan, dedup'd host-wide. The four
    * XML-mandated entities in URLs (&amp; &apos; &quot; &lt;/&gt;)
    * are unescaped. */
  def sitemapUrls(sitemaps: DataFrame, hostCol: String,
      xmlCol: String): DataFrame = {
    val locs = regexp_extract_all(col(xmlCol),
      lit("(?s)<loc>\\s*(.*?)\\s*</loc>"), lit(1))
    sitemaps
      .select(col(hostCol).as("host"), explode(locs).as("url_raw"))
      .select(col("host"),
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(col("url_raw"), "&lt;", "<"), "&gt;", ">"),
          "&quot;", "\""), "&apos;", "'"), "&amp;", "&").as("url"))
      .where(col("url") =!= "")
      .distinct()
  }
}
