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
    val byLine = Window.partitionBy(col("host")).orderBy(col("line_no"))
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("line_no", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .where(col("line") =!= "" && col("line").contains(":"))
      .withColumn("key", lower(trim(substring_index(col("line"), ":", 1))))
      .withColumn("value",
        trim(expr("substring(line, instr(line, ':') + 1)")))
      .withColumn("is_ua", col("key") === "user-agent")
    val grouped = lines
      // a User-agent line starts a NEW group only if the previous
      // non-blank line was not also a User-agent line (consecutive UA
      // lines share one group, per the REP grammar)
      .withColumn("new_group",
        (col("is_ua") &&
          !coalesce(lag(col("is_ua"), 1).over(byLine), lit(false)))
          .cast("int"))
      .withColumn("gid", sum(col("new_group")).over(byLine))
    val matchingGroups = grouped
      .where(col("is_ua") &&
        (col("value") === agent || col("value") === "*"))
      .select(col("host"), col("gid")).distinct()
    grouped
      .where(col("key").isin("allow", "disallow") && col("value") =!= "")
      .join(matchingGroups, Seq("host", "gid"), "left_semi")
      .select(col("host"), col("value").as("prefix"),
        (col("key") === "allow").as("allow"))
      .distinct()
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
    val matches = urls.select(col(idCol), col(hostCol), col(pathCol))
      .join(rules.withColumnRenamed("host", hostCol),
        Seq(hostCol), "left")
      .where(col("prefix").isNull ||
        col(pathCol).startsWith(col("prefix")))
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
}
