package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and URL-level dedup — the cheapest dedup pass a
  * web-scale corpus gets (RefinedWeb/CCNet run it before any content
  * hashing): two crawls of the same page differ only in tracking params,
  * fragment, host case, or a default port, and collapsing those up front
  * removes whole-document work downstream.
  *
  * The canonical form is computed by a pure per-row regexp chain —
  * codegen'd string expressions, no UDF, no shuffle; the only exchange in
  * [[urlDedup]] is the canonical-key aggregation, which moves one
  * (canonical, id) pair per row and one row per canonical key out. The
  * regex subset is deliberately RE2-safe (no lookaround, no backrefs in
  * patterns) so the identical semantics replay in engines that use RE2.
  *
  * Normalizations applied (absolute http(s)-style URLs):
  *   - fragment dropped (`#...`)
  *   - scheme and host:port lowercased; the scheme's OWN default port dropped (`:80` for http, `:443` for https — never cross-scheme)
  *   - tracking params removed (`utm_*`, `gclid`, `fbclid`), the
  *     separator of the first surviving param repaired back to `?`
  *   - empty query tails (`?`/`&`) and one trailing `/` dropped
  * Deliberately NOT done (documented limits): query-param reordering,
  * percent-decoding, userinfo/IDN handling — those need a real URL
  * parser, and a canonicalizer that is wrong on exotic URLs is worse
  * than one that is conservative. A URL with no `scheme://` gets the
  * fragment/tracking/tail steps only (nothing to lowercase safely). */
object Urls {

  private val TrackingParam = "[?&](utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&#]*"

  /** Shared tail of the chain: tracking-param strip, separator repair,
    * empty-tail and trailing-slash strip. */
  private def stripTail(u: Column): Column = {
    val noTrack = regexp_replace(u, TrackingParam, "")
    // a surviving first param may now lead with '&' (its '?' was removed
    // with a tracking param): repair exactly that '&' back to '?'
    val fixedSep = regexp_replace(noTrack, "^([^?&#]*)&", "$1?")
    regexp_replace(regexp_replace(fixedSep, "[?&]+$", ""), "/$", "")
  }

  /** Canonical form of `url` as a Column expression (see object doc). */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostRaw = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    // only the scheme's OWN default port is redundant: stripping :443
    // from an http URL (or :80 from https) collapsed genuinely distinct
    // endpoints onto one canonical form and urlDedup dropped real
    // documents (r11 self-review)
    val host = when(lower(scheme) === "http",
        regexp_replace(hostRaw, ":80$", ""))
      .when(lower(scheme) === "https",
        regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    val pathq = stripTail(regexp_replace(rest, "^[^/?#]*", ""))
    when(scheme === "", stripTail(noFrag))
      .otherwise(concat(lower(scheme), lit("://"), host, pathq))
  }

  /** URL-level dedup: one row per canonical URL with the kept (minimum)
    * id and the duplicate count. Keep-min is deterministic across runs,
    * retries, and engines; the full row for the keeper re-attaches with
    * one semi-join on `idCol` if needed — this op moves ids only. */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(canonicalize(col(urlCol)).as("canonical_url"), col(idCol))
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Cross-host mirror detection: content served BYTE-IDENTICAL from
    * two or more hosts (mirrors, CDNs, scraper re-hosts) — the
    * between-site counterpart of [[urlDedup]]'s within-site collapse.
    * Crawl dedup needs both: a mirror burns budget on every host that
    * serves it.
    *
    * One row per mirrored content fingerprint: (content_fp, n_hosts,
    * hosts) with `hosts` '|'-joined sorted (a SORTABLE SCALAR, the
    * comparator convention). Pages collapse to distinct (host, fp)
    * FIRST, so the grouped aggregation runs at host×content
    * cardinality and only 16-byte fingerprints ever shuffle — payload
    * never leaves the scan stage. */
  /** Recrawl scheduling from observed change rates: given a fetch
    * history (url key, fetch order, content fingerprint), estimate how
    * often each URL's content actually changes — the freshness signal
    * a crawler uses to spend budget where pages move and skip where
    * they don't. A change is a TRANSITION (fp differs from the
    * previous fetch's, A→B→A counts twice), not distinct-count, so
    * oscillating pages rank as hot as steadily-moving ones.
    *
    * Output per URL: n_fetches, n_changes, and
    * `change_rate_micros` = 1e6·changes div (fetches-1) — exact
    * integers end to end. Single-fetch URLs rate 0 (no evidence).
    * One key-keyed shuffle feeds both the lag window and the closing
    * aggregation (same partitioning, no re-exchange); only (key,
    * fetch_no, 16-byte fp) rows move, never page content. */
  def recrawlPriorities(history: DataFrame, urlCol: String,
      fetchNoCol: String, fpCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(urlCol)).orderBy(col(fetchNoCol))
    history
      .withColumn("_chg",
        (col(fpCol) =!= lag(col(fpCol), 1).over(w)).cast("long"))
      .groupBy(col(urlCol))
      .agg(count(lit(1)).as("n_fetches"),
        coalesce(sum(col("_chg")), lit(0L)).as("n_changes"))
      .withColumn("change_rate_micros",
        expr("CASE WHEN n_fetches > 1 " +
          "THEN (1000000 * n_changes) div (n_fetches - 1) ELSE 0 END"))
  }

  def mirrorReport(pages: DataFrame, hostCol: String,
      contentCol: String): DataFrame =
    pages
      .select(col(hostCol).as("host"),
        md5(col(contentCol).cast("binary")).as("content_fp"))
      .distinct()
      .groupBy(col("content_fp"))
      .agg(count(lit(1)).as("n_hosts"),
        array_join(array_sort(collect_set(col("host"))), "|").as("hosts"))
      .where(col("n_hosts") >= 2)
}
