package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL curation for web-crawl corpora — the front door of every
  * crawl-derived training set (the CCNet/C4 lineage: canonicalize the
  * URL, dedup on the canonical form, bound any single domain's share).
  * Everything here is pure Catalyst expressions over the URL STRING
  * (regexp/split/array ops — codegen'd, no UDF, no java.net.URL driver
  * objects), so the operators run scan-side at 100 TB and an external
  * engine replays them verbatim.
  *
  * Canonicalization (the standard normalizations, RFC 3986 §6 plus
  * crawl-pipeline conventions):
  *   - scheme and host lowercased; leading `www.` stripped
  *   - default ports dropped (`:80` for http, `:443` for https)
  *   - fragment dropped
  *   - tracking params dropped (utm_*, fbclid, gclid, mc_cid, mc_eid,
  *     ref, igshid — the public list every pipeline strips)
  *   - remaining query params sorted (param order is not semantic)
  *   - trailing slash stripped from non-root paths
  *
  * Registered-domain extraction approximates the public-suffix list
  * with the common two-label suffixes (co.uk, com.au, …): exact PSL
  * parity needs the full Mozilla list, which is a data file, not an
  * algorithm — the hook ([[registeredDomain]]'s `twoLevelTlds`
  * parameter) takes a larger set when the caller ships one.
  */
object UrlCurate {

  /** Tracking-parameter NAME PREFIXES dropped by [[canonicalUrl]]
    * (matched against the name before `=`).
    */
  val trackingPrefixes: Seq[String] = Seq("utm_")

  /** Tracking-parameter exact NAMES dropped by [[canonicalUrl]] —
    * exact so `ref` goes but `referrer_policy` stays.
    */
  val trackingNames: Seq[String] =
    Seq("fbclid", "gclid", "mc_cid", "mc_eid", "ref", "igshid")

  /** Common two-label public suffixes for [[registeredDomain]]. */
  val defaultTwoLevelTlds: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
      "co.jp", "co.kr", "co.in", "com.br", "com.cn", "com.mx", "com.sg",
      "co.nz", "com.tr", "co.za")

  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** authority = host[:port], between `://` and the first `/`, `?` or `#`. */
  private def authorityOf(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)

  /** Host: lowercased authority minus any `:port` and a leading `www.`. */
  def hostOf(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(authorityOf(url)), ":[0-9]+$", ""),
      "^www\\.", "")

  private def portOf(url: Column): Column =
    regexp_extract(authorityOf(url), ":([0-9]+)$", 1)

  private def pathOf(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  private def queryOf(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** The canonical form. NULL/empty scheme (a non-URL string) yields
    * NULL — callers filter or route those rows rather than guessing.
    */
  def canonicalUrl(url: Column,
                   dropPrefixes: Seq[String] = trackingPrefixes,
                   dropNames: Seq[String] = trackingNames): Column = {
    val scheme = schemeOf(url)
    val host = hostOf(url)
    val port = portOf(url)
    // default ports vanish; anything else is kept verbatim
    val portPart = when(
      port === "" || (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    // trailing slashes collapse (the root path becomes empty, equating
    // `host/` with `host` — the conventional normalization)
    val path = regexp_replace(pathOf(url), "/+$", "")
    val kept = filter(
      split(queryOf(url), "&"),
      p => {
        val name = substring_index(p, "=", 1)
        val isTracking = (dropPrefixes.map(name.startsWith(_): Column) ++
          Seq(name.isin(dropNames: _*))).reduce(_ || _)
        p =!= "" && !isTracking
      })
    val queryPart = when(size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(kept), "&")))
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  /** Registered domain (site identity for caps/dedup): the last two
    * host labels, or the last THREE when the last two form a known
    * two-level public suffix (`a.b.co.uk` → `b.co.uk`). IP-looking
    * hosts pass through whole.
    */
  def registeredDomain(host: Column,
                       twoLevelTlds: Seq[String] = defaultTwoLevelTlds): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val lastThree = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    val isIp = host.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$")
    when(isIp || n <= 2, host)
      .when(lastTwo.isin(twoLevelTlds: _*), lastThree)
      .otherwise(lastTwo)
  }

  /** Canonical-URL dedup: one row per canonical form, keeping the row
    * with the smallest `idCol` (deterministic, replayable) — the
    * "same page fetched twice with different tracking params" case.
    * Rows whose URL fails to canonicalize (NULL) are all kept: absent
    * a URL identity there is nothing to dedup on.
    */
  def dedupByCanonicalUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val canon = df.withColumn("__canon", canonicalUrl(col(urlCol)))
    val w = Window.partitionBy(col("__canon")).orderBy(col(idCol))
    canon
      .withColumn("__rn",
        when(col("__canon").isNull, lit(1)).otherwise(row_number().over(w)))
      .filter(col("__rn") === 1)
      .drop("__rn", "__canon")
  }

  /** Per-domain cap — the corpus-diversity gate (no single site may
    * contribute more than `maxPerDomain` documents). Selection is
    * deterministic bottom-N by md5 priority over the id (the repo's
    * zero-RNG sampling convention), so the kept set is independent of
    * partitioning and replayable by any engine with md5. Output: input
    * rows + `domain`, filtered to the kept set.
    *
    * Scale shape: one hash + one window over domain partitions. A
    * pathological mega-domain makes a hot partition; at crawl scale the
    * two-phase form (count per domain, broadcast the over-cap domain
    * list, window only those) bounds the skew — here the window is the
    * honest cost and domains are the natural partition key.
    */
  def capPerDomain(df: DataFrame, urlCol: String, idCol: String,
                   maxPerDomain: Int): DataFrame = {
    require(maxPerDomain >= 1, s"maxPerDomain=$maxPerDomain must be >= 1")
    val withDom = df.withColumn("domain", registeredDomain(hostOf(col(urlCol))))
    val w = Window.partitionBy(col("domain"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    withDom
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerDomain)
      .drop("__rn")
  }
}
