package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and per-domain curation for crawl corpora — the
  * address-side half of web dedup: the same page is crawled as
  * `HTTP://WWW.Site.COM:80/a/?b=2&a=1#frag` and
  * `http://www.site.com/a?a=1&b=2`, and exact text dedup only catches it
  * after download; canonical-URL dedup catches it at the FRONTIER.
  * Everything is pure codegen'd Column algebra (regex splits + rebuild,
  * no UDF) in the Java/RE2 regex intersection, so the DuckDB oracle
  * replays it verbatim (q_url_canonical).
  *
  * Canonicalization contract (RFC-3986-lite, deterministic):
  *  - scheme and host lowercased; path/query case preserved (paths are
  *    case-sensitive by spec);
  *  - fragment dropped;
  *  - default ports stripped (http:80, https:443), others kept;
  *  - trailing slash runs collapsed off the path (root stays `/`; an
  *    empty path becomes `/`);
  *  - query parameters sorted bytewise (param ORDER is almost never
  *    semantic; byte sort is engine-stable).
  * Inputs without a `scheme://` part canonicalize to degenerate strings
  * (empty scheme/host) rather than failing — a crawl frontier treats
  * unparseable URLs as their own keys.
  */
object UrlOps {

  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val hostport = lower(regexp_extract(noFrag, "^[^:/?#]+://([^/?#]*)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val hostOnly = regexp_replace(hostport, ":[0-9]+$", "")
    val portNorm = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val pathqf = regexp_extract(noFrag, "^[^:/?#]+://[^/?#]*(.*)$", 1)
    val path = regexp_extract(pathqf, "^([^?]*)", 1)
    val query = regexp_extract(pathqf, "\\?(.*)$", 1)
    val pathNorm = when(rtrim(path, "/") === "", lit("/"))
      .otherwise(rtrim(path, "/"))
    val queryNorm = when(query === "", lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(split(query, "&")), "&")))
    concat(scheme, lit("://"), hostOnly, portNorm, pathNorm, queryNorm)
  }

  /** Lowercased host with any port stripped. */
  def host(u: Column): Column =
    regexp_replace(
      lower(regexp_extract(regexp_replace(u, "#.*$", ""),
        "^[^:/?#]+://([^/?#]*)", 1)),
      ":[0-9]+$", "")

  /** [[host]] with a leading `www.` removed — the grouping key for
    * per-site quotas. (A real public-suffix registry is a lookup table
    * this container does not carry; `www.`-stripping is the deterministic
    * subset that needs no data dependency, and a suffix table drops in as
    * a broadcast join on this column.)
    */
  def registeredDomain(u: Column): Column =
    regexp_replace(host(u), "^www\\.", "")

  /** Per-domain quota: keep at most `k` rows per [[registeredDomain]],
    * selected by the repo's deterministic md5 rank — one site cannot
    * dominate the corpus (the standard crawl-balance curation step).
    * Exactly [[Reservoir.sampleK]]'s bounded mergeable bottom-k heap per
    * stratum: ≤ k candidates per domain per partition cross the
    * exchange, never the rows. Returns (domain, idCol) — join back on
    * idCol for payloads.
    */
  def domainQuota(df: DataFrame, urlCol: String, idCol: String,
      k: Int): DataFrame =
    Reservoir.sampleK(
      df.withColumn("__domain", registeredDomain(col(urlCol))),
      "__domain", idCol, k)
      .withColumnRenamed("__domain", "domain")
}
