package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain operators — the front-of-pipeline web stages (CCNet,
  * RefinedWeb, Dolma): URL extraction from text, per-domain census,
  * domain-blocklist filtering, and URL-normalization dedup (the
  * classic first dedup stage of a crawl, before any content hashing).
  *
  * All regexes are Java∩RE2-safe (no lookarounds, no backrefs) so the
  * DuckDB oracle replays them verbatim.
  *
  * Scale notes (100 TB): extraction is a map-side projection +
  * generator; the census's `count_distinct(doc_id)` plans the
  * standard two-phase distinct — partial aggregation on (host,
  * doc_id), exchange, then the per-host count over another exchange —
  * two exchanges, both combine-friendly (a hot domain's duplicate
  * (host, doc_id) pairs collapse before the first exchange).
  * Blocklist filtering never moves document text: the exploded
  * (doc_id, host) frame semi-joins the (small, broadcast) blocklist,
  * and the resulting hit-id set — bounded by the blocked fraction —
  * anti-joins back. URL dedup groups by the normalized URL string;
  * winner = min(doc_id) is an aggregate, not a window, so a hot URL
  * (a crawl that fetched one page a million times) combines map-side.
  */
object UrlOps {

  /** http(s) URLs as they appear in prose: scheme, host, optional
    * port, optional non-whitespace path
    */
  val UrlRegex = "https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^\\s]*)?"

  /** capture group 1 = host[:port] stripped of scheme and path */
  val HostRegex = "https?://([A-Za-z0-9.-]+)"

  def urlsCol(text: Column): Column =
    regexp_extract_all(text, lit(UrlRegex), lit(0))

  /** one row per URL occurrence: (id, url, host) — host lowercased
    * (DNS is case-insensitive; paths are not and stay verbatim)
    */
  def extractUrls(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.util.Staged.explodeOnce(
      docs.select(col(idCol).cast("long").as("doc_id"),
        urlsCol(col(textCol)).as("us")),
      Seq(col("doc_id")), col("us"), "url")
      .withColumn("host",
        lower(regexp_extract(col("url"), HostRegex, 1)))

  /** per-domain census: distinct documents and total URL occurrences
    * mentioning each host
    */
  def domainCensus(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    extractUrls(docs, idCol, textCol)
      .groupBy("host")
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_urls"))

  /** drop every document that mentions a blocked domain. The
    * blocklist frame has one `host` column (lowercase). Text never
    * shuffles: hits are an exploded-host semi-join (blocklist
    * broadcast by AQE at blocklist sizes), then the bounded hit-id
    * set anti-joins the original frame.
    */
  def filterBlockedDomains(docs: DataFrame, idCol: String,
      textCol: String, blocked: DataFrame): DataFrame = {
    val hits = extractUrls(docs, idCol, textCol)
      .join(blocked, Seq("host"), "left_semi")
      .select(col("doc_id").as(idCol)).distinct()
    docs.join(hits, Seq(idCol), "left_anti")
  }

  /** (docs with a `url` column) -> one row per distinct normalized
    * URL: the kept (minimum) id and the duplicate count
    */
  def dedupByUrl(pages: DataFrame, idCol: String,
      urlCol: String): DataFrame =
    pages.select(col(idCol).cast("long").as("doc_id"),
        normalizedUrlCol(col(urlCol)).as("nurl"))
      .groupBy("nurl")
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_dups"))

  /** deterministic URL normalization, the crawl-dedup equivalence:
    * drop the fragment, lowercase the scheme://host[:port] prefix
    * (paths stay case-sensitive), drop explicit default ports
    * (:80 for http, :443 for https), and drop a lone trailing "/"
    * path. Query strings stay verbatim (dropping them changes page
    * identity; reordering them is out of scope).
    */
  def normalizedUrlCol(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val rawPrefix = regexp_extract(noFrag, "^(https?://[^/]+)", 1)
    val tail = substr(noFrag, length(rawPrefix) + lit(1))
    val prefix = regexp_replace(
      regexp_replace(lower(rawPrefix), "^(http://.*):80$", "$1"),
      "^(https://.*):443$", "$1")
    concat(prefix, when(tail === "/", "").otherwise(tail))
  }
}
