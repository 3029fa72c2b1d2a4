package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + registered-domain curation — the provenance
  * axis of corpus curation (per-domain quotas, URL-level dedup, domain
  * blocklists all key on these).
  *
  * The fixture corpus has no URL column, so the query injects a
  * deterministic dirty URL per doc (mixed-case scheme, tracking params,
  * fragments, trailing slashes — the same dirty-fixture pattern as
  * `TextAnalysis.injectPii`); the operators are the deliverable. All
  * regexes stay in the RE2 ∩ Java common subset so the DuckDB oracle
  * replays byte-identically.
  *
  * Scale shape: normalization is a per-row column program; the rollup
  * is one hash shuffle keyed by registered domain (domain skew — a
  * giant crawl domain — is the salted-agg case, x37's lever). */
object WebCuration {

  /** Deterministic dirty-URL injector. Output: doc_id, url. */
  def injectUrls(docs: DataFrame): DataFrame = {
    val sub = element_at(array(lit("www."), lit("cdn."), lit("blog."), lit("")),
      (col("doc_id") % 4 + 1).cast("int"))
    val tld = element_at(array(lit(".com"), lit(".org"), lit(".co.uk")),
      (col("doc_id") % 3 + 1).cast("int"))
    docs.select(col("doc_id"), concat(
      when(col("doc_id") % 2 === 0, "https://").otherwise("HTTP://"),
      sub, lit("Site"), (col("doc_id") % 37).cast("string"), tld,
      lit("/p/"), (col("doc_id") % 50).cast("string"),
      when(col("doc_id") % 5 === 0, "/").otherwise(""),
      when(col("doc_id") % 2 === 0,
        concat(lit("?utm_source=feed&utm_campaign=c"),
          (col("doc_id") % 3).cast("string"),
          lit("&id="), (col("doc_id") % 11).cast("string")))
        .when(col("doc_id") % 3 === 0,
          concat(lit("?id="), (col("doc_id") % 11).cast("string")))
        .otherwise(""),
      when(col("doc_id") % 6 === 0,
        concat(lit("#sec"), (col("doc_id") % 4).cast("string"))).otherwise(""))
      .as("url"))
  }

  /** Canonical URL: lowercase; drop fragment; drop utm_* tracking params
    * (keeping real ones); drop dangling '?'/'&'; drop one trailing
    * slash. Mirror: the same four regexp_replace steps with 'g'. */
  def normalizeUrl(u: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(lower(u), "#.*", ""),
          "utm_[a-z]+=[^&#]*&?", ""),
        "[?&]$", ""),
      "/$", "")

  /** Registered domain of a normalized URL: last two host labels, or
    * last three under a multi-part public suffix (the mini-list models
    * the PSL lookup; at scale the suffix table is a broadcast dim). */
  def registeredDomain(normUrl: Column): Column = {
    val host = regexp_extract(normUrl, "^https?://([^/?#]+)", 1)
    when(host.rlike("\\.co\\.uk$"),
      regexp_extract(host, "([^.]+\\.co\\.uk)$", 1))
      .otherwise(regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
  }

  /** Per-registered-domain rollup over canonicalized URLs: doc count,
    * distinct canonical URLs, URL-dedup drop count, first doc.
    * Output: domain, n_docs, n_urls, n_dropped, min_doc. */
  def domainRollup(urls: DataFrame): DataFrame = {
    val n = urls.select(col("doc_id"), normalizeUrl(col("url")).as("nurl"))
      .withColumn("domain", registeredDomain(col("nurl")))
    n.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("nurl")).as("n_urls"),
        min(col("doc_id")).as("min_doc"))
      .withColumn("n_dropped", col("n_docs") - col("n_urls"))
      .select("domain", "n_docs", "n_urls", "n_dropped", "min_doc")
  }
}
