package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t => tbl}

/** Web-corpus hygiene operators: URL canonicalization and per-domain
  * caps — the first passes of every web-crawl training pipeline
  * (CommonCrawl-style dedup keys on the CANONICAL url; domain caps stop
  * a single boilerplate-heavy site from dominating the mixture).
  *
  * The testdata has no URL column, so the gates synthesize deterministic
  * MESSY urls from doc_id (the mm_decode discipline: both engines derive
  * the input from the same integer formula; the operator's output is the
  * thing under test). Canonicalization is pure builtin string/array
  * functions — no UDF, no interpreted lambda in a corpus-scale hot path
  * worry: the per-row work is O(url length), embarrassingly parallel,
  * and at 100 TB runs as a projection inside the scan stage.
  */
object Web {

  type Q = (SparkSession, String) => DataFrame

  /** Messy-URL formula: scheme/host case noise, an explicit default
    * port, tracking params out of order, and a fragment. Kept to shapes
    * both engines' regex engines treat identically.
    */
  def messyUrl(docId: Column): Column =
    concat(
      when(docId % 2 === 0, lit("HTTP")).otherwise(lit("https")),
      lit("://"),
      when(docId % 3 === 0, lit("WWW.")).otherwise(lit("www.")),
      lit("Site"), (docId % 20).cast("string"), lit(".COM"),
      when(docId % 2 === 0, lit(":80")).otherwise(lit(":443")),
      lit("/a/b"), (docId % 5).cast("string"), lit("/"),
      lit("?utm_source=feed&id="), (docId % 7).cast("string"),
      lit("&b=2&a=1&fbclid=xyz#sec"), (docId % 3).cast("string"))

  /** Canonical form: lowercase scheme+host, strip a leading `www.`,
    * strip the scheme's default port, drop the fragment, drop tracking
    * params (utm_*, fbclid, gclid), sort the survivors, strip a trailing
    * slash from the path. Deterministic key for exact URL dedup.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    val host0 = regexp_replace(hostPort, ":\\d+$", "")
    val port = regexp_extract(hostPort, ":(\\d+)$", 1)
    val host = regexp_replace(host0, "^www\\.", "")
    val keepPort = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    val path = when(path0 === "", lit("/"))
      .otherwise(regexp_replace(path0, "/$", ""))
    val query = regexp_extract(noFrag, "\\?([^#]*)$", 1)
    val kept = array_join(array_sort(filter(split(query, "&"),
      p => !(p.startsWith("utm_") || p.startsWith("fbclid=") ||
        p.startsWith("gclid=") || p === ""))), "&")
    concat(scheme, lit("://"), host, keepPort,
      when(path === "", lit("/")).otherwise(path),
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Registrable domain (approximation: last two host labels — the gate
    * corpus has no multi-label public suffixes; a production pass swaps
    * in the PSL table as a broadcast join).
    */
  def domainOf(canon: Column): Column =
    regexp_extract(canon, "^[a-z][a-z0-9+.-]*://(?:[^/:?]*\\.)?([^/.:?]+\\.[^/.:?]+)", 1)

  /** wb_url_canon — canonicalization + exact canonical dedup rank: each
    * doc's messy url, its canonical form, and whether it is the keeper
    * (lowest doc_id) for its canonical key. ~29% of the synthetic urls
    * collapse (140 canonical keys from 200 docs: 2·20·5 scheme/host/path
    * shapes × 7 id params, minus never-generated combos).
    */
  val urlCanon: Q = (s, d) => {
    val docs = tbl(s, d, "documents").where(col("doc_id") < 200)
      .select(col("doc_id"), messyUrl(col("doc_id")).as("url"))
    val canon = docs.withColumn("canon", canonicalUrl(col("url")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("canon")).orderBy(col("doc_id"))
    canon
      .withColumn("keeper", (row_number().over(w) === 1).cast("boolean"))
      .select(col("doc_id"), col("url"), col("canon"), col("keeper"))
      .orderBy(col("doc_id"))
  }
  val urlCanonSql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |         (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://' ||
      |         (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE 'www.' END) ||
      |         'Site' || CAST(doc_id % 20 AS VARCHAR) || '.COM' ||
      |         (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END) ||
      |         '/a/b' || CAST(doc_id % 5 AS VARCHAR) || '/' ||
      |         '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR) ||
      |         '&b=2&a=1&fbclid=xyz#sec' || CAST(doc_id % 3 AS VARCHAR) AS url
      |  FROM documents WHERE doc_id < 200),
      |c AS (
      |  SELECT doc_id, url,
      |         lower(CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END) || '://' ||
      |         'site' || CAST(doc_id % 20 AS VARCHAR) || '.com' ||
      |         '/a/b' || CAST(doc_id % 5 AS VARCHAR) ||
      |         '?' || array_to_string(list_sort(
      |           list_filter(string_split('utm_source=feed&id=' ||
      |             CAST(doc_id % 7 AS VARCHAR) || '&b=2&a=1&fbclid=xyz', '&'),
      |             p -> NOT (p LIKE 'utm\_%' ESCAPE '\' OR p LIKE 'fbclid=%'
      |                       OR p LIKE 'gclid=%' OR p = ''))), '&') AS canon
      |  FROM u)
      |SELECT doc_id, url, canon,
      |       row_number() OVER (PARTITION BY canon ORDER BY doc_id) = 1 AS keeper
      |FROM c ORDER BY doc_id""".stripMargin

  /** wb_domain_cap — per-domain document caps: rank each domain's docs
    * by a quality proxy (n_chars DESC, doc_id) and keep the top K=5 —
    * the mixture-control pass that stops one site from dominating.
    * Reported per domain: docs seen, docs kept, chars kept. Scale shape:
    * one window partitioned by domain (value-density-bounded groups,
    * never global) + one keyed agg.
    */
  val domainCap: Q = (s, d) => {
    val docs = tbl(s, d, "documents").where(col("doc_id") < 200)
      .select(col("doc_id"), col("n_chars"),
        domainOf(canonicalUrl(messyUrl(col("doc_id")))).as("domain"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain")).orderBy(col("n_chars").desc, col("doc_id"))
    docs.withColumn("rk", row_number().over(w))
      .groupBy(col("domain")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("rk") <= 5, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") <= 5, col("n_chars")).otherwise(0L)).as("chars_kept"))
      .orderBy(col("domain"))
  }
  val domainCapSql: String =
    """WITH docs AS (
      |  SELECT doc_id, n_chars,
      |         'site' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS domain
      |  FROM documents WHERE doc_id < 200),
      |rk AS (
      |  SELECT domain, n_chars,
      |         row_number() OVER (PARTITION BY domain
      |                            ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM docs)
      |SELECT domain, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN rk <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       CAST(sum(CASE WHEN rk <= 5 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
      |FROM rk GROUP BY domain ORDER BY domain""".stripMargin

  val queries: Map[String, Q] = Map(
    "wb_url_canon"  -> urlCanon,
    "wb_domain_cap" -> domainCap,
  )

  val oracles: Map[String, String] = Map(
    "wb_url_canon"  -> urlCanonSql,
    "wb_domain_cap" -> domainCapSql,
  )
}
