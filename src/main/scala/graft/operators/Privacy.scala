package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t => tbl}

/** PII detection and redaction — a first-class stage in any training-data
  * pipeline (scrub emails / phone numbers / IP addresses before the corpus
  * reaches a trainer or an eval set).
  *
  * Everything here is per-row regex work (`regexp_count`/`regexp_replace`)
  * that stays inside whole-stage codegen: at 100 TB these run at scan speed
  * with zero shuffle — the only shuffle in the gate query is its final
  * deterministic sort. Patterns are deliberately written in the common
  * Java-regex / RE2 subset so the same literal drives both Spark and the
  * DuckDB oracle.
  *
  * The driver's synthetic `documents` table contains no PII, so the gate
  * first plants deterministic PII derived from `doc_id` (same expression in
  * Spark and the oracle SQL) — the detection/redaction path is then
  * exercised on ~60% of rows, non-vacuously, and verified hash-exact.
  */
object Privacy {

  type Q = (SparkSession, String) => DataFrame

  /** Shared pattern literals (Java regex ∩ RE2 so Spark and DuckDB agree). */
  val EmailRe: String = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhoneRe: String = """\+1-\d{3}-\d{4}"""
  val Ipv4Re: String  = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** Plant deterministic PII onto `text` keyed by doc_id (email on ×3,
    * phone on ×5, IPv4 on ×7). Mirrored verbatim by [[plantedSqlExpr]].
    */
  def plantPii(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.withColumn("text",
      concat(col("text"),
        when(id % 3 === 0,
          concat(lit(" mail user"), id.cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(id % 5 === 0,
          concat(lit(" tel +1-555-"), lpad((id % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(id % 7 === 0,
          concat(lit(" host 10.0."), (id % 256).cast("string"), lit("."),
            (id % 100).cast("string")))
          .otherwise(lit(""))))
  }

  /** DuckDB expression producing byte-identical planted text. */
  val plantedSqlExpr: String =
    """text
      | || CASE WHEN doc_id % 3 = 0
      |         THEN ' mail user' || doc_id || '@example.com' ELSE '' END
      | || CASE WHEN doc_id % 5 = 0
      |         THEN ' tel +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
      | || CASE WHEN doc_id % 7 = 0
      |         THEN ' host 10.0.' || (doc_id % 256) || '.' || (doc_id % 100) ELSE '' END"""
      .stripMargin.replace("\n", "")

  /** Per-document PII hit counts — the "should this doc be quarantined"
    * signal. Pure narrow map, codegen'd.
    */
  def detect(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phone"),
      regexp_count(col("text"), lit(Ipv4Re)).cast("long").as("n_ip"))

  /** Redact all three classes in one pass (email first — its domain part
    * would otherwise be half-eaten by the IPv4 rule on adversarial input).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")

  /** Gate: plant → detect → redact; verify counts plus an md5 of the
    * redacted text (proves byte-identical redaction, not just counts).
    */
  val piiScrub: Q = (s, d) => {
    val planted = plantPii(tbl(s, d, "documents"))
    detect(planted)
      .join(planted.select(col("doc_id"),
        md5(redact(col("text")).cast("binary")).as("redacted_md5"),
        length(redact(col("text"))).cast("long").as("redacted_len")), Seq("doc_id"))
      .orderBy(col("doc_id"))
  }

  val piiScrubSql: String = {
    // DuckDB regexp_replace needs the 'g' flag for replace-all (Spark's
    // default); regexp_extract_all + len mirrors regexp_count.
    s"""WITH p AS (SELECT doc_id, $plantedSqlExpr AS text FROM documents),
       |r AS (SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailRe', '[EMAIL]', 'g'),
       |    '$PhoneRe', '[PHONE]', 'g'),
       |    '$Ipv4Re', '[IP]', 'g') AS red, text FROM p)
       |SELECT doc_id,
       |  len(regexp_extract_all(text, '$EmailRe')) AS n_email,
       |  len(regexp_extract_all(text, '$PhoneRe')) AS n_phone,
       |  len(regexp_extract_all(text, '$Ipv4Re')) AS n_ip,
       |  md5(red) AS redacted_md5,
       |  len(red) AS redacted_len
       |FROM r ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "pii_scrub" -> piiScrub,
  )

  val oracles: Map[String, String] = Map(
    "pii_scrub" -> piiScrubSql,
  )
}
