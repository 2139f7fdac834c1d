package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{t => tbl}

/** End-to-end corpus cleaning — the composition every LLM training-data
  * pipeline runs: normalize → language gate → quality gate → exact dedup →
  * keep. Each stage exists as a standalone operator (TextAnalysis, Dedup);
  * this operator proves they COMPOSE into one declarative plan: a single
  * scan, narrow per-row expressions for every gate, and one keyed
  * shuffle (the dedup key) plus the presentation sort — at 100 TB the
  * pipeline runs at scan speed plus one keyed exchange, instead of one
  * pass per stage.
  *
  * Mirrors the reference's multi-stage shape (decode → validity filter →
  * idempotent dedup, SURVEY.md §2.2 T1/T6 + §2.1 S5) lifted to the
  * training-data domain.
  */
object Pipeline {

  type Q = (SparkSession, String) => DataFrame

  private val stopSqlList = TextAnalysis.stopSqlList

  /** Per-doc stage columns, all narrow: token stats, stopword ratio
    * (language gate), normalized text, and the dedup key — md5 of the
    * 60-char normalized prefix (prefix fingerprinting: catches
    * boilerplate/near-identical openings the way URL-prefix dedup does,
    * while staying exact and oracle-checkable).
    */
  private def staged(docs: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("stop_ratio",
        size(expr(s"filter(toks, t -> t IN ($stopSqlList))")).cast("double") /
          col("n_toks").cast("double"))
      .withColumn("norm_key", md5(substring(norm, 1, 60)))
      .withColumn("norm_len", length(norm).cast("long"))
      .withColumn("lang_ok", col("stop_ratio") >= 0.02)
      .withColumn("qual_ok", col("lang_ok") && col("n_toks") >= 20L)
  }
  private val stagedSql: String =
    s"""SELECT doc_id,
       |  len(string_split(text, ' ')) AS n_toks,
       |  CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopSqlList))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
       |  md5(substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), 1, 60)) AS norm_key,
       |  CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS norm_len
       |FROM documents""".stripMargin

  /** pl_corpus_clean — the surviving documents: pass both gates, then
    * keep the min doc_id per dedup key. One scan, one shuffle.
    */
  val corpusClean: Q = (s, d) => {
    val st = staged(tbl(s, d, "documents")).where(col("qual_ok"))
    st.withColumn("rn", row_number().over(
        Window.partitionBy(col("norm_key")).orderBy(col("doc_id"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("n_toks"), col("norm_len"))
      .orderBy(col("doc_id"))
  }
  val corpusCleanSql: String =
    s"""SELECT doc_id, n_toks, norm_len
       |FROM ($stagedSql)
       |WHERE stop_ratio >= 0.02 AND n_toks >= 20
       |QUALIFY row_number() OVER (PARTITION BY norm_key ORDER BY doc_id) = 1
       |ORDER BY doc_id""".stripMargin

  /** pl_funnel — pipeline observability in ONE aggregate pass: how many
    * docs enter, survive the language gate, survive the quality gate,
    * and remain after dedup. Conditional aggregation means the funnel
    * costs one scan regardless of stage count.
    */
  val funnel: Q = (s, d) =>
    staged(tbl(s, d, "documents")).agg(
      count(lit(1)).as("n_total"),
      count(when(col("lang_ok"), 1)).as("n_lang"),
      count(when(col("qual_ok"), 1)).as("n_quality"),
      countDistinct(when(col("qual_ok"), col("norm_key"))).as("n_kept"))
  val funnelSql: String =
    s"""SELECT count(*) AS n_total,
       |  count(*) FILTER (stop_ratio >= 0.02) AS n_lang,
       |  count(*) FILTER (stop_ratio >= 0.02 AND n_toks >= 20) AS n_quality,
       |  count(DISTINCT CASE WHEN stop_ratio >= 0.02 AND n_toks >= 20
       |                      THEN norm_key END) AS n_kept
       |FROM ($stagedSql)""".stripMargin

  val queries: Map[String, Q] = Map(
    "pl_corpus_clean" -> corpusClean,
    "pl_funnel"       -> funnel)

  val oracles: Map[String, String] = Map(
    "pl_corpus_clean" -> corpusCleanSql,
    "pl_funnel"       -> funnelSql)
}
