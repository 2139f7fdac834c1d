package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t => tbl}

/** Full-text retrieval primitives over the `documents` corpus: a sharded
  * inverted index and BM25 ranking. Together with the ANN family
  * (Similarity.scala) this closes the hybrid-search surface a training-data
  * pipeline queries: lexical recall (postings/BM25) + semantic recall
  * (IVF/PQ/LSH), the two legs of every modern retrieval stack. The
  * reference's own query surface is key/filter-based (`src/app/events/
  * actions.ts:30-60`); these extend it the same way the dedup family does —
  * corpus-scale operators the reference's store cannot express.
  *
  * Scale design: a posting list for a frequent term is O(corpus) — the one
  * thing you must never `collect_list` unsharded at 100 TB. The index is
  * therefore keyed `(term, shard)` with `shard = doc_id div S`: list length
  * is bounded by the shard's doc count regardless of term frequency, shards
  * of one term write/read independently (the Lucene segment idea expressed
  * relationally), and the build is ONE shuffle with map-side combine over
  * `(term, shard)`. BM25 touches only the query terms' postings — the tf
  * table after the `isin` pushdown is O(q · docs-with-term), never the
  * corpus; df and the corpus stats (N, avgdl) are O(vocab)/O(1) broadcast
  * tables, exactly the tfidf discipline.
  */
object Retrieval {

  type Q = (SparkSession, String) => DataFrame

  /** (doc_id, tok) token stream; single-space split matches DuckDB's
    * string_split (tx_tokens precedent).
    */
  private def toks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    tbl(s, d, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .where(length($"tok") > 0)
  }

  // -------------------------------------------------------- inverted index

  /** ix_postings — sharded inverted index build: for every (term, shard)
    * the per-shard document frequency and the sorted posting list (comma
    * string — the suite's array-emission convention). Docs-not-occurrences:
    * the (doc_id, tok) stream is de-duplicated before grouping, so `tf`
    * inflation from repeated tokens never reaches the index.
    *
    * Plan: explode → distinct (one shuffle, map-side combine) → groupBy
    * (tok, shard) (second shuffle on the index key itself). Posting order
    * is numeric doc_id in BOTH engines (sort_array on the bigint array
    * here, ORDER BY doc_id in the aggregate there) — never lexicographic
    * on the stringified id.
    */
  val ixPostings: Q = (s, d) => {
    import s.implicits._
    toks(s, d).distinct()
      .withColumn("shard", expr("doc_id div 100"))
      .groupBy($"tok", $"shard")
      .agg(count(lit(1)).as("df_shard"),
        expr("array_join(transform(sort_array(collect_set(doc_id))," +
          " x -> CAST(x AS STRING)), ',')").as("postings"))
      .orderBy($"tok", $"shard")
  }
  val ixPostingsSql: String =
    """WITH dt AS (
      |  SELECT DISTINCT doc_id, tok
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  WHERE len(tok) > 0)
      |SELECT tok, doc_id // 100 AS shard, count(*) AS df_shard,
      |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
      |FROM dt GROUP BY tok, shard ORDER BY tok, shard""".stripMargin

  // ------------------------------------------------------------------ BM25

  /** ix_bm25 — Okapi BM25 (k1=1.2, b=0.75, Lucene's ln(1 + (N-df+.5)/(df+.5))
    * idf) for a fixed 3-term query, top-20 docs. The corpus text is scanned
    * once (token stream feeds dl and tf); df / N / avgdl are broadcast
    * scalars; the ranked set comes from a global TakeOrderedAndProject
    * (sort+limit), not a single-partition window.
    *
    * Determinism: dl and tf are exact integers, avgdl = exact integer sum /
    * exact count; per-doc score sums ≤ 3 terms and rounds to 6 dp before
    * the rank — the tx_entropy argument (1-ulp libm drift vs 1e-6 grain)
    * applies. Ties at the cut break on doc_id, making the 20-row set total.
    */
  val ixBm25: Q = (s, d) => {
    import s.implicits._
    val qterms = Seq("join", "hash", "scan")
    val tk = toks(s, d)
    val dl = tk.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    val tf = tk.where($"tok".isin(qterms: _*))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfTbl), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", $"sum_dl".cast("double") / $"n_docs")
      .withColumn("idf", log(lit(1.0) + ($"n_docs" - $"df" + 0.5) / ($"df" + 0.5)))
      .withColumn("ts",
        $"idf" * ($"tf" * 2.2) /
          ($"tf" + ($"dl" / $"avgdl" * 0.75 + 0.25) * 1.2))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_terms"), round(sum($"ts"), 6).as("bm25"))
      .orderBy($"bm25".desc, $"doc_id")
      .limit(20)
  }
  val ixBm25Sql: String =
    """WITH tk AS (
      |  SELECT doc_id, tok
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  WHERE len(tok) > 0),
      |dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
      |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk
      |       WHERE tok IN ('join', 'hash', 'scan') GROUP BY doc_id, tok),
      |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      |scored AS (
      |  SELECT t.doc_id,
      |         ln(1.0 + (n_docs - f.df + 0.5) / (f.df + 0.5))
      |           * (t.tf * 2.2)
      |           / (t.tf + (l.dl / (CAST(sum_dl AS DOUBLE) / n_docs) * 0.75 + 0.25) * 1.2) AS ts
      |  FROM tf t JOIN df f USING (tok) JOIN dl l USING (doc_id) CROSS JOIN stats)
      |SELECT doc_id, count(*) AS n_terms, round(sum(ts), 6) AS bm25
      |FROM scored GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  val queries: Map[String, Q] = Map(
    "ix_postings" -> ixPostings,
    "ix_bm25"     -> ixBm25)
  val oracles: Map[String, String] = Map(
    "ix_postings" -> ixPostingsSql,
    "ix_bm25"     -> ixBm25Sql)
}
