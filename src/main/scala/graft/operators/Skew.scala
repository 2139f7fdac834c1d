package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t => tbl}

/** Skew-mitigation utilities (SURVEY.md §7 / PERF.md): salting for hot
  * keys where AQE's runtime skew handling isn't available (e.g. inside
  * cached stages or non-join aggregations over power-law keys — the
  * hypermap namespace is exactly that: a few parents own most children).
  *
  * All salts are deterministic (xxhash64 of a payload column), never
  * rand() — results must be reproducible across retries and runs.
  */
object Skew {

  /** Two-phase salted sum/count: groupBy(key, salt) partial → groupBy(key)
    * final. Breaks a hot grouping key across `buckets` reducers. For
    * algebraic aggregates only (sum/count/min/max compose; avg = sum/cnt).
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltSrc: Column, buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSrc), lit(buckets)))
    salted.groupBy(key.as("k"), col("__salt"))
      .agg(sum(value).as("partial_sum"), count(lit(1)).as("partial_cnt"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_cnt")).as("cnt"))
  }

  /** Skew join: fact side salted from `saltSrc`, dim side replicated
    * ×buckets, equi-join on (key, salt). Same rows as the plain join,
    * hot keys spread across `buckets` tasks. Use when one dim key matches
    * a large fraction of the fact table and broadcast isn't possible.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSrc: Column, buckets: Int): DataFrame = {
    val f = fact.withColumn("__salt", pmod(xxhash64(saltSrc), lit(buckets)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }

  type Q = (SparkSession, String) => DataFrame

  /** Gate query: the salted two-phase aggregate must equal the plain
    * GROUP BY — the oracle IS the unsalted form, so correctness of the
    * decomposition is hash-checked, not just spec-asserted.
    */
  val swSaltedAgg: Q = (s, d) => {
    import s.implicits._
    saltedSumCount(tbl(s, d, "events"),
      $"event_type", floor($"value").cast("long"), $"event_id", buckets = 16)
      .select($"k".as("event_type"), $"total", $"cnt")
      .orderBy($"event_type")
  }
  val swSaltedAggSql: String =
    """SELECT event_type, CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS total,
      |       count(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Gate query for [[saltedJoin]]: the ×8-salted fact⋈dim must aggregate
    * to exactly the plain join — again the oracle IS the unsalted form.
    * The dim replicates 8× (still tiny); each hot part key's fact rows
    * spread across 8 reducers instead of one straggler task. This is the
    * manual fallback when AQE skew-split can't apply (cached exchanges,
    * bucketed tables whose partitioning must be preserved).
    */
  val swSaltedJoin: Q = (s, d) => {
    import s.implicits._
    val fact = tbl(s, d, "lineitem")
      .select($"l_partkey".as("pk"), $"l_quantity", $"l_orderkey")
    val dim = tbl(s, d, "part").select($"p_partkey".as("pk"), $"p_brand")
    saltedJoin(fact, dim, "pk", $"l_orderkey", buckets = 8)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"),
        sum(floor($"l_quantity").cast("long")).cast("long").as("qty"))
      .orderBy($"p_brand")
  }
  val swSaltedJoinSql: String =
    """SELECT p_brand, count(*) AS n,
      |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** sw_skew_report — the diagnostic you run BEFORE reaching for salting
    * or AQE hints: per-key cardinality profile of a join/agg key
    * (events.user_id here) reduced to the decision numbers — key count,
    * max and median per-key size, their ratio, and how many keys exceed
    * 2× median. Two aggregation passes (key counts, then metrics), the
    * 1-row median broadcast back for the heavy-key count; the raw
    * per-key table never leaves the executors.
    *
    * Exact `percentile` for the median keeps the oracle bit-exact
    * (pf_outliers precedent); on a key dimension too large to sort,
    * swap in percentile_approx — the report is advisory either way.
    */
  val skewReport: Q = (s, d) => {
    val cnts = tbl(s, d, "events").groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val stats = cnts.agg(
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"),
      round(expr("percentile(cnt, CAST(0.5 AS DOUBLE))"), 6).as("med_cnt"))
    cnts.crossJoin(broadcast(stats))
      .groupBy(col("n_keys"), col("max_cnt"), col("med_cnt"))
      .agg(sum(when(col("cnt") > lit(2) * col("med_cnt"), 1L).otherwise(0L)).as("n_heavy"))
      .select(col("n_keys"), col("max_cnt"), col("med_cnt"),
        round(col("max_cnt") / col("med_cnt"), 6).as("skew_ratio"), col("n_heavy"))
  }
  val skewReportSql: String =
    """WITH cnts AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
      |stats AS (
      |  SELECT count(*) AS n_keys, max(cnt) AS max_cnt,
      |         round(quantile_cont(cnt, CAST(0.5 AS DOUBLE)), 6) AS med_cnt
      |  FROM cnts)
      |SELECT n_keys, max_cnt, med_cnt,
      |       round(max_cnt / med_cnt, 6) AS skew_ratio,
      |       CAST(sum(CASE WHEN cnt > 2 * med_cnt THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy
      |FROM cnts CROSS JOIN stats
      |GROUP BY n_keys, max_cnt, med_cnt""".stripMargin

  val queries: Map[String, Q] = Map(
    "sw_salted_agg"  -> swSaltedAgg,
    "sw_salted_join" -> swSaltedJoin,
    "sw_skew_report" -> skewReport)
  val oracles: Map[String, String] = Map(
    "sw_salted_agg"  -> swSaltedAggSql,
    "sw_salted_join" -> swSaltedJoinSql,
    "sw_skew_report" -> skewReportSql)
}
