package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t => tbl}

/** Approximate-sketch operators and their correctness gates.
  *
  * Sketch outputs are approximate, so they can't hash-match a DuckDB
  * oracle directly. Instead each gate query emits (metric, exact, ok):
  * the EXACT value (deterministic, hash-checkable) plus a boolean
  * asserting the sketch landed within its published error bound — turning
  * an approximation into a deterministic pass/fail the driver can verify.
  *
  * Scale rationale: at 100 TB, count(DISTINCT) and exact percentile are
  * full-shuffle operators (every distinct value / every row to one
  * aggregation path). The sketches are one-pass, fixed-memory, and
  * mergeable — per-partition partials combine associatively, which is the
  * entire point: `hll_sketch_agg` is Spark 4's Apache DataSketches HLL
  * (binary sketch column, `hll_union` re-aggregable across grains);
  * `percentile_approx` is the KLL-style quantile summary. The exact
  * aggregates computed alongside here are affordable at gate scale and
  * double as the ground truth for the bound check.
  */
object Sketches {

  type Q = (SparkSession, String) => DataFrame

  /** sk_hll — mergeable HLL distinct-count of users vs exact, bound 5 %
    * (lgConfigK=12 ⇒ relative standard error ≈1.6 %; 3σ ≈ 5 %).
    */
  val hllBound: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events").agg(
        hll_sketch_estimate(hll_sketch_agg($"user_id", lit(12))).as("approx"),
        countDistinct($"user_id").as("exact_n"))
      .select(lit("distinct_users").as("metric"), $"exact_n",
        (abs($"approx" - $"exact_n") <= $"exact_n" * 0.05).as("ok"))
  }
  val hllBoundSql: String =
    """SELECT 'distinct_users' AS metric, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_n,
      |       true AS ok FROM events""".stripMargin

  /** sk_quantile — approx p50 of documents.n_chars vs exact interpolated
    * median, bound 2 %.
    */
  val quantileBound: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "documents").agg(
        percentile_approx($"n_chars", lit(0.5), lit(10000)).as("approx"),
        expr("percentile(n_chars, 0.5)").as("exact"))
      .select(lit("p50_chars").as("metric"),
        round($"exact", 6).cast("double").as("exact_p50"),
        (abs($"approx" - $"exact") <= $"exact" * 0.02).as("ok"))
  }
  val quantileBoundSql: String =
    """SELECT 'p50_chars' AS metric,
      |       round(CAST(quantile_cont(n_chars, 0.5) AS DOUBLE), 6) AS exact_p50,
      |       true AS ok FROM documents""".stripMargin

  /** Scale-path API: per-group mergeable HLL sketches, re-aggregable to
    * coarser grains with hll_union_agg — the pattern for distinct-count
    * rollup cubes over 100 TB (sketch once at fine grain, merge upward,
    * never rescan).
    */
  def distinctSketchByGroup(df: DataFrame, groupCol: String, valueCol: String,
                            lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll_sketch"))

  def mergeSketches(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("hll_sketch"))).as("approx_distinct"))

  /** Approximate n-tile assignment without a global sort — the scale
    * alternative to exact ntile (Relational.w4Ntile) when the bucketed
    * column's cardinality is itself huge: one quantile-sketch pass for
    * the n-1 boundaries, then a stateless per-row bucket lookup. Equal-
    * size-bucket remainders differ from exact ntile (boundary ties all
    * land in one bucket) — that's the trade.
    */
  def approxNtileBounds(df: DataFrame, valueCol: String, n: Int,
                        relativeError: Double = 0.001): Array[Double] = {
    require(n > 1, "need at least 2 buckets")
    df.stat.approxQuantile(valueCol,
      (1 until n).map(_.toDouble / n).toArray, relativeError)
  }

  def assignByBounds(df: DataFrame, valueCol: String,
                     bounds: Array[Double]): DataFrame = {
    val boundsArr = array(bounds.map(lit(_)).toIndexedSeq: _*)
    // null values get a null bucket — approxQuantile ignored them when
    // computing the bounds, so folding them into bucket 1 would silently
    // skew it
    df.withColumn("bucket",
      when(col(valueCol).isNull, lit(null))
        .otherwise(lit(1) + size(filter(boundsArr, b => col(valueCol) > b)))
        .cast("long"))
  }

  val queries: Map[String, Q] = Map(
    "sk_hll_bound"      -> hllBound,
    "sk_quantile_bound" -> quantileBound,
  )

  val oracles: Map[String, String] = Map(
    "sk_hll_bound"      -> hllBoundSql,
    "sk_quantile_bound" -> quantileBoundSql,
  )
}
