package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t => tbl}

/** Data-quality audit operators: referential-integrity sweep and rule-based
  * column validation — the admission checks a pipeline runs on every corpus
  * snapshot BEFORE training jobs consume it (the reference's analogue is the
  * per-event validity filter, `src/lib/decode.ts:21-60`; these lift that
  * idea from one row to whole-relation invariants).
  *
  * Scale design: every edge check is a left join of the fact onto the
  * DISTINCT parent-key set — dims broadcast, the one big fact edge shuffles
  * on its join key exactly once, and nothing but two counters leaves the
  * executors. Rule validation is a single pass per table: all rule
  * predicates are fused into one aggregate (sum-of-CASE columns) and the
  * per-rule rows are unpivoted from that one row — N rules never means N
  * scans.
  */
object Audit {

  type Q = (SparkSession, String) => DataFrame

  /** One FK edge: total child rows + rows whose key misses the parent set.
    * r18 batch 3 A/B: aggregating the child to (key, count) BEFORE the
    * join (guide §2.3 — the exchange then carries one row per DISTINCT
    * child key, e.g. 67:1 for events.user_id) measured 0.81 → 0.94 s
    * isolated sf0.1 and 1.00 → 1.13 s with events at 10× — the extra
    * aggregation stage costs more than the local in-memory exchange
    * saves at every size this host can hold. On a network-priced
    * cluster the combine wins (it is the standard shape for this
    * audit); the per-row join form stays because the measured local
    * trade never flips in-sandbox.
    */
  private def fkEdge(name: String, child: DataFrame, ck: String,
                     parent: DataFrame, pk: String): DataFrame = {
    val pkeys = parent.select(col(pk).as("__pk")).distinct()
    child.select(col(ck).as("__ck"))
      .join(pkeys, col("__ck") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .select(lit(name).as("edge"), col("n_child"), col("n_orphans"))
  }

  /** dq_fk_orphans — referential-integrity audit over the full star schema
    * (7 physical edges + events→customer), plus one deliberately LAGGED
    * dim snapshot (customer restricted to c_custkey % 20 <> 0 — the
    * "fact landed before the dim refresh" incident every warehouse hits)
    * so the audit provably FIRES, not just reports zeros (pii_scrub's
    * planted-violation precedent).
    */
  val fkOrphans: Q = (s, d) => {
    val li = tbl(s, d, "lineitem"); val ord = tbl(s, d, "orders")
    val cust = tbl(s, d, "customer"); val nat = tbl(s, d, "nation")
    val edges = Seq(
      fkEdge("lineitem.l_orderkey->orders", li, "l_orderkey", ord, "o_orderkey"),
      fkEdge("lineitem.l_partkey->part", li, "l_partkey", tbl(s, d, "part"), "p_partkey"),
      fkEdge("lineitem.l_suppkey->supplier", li, "l_suppkey", tbl(s, d, "supplier"), "s_suppkey"),
      fkEdge("orders.o_custkey->customer", ord, "o_custkey", cust, "c_custkey"),
      fkEdge("customer.c_nationkey->nation", cust, "c_nationkey", nat, "n_nationkey"),
      fkEdge("supplier.s_nationkey->nation", tbl(s, d, "supplier"), "s_nationkey", nat, "n_nationkey"),
      fkEdge("nation.n_regionkey->region", nat, "n_regionkey", tbl(s, d, "region"), "r_regionkey"),
      fkEdge("events.user_id->customer", tbl(s, d, "events"), "user_id", cust, "c_custkey"),
      fkEdge("orders.o_custkey->customer@lagged", ord, "o_custkey",
        cust.where(expr("c_custkey % 20 <> 0")), "c_custkey"))
    edges.reduce(_.unionAll(_)).orderBy(col("edge"))
  }
  val fkOrphansSql: String = {
    def e(name: String, child: String, ck: String, parent: String, pk: String,
          parentFilter: String = "") =
      s"""SELECT '$name' AS edge, count(*) AS n_child,
         |       CAST(sum(CASE WHEN p.__pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
         |FROM $child c LEFT JOIN
         |  (SELECT DISTINCT $pk AS __pk FROM $parent $parentFilter) p ON c.$ck = p.__pk""".stripMargin
    Seq(
      e("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      e("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      e("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      e("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      e("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      e("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      e("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
      e("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
      e("orders.o_custkey->customer@lagged", "orders", "o_custkey", "customer", "c_custkey",
        "WHERE c_custkey % 20 <> 0")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY edge")
  }

  // ---------------------------------------------------------- rule checks

  /** dq_rules — declarative column-rule validation: each rule is a boolean
    * predicate; the report is (rule, n_rows, violations, viol_rate). Six
    * rules across two tables cost exactly two table scans — the predicates
    * ride one fused aggregate per table and unpivot via `stack`. Mixed
    * outcome by construction: doc_len_le_500 and ev_value_le_400 fire on
    * real rows, the schema-conformance rules hold at zero.
    */
  val rules: Q = (s, d) => {
    def viol(c: Column) = sum(when(c, 1L).otherwise(0L))
    val docs = tbl(s, d, "documents").agg(
      count(lit(1)).as("n"),
      viol(col("text").isNull).as("v_null"),
      viol(col("n_chars") =!= length(col("text"))).as("v_len"),
      viol(!col("lang").isin("en", "de", "fr", "es", "zh")).as("v_lang"),
      viol(col("n_chars") > 500).as("v_long"))
    val ev = tbl(s, d, "events").agg(
      count(lit(1)).as("n"),
      viol(!col("event_type").isin("view", "click", "purchase", "signup", "error")).as("v_type"),
      viol(col("value") <= 0.0 || col("value") > 400.0).as("v_range"))
    val dRows = docs.select(expr(
      """stack(4,
        |  'doc_text_nonnull',   n, v_null,
        |  'doc_len_matches_text', n, v_len,
        |  'doc_lang_known',     n, v_lang,
        |  'doc_len_le_500',     n, v_long) AS (rule, n_rows, violations)""".stripMargin))
    val eRows = ev.select(expr(
      """stack(2,
        |  'ev_type_known',    n, v_type,
        |  'ev_value_le_400',  n, v_range) AS (rule, n_rows, violations)""".stripMargin))
    dRows.unionAll(eRows)
      .select(col("rule"), col("n_rows"), col("violations"),
        round(col("violations").cast("double") / col("n_rows"), 6).as("viol_rate"))
      .orderBy(col("rule"))
  }
  val rulesSql: String =
    """WITH dv AS (
      |  SELECT count(*) AS n,
      |         CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
      |         CAST(sum(CASE WHEN n_chars <> len(text) THEN 1 ELSE 0 END) AS BIGINT) AS v_len,
      |         CAST(sum(CASE WHEN lang NOT IN ('en','de','fr','es','zh') THEN 1 ELSE 0 END) AS BIGINT) AS v_lang,
      |         CAST(sum(CASE WHEN n_chars > 500 THEN 1 ELSE 0 END) AS BIGINT) AS v_long
      |  FROM documents),
      |ev AS (
      |  SELECT count(*) AS n,
      |         CAST(sum(CASE WHEN event_type NOT IN ('view','click','purchase','signup','error') THEN 1 ELSE 0 END) AS BIGINT) AS v_type,
      |         CAST(sum(CASE WHEN value <= 0.0 OR value > 400.0 THEN 1 ELSE 0 END) AS BIGINT) AS v_range
      |  FROM events),
      |r AS (
      |  SELECT 'doc_text_nonnull' AS rule, n AS n_rows, v_null AS violations FROM dv
      |  UNION ALL SELECT 'doc_len_matches_text', n, v_len FROM dv
      |  UNION ALL SELECT 'doc_lang_known', n, v_lang FROM dv
      |  UNION ALL SELECT 'doc_len_le_500', n, v_long FROM dv
      |  UNION ALL SELECT 'ev_type_known', n, v_type FROM ev
      |  UNION ALL SELECT 'ev_value_le_400', n, v_range FROM ev)
      |SELECT rule, n_rows, violations,
      |       round(CAST(violations AS DOUBLE) / n_rows, 6) AS viol_rate
      |FROM r ORDER BY rule""".stripMargin

  // ------------------------------------------------------ correlation screen

  private val corrCols = Seq(
    "l_quantity", "l_extendedprice", "l_discount", "l_tax", "revenue")
  private val corrPairs: Seq[(String, String)] =
    for { (a, i) <- corrCols.zipWithIndex; b <- corrCols.drop(i + 1) } yield (a, b)

  /** dq_corr — Pearson correlation matrix over lineitem's measure columns
    * plus the derived revenue = l_extendedprice·(1−l_discount): the
    * column-dependence screen a feature/QA pipeline runs to catch a broken
    * generator (everything independent when it shouldn't be) or leakage (a
    * "feature" nearly collinear with a target). Both regimes are visible
    * here: the generator's base measures are mutually independent
    * (|r| < 0.01 on every base pair) while revenue~l_extendedprice ≈ 0.999.
    *
    * One scan: every moment (n, Σx, Σx², Σxy) rides a single fused
    * aggregate and the 10-pair matrix unpivots from that one row via
    * `stack` — O(cols²) arithmetic on one row, the corpus touched once
    * (dq_rules discipline). Exactness: inputs quantize to 4 dp decimals so
    * all sums are order-free integers in disguise. r18 (guide §1.2 "per-
    * task work", the a12_rfm/geo lesson): the 4-dp quantization is now a
    * LONG (`floor(x·10⁴ + 0.5)` — all five measures are nonnegative with
    * an exact ≤4-dp rational value, so this recovers exactly the
    * decimal(17,4) cast's unscaled integer; the former decimal formulation
    * routed every row's 15 products + 16 sums through BigDecimal,
    * ~2 allocations + ~1 µs each). Each product of unscaled longs is
    * ≤ 1.3e18 (price unscaled ≤ 1.1e9) so it fits a long; its SUM would
    * overflow, so every product splits into (div 10⁹, mod 10⁹) halves
    * summed separately — each half-sum ≤ ~1.3e9·rows, inside long through
    * sf1000. The one output row recombines the halves in exact decimal
    * (scale ≥ the true 8-dp scale, so no rounding) and casts to double —
    * BigDecimal→double is correctly rounded from the exact rational, so
    * the doubles (and the 6-dp corr values) are bit-identical to the
    * decimal formulation's, hash-proven against the unchanged oracle
    * (which still sums DECIMAL(19,4) casts in DuckDB).
    */
  val corrMatrix: Q = (s, d) => {
    val B = 1000000000L // split base: products ≤ 1.3e18 = hi·1e9 + lo
    def u(c: String) = floor(col(c) * lit(10000.0d) + lit(0.5d)).cast("long")
    val li = tbl(s, d, "lineitem")
      .withColumn("revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .select(corrCols.map(c => u(c).as(s"u_$c")): _*)
    // `div` (IntegralDivide), NOT `/`: Column./ on longs plans a DOUBLE
    // division, which is inexact past 2^53 — products reach 1.3e18.
    def prodSums(a: String, b: String, tag: String) = Seq(
      sum(expr(s"(u_$a * u_$b) div ${B}L")).as(s"hi_$tag"),
      sum(expr(s"(u_$a * u_$b) % ${B}L")).as(s"lo_$tag"))
    val momentExprs =
      corrCols.flatMap(c => sum(col(s"u_$c")).as(s"su_$c") +: prodSums(c, c, s"ss_$c")) ++
        corrPairs.flatMap { case (a, b) => prodSums(a, b, s"sp_${a}_$b") }
    val agg0 = li.agg(count(lit(1)).cast("double").as("n"), momentExprs: _*)
    // Recombine each split sum into the exact decimal the old plan summed,
    // then cast to double — one row, so the decimal math here is free.
    // Types chosen so every step is exact: hi ≤ ~1.3e9·rows fits
    // decimal(20,0) past sf1000; lo_part = lo/10⁸ is exact at scale 10;
    // su/10⁴ is exact at scale 6.
    val recombined =
      corrCols.map(c => (col(s"su_$c").cast("decimal(20,0)") /
        expr("CAST(10000 AS DECIMAL(5,0))")).as(s"s_$c")) ++
      (corrCols.map(c => s"ss_$c") ++
        corrPairs.map { case (a, b) => s"sp_${a}_$b" }).map(tag =>
        (col(s"hi_$tag").cast("decimal(20,0)") * expr("CAST(10 AS DECIMAL(2,0))") +
          col(s"lo_$tag").cast("decimal(20,0)") /
            expr("CAST(100000000 AS DECIMAL(9,0))")).as(tag))
    val agg = agg0.select(col("n") +: recombined: _*)
    def sd(c: String) = col(c).cast("double")
    val withCorr = corrPairs.foldLeft(agg) { case (df, (a, b)) =>
      df.withColumn(s"corr_${a}_$b", round(
        (col("n") * sd(s"sp_${a}_$b") - sd(s"s_$a") * sd(s"s_$b")) /
          sqrt((col("n") * sd(s"ss_$a") - sd(s"s_$a") * sd(s"s_$a")) *
            (col("n") * sd(s"ss_$b") - sd(s"s_$b") * sd(s"s_$b"))), 6))
    }
    val stackArgs = corrPairs
      .map { case (a, b) => s"'$a~$b', corr_${a}_$b" }.mkString(", ")
    withCorr
      .select(expr(s"stack(${corrPairs.size}, $stackArgs) AS (pair, corr)"))
      .orderBy(col("pair"))
  }
  val corrMatrixSql: String = {
    def dec(c: String) = s"CAST($c AS DECIMAL(19,4))"
    val moments = (corrCols.flatMap(c =>
      Seq(s"sum(${dec(c)}) AS s_$c", s"sum(${dec(c)}*${dec(c)}) AS ss_$c")) ++
      corrPairs.map { case (a, b) => s"sum(${dec(a)}*${dec(b)}) AS sp_${a}_$b" })
      .mkString(",\n         ")
    val rows = corrPairs.map { case (a, b) =>
      s"""SELECT '$a~$b' AS pair,
         |  round((n*CAST(sp_${a}_$b AS DOUBLE) - CAST(s_$a AS DOUBLE)*CAST(s_$b AS DOUBLE))
         |        / sqrt((n*CAST(ss_$a AS DOUBLE) - CAST(s_$a AS DOUBLE)*CAST(s_$a AS DOUBLE))
         |             * (n*CAST(ss_$b AS DOUBLE) - CAST(s_$b AS DOUBLE)*CAST(s_$b AS DOUBLE))), 6) AS corr
         |FROM agg""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH li AS (
       |  SELECT l_quantity, l_extendedprice, l_discount, l_tax,
       |         l_extendedprice * (1.0 - l_discount) AS revenue
       |  FROM lineitem),
       |agg AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |         $moments
       |  FROM li)
       |$rows
       |ORDER BY pair""".stripMargin
  }

  /** dq_stats — ANALYZE-style catalog statistics for the fact table's
    * numeric columns: row count, null count, exact NDV, min, max per
    * column — the statistics a cost-based optimizer (and every data-
    * quality dashboard) reads before planning joins or flagging drift.
    * Two passes: the fused non-distinct aggregates (one codegen-narrow
    * scan, no Expand) plus one stack-unpivoted exact-NDV aggregation,
    * joined on column name (see the in-body note for why this beats the
    * single-agg multi-distinct plan). At 100 TB the exact NDV swaps for
    * approx_count_distinct / the HLL sketch family (sk_hll_est pins that
    * estimator's error) — the report is advisory either way; the gate
    * keeps exact NDV so the oracle hash-matches, the right budget for a
    * per-snapshot ANALYZE job that every subsequent plan consults.
    */
  val stats: Q = (s, d) => {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount")
    // Pass A: every non-distinct aggregate fused into ONE scan — no
    // Expand. Pass B: the 7 exact NDVs come from a stack-unpivoted
    // (column, value-string) stream collapsed by ONE partial-aggregated
    // distinct (value→string is injective per column, so the counts are
    // the column's own NDVs). The previous single-agg formulation let
    // Spark plan the 7-way multi-distinct as an 8× Expand of lineitem —
    // this split scans 1× + 7× stacked rows instead of 8× full rows AND
    // keeps the min/max/null pass codegen-narrow (measured 3.67 → 0.98 s
    // at sf0.1, the suite's former slowest gate).
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"))
    }
    val one = tbl(s, d, "lineitem").agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', null_$c, min_$c, max_$c").mkString(", ")
    val base = one.select(col("n_rows"), expr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, n_null, min_v, max_v)"))
    val ndvStack = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
    val ndv = tbl(s, d, "lineitem")
      .select(expr(s"stack(${cols.size}, $ndvStack) AS (column_name, val)"))
      .groupBy(col("column_name"))
      .agg(countDistinct(col("val")).as("n_distinct"))
    // LEFT join + coalesce (r12 advice): on an empty (or fully filtered)
    // table the NDV groupBy yields 0 rows while pass A still emits the 7
    // stacked report rows — the oracle's global-aggregate form keeps all
    // 7 rows with ndv 0, so an inner join would break parity on empty
    // input.
    base.join(broadcast(ndv), Seq("column_name"), "left")
      .select(col("column_name"), col("n_rows"), col("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_v"), col("max_v"))
      .orderBy(col("column_name"))
  }
  val statsSql: String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount")
    val aggCols = cols.map { c =>
      s"""CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_$c,
         |       CAST(count(DISTINCT $c) AS BIGINT) AS ndv_$c,
         |       CAST(min($c) AS DOUBLE) AS min_$c, CAST(max($c) AS DOUBLE) AS max_$c""".stripMargin
    }.mkString(",\n       ")
    val branches = cols.map(c =>
      s"SELECT '$c' AS column_name, n_rows, null_$c AS n_null, ndv_$c AS n_distinct, min_$c AS min_v, max_$c AS max_v FROM one")
      .mkString("\n  UNION ALL ")
    s"""WITH one AS (
       |  SELECT count(*) AS n_rows,
       |       $aggCols
       |  FROM lineitem)
       |SELECT column_name, n_rows, n_null, n_distinct, min_v, max_v FROM (
       |  $branches)
       |ORDER BY column_name""".stripMargin
  }

  // ------------------------------------------------------------ Benford scan

  /** dq_benford — first-significant-digit distribution of `o_totalprice`
    * against Benford's law, the standard fabricated-data / unit-drift
    * screen an ingest audit runs on any naturally-spanning numeric column
    * (amounts, populations, file sizes). Per digit d ∈ 1..9: observed
    * count and frequency, the Benford expectation log₁₀(1 + 1/d), and the
    * digit's χ² contribution n·(obs − exp)²/exp; the audit verdict is the
    * summed χ² against the 8-df critical value, which a reviewer reads
    * off the 9-row table.
    *
    * Exactness: the digit comes from the DECIMAL STRING of floor(price)
    * (cast of a BIGINT — engine-identical), never from log10 of a double
    * whose boundary behavior differs; counts are exact BIGINTs, and the
    * three float outputs are short identical IEEE formulas quantized to
    * 6 dp. Scale shape: one map-side-combined 9-bucket aggregation over
    * the scan — O(rows) in, 9 rows out, no shuffle beyond the combine.
    */
  val benford: Q = (s, d) => {
    val digits = tbl(s, d, "orders")
      .where(col("o_totalprice") >= 1.0)
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum(col("n_obs")).as("n_total"))
    val expFreq = log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0))
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        round(col("n_obs").cast("double") / col("n_total"), 6).as("obs_freq"),
        round(expFreq, 6).as("benford_freq"),
        round(
          (col("n_obs").cast("double") - col("n_total") * expFreq) *
            (col("n_obs").cast("double") - col("n_total") * expFreq) /
            (col("n_total") * expFreq), 6).as("chi2_part"))
      .orderBy(col("digit"))
  }
  val benfordSql: String =
    """WITH dg AS (
      |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
      |           AS digit,
      |         count(*) AS n_obs
      |  FROM orders WHERE o_totalprice >= 1.0 GROUP BY 1),
      |tot AS (SELECT sum(n_obs) AS n_total FROM dg)
      |SELECT digit, n_obs,
      |       round(CAST(n_obs AS DOUBLE) / n_total, 6) AS obs_freq,
      |       round((ln(1.0 + 1.0 / digit) / ln(10.0)), 6) AS benford_freq,
      |       round((CAST(n_obs AS DOUBLE) - n_total * (ln(1.0 + 1.0 / digit) / ln(10.0)))
      |             * (CAST(n_obs AS DOUBLE) - n_total * (ln(1.0 + 1.0 / digit) / ln(10.0)))
      |             / (n_total * (ln(1.0 + 1.0 / digit) / ln(10.0))), 6) AS chi2_part
      |FROM dg, tot ORDER BY digit""".stripMargin

  /** dq_psi — Population Stability Index of each event type's `value`
    * distribution against the pooled corpus distribution: the standard
    * drift monitor (credit-scoring lineage, now the default ML-serving
    * histogram check). PSI = Σ_bins (p_slice − p_ref)·ln(p_slice/p_ref);
    * the conventional read is < 0.1 stable, 0.1–0.25 investigate,
    * > 0.25 shifted — here it ranks which event types' value profiles
    * deviate most from the blend, the per-source version of what
    * pf_drift does per-snapshot.
    *
    * Binning is fixed-width floor(value/25) — engine-identical integer
    * cells, no quantile estimation inside the gate. The (type × bin)
    * grid is the ev_gapfill-class dimension product (both sides
    * O(dozens) at any corpus size) so zero-count cells participate via
    * Laplace-smoothed (+0.5) frequencies; per-type bin count and the
    * pooled total attach through windows over the grid — no scalar
    * cross join. One corpus scan feeds all three histograms
    * (map-side-combined keyed aggs).
    *
    * Float parity: counts are exact integers; p's are short IEEE
    * formulas; the ln-sum is ~14 terms rounded to 6 dp (the tx_entropy
    * probabilistic-exactness caveat applies to ln's last ulp).
    */
  val psi: Q = (s, d) => {
    val wT = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    val ev = tbl(s, d, "events")
      .select(col("event_type"), floor(col("value") / lit(25.0)).cast("long").as("bin"))
    val tb = ev.groupBy(col("event_type"), col("bin")).agg(count(lit(1)).as("c"))
    val gb = ev.groupBy(col("bin")).agg(count(lit(1)).as("g"))
    val nt = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val cells = nt.crossJoin(broadcast(gb))
      .join(tb, Seq("event_type", "bin"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("nb", count(lit(1)).over(wT).cast("double"))
      .withColumn("n_tot", sum(col("g")).over(wT).cast("double"))
    val pa = (col("c").cast("double") + lit(0.5)) /
      (col("n").cast("double") + lit(0.5) * col("nb"))
    val pb = (col("g").cast("double") + lit(0.5)) /
      (col("n_tot") + lit(0.5) * col("nb"))
    cells.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        round(sum((pa - pb) * log(pa / pb)), 6).as("psi"))
      .orderBy(col("event_type"))
  }
  val psiSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(floor(value / 25.0) AS BIGINT) AS bin FROM events),
      |tb AS (SELECT event_type, bin, count(*) AS c FROM ev GROUP BY 1, 2),
      |gb AS (SELECT bin, count(*) AS g FROM ev GROUP BY 1),
      |nt AS (SELECT event_type, count(*) AS n FROM ev GROUP BY 1),
      |cells AS (
      |  SELECT grid.event_type, grid.n, grid.bin, grid.g, coalesce(tb.c, 0) AS c,
      |         CAST(count(*) OVER (PARTITION BY grid.event_type) AS DOUBLE) AS nb,
      |         CAST(sum(grid.g) OVER (PARTITION BY grid.event_type) AS DOUBLE) AS n_tot
      |  FROM (SELECT nt.event_type, nt.n, gb.bin, gb.g FROM nt CROSS JOIN gb) grid
      |  LEFT JOIN tb ON tb.event_type = grid.event_type AND tb.bin = grid.bin)
      |SELECT event_type, max(n) AS n,
      |       round(sum(((CAST(c AS DOUBLE) + 0.5) / (CAST(n AS DOUBLE) + 0.5 * nb)
      |                   - (CAST(g AS DOUBLE) + 0.5) / (n_tot + 0.5 * nb))
      |                 * ln(((CAST(c AS DOUBLE) + 0.5) / (CAST(n AS DOUBLE) + 0.5 * nb))
      |                      / ((CAST(g AS DOUBLE) + 0.5) / (n_tot + 0.5 * nb)))), 6) AS psi
      |FROM cells GROUP BY event_type ORDER BY event_type""".stripMargin

  // -------------------------------------------- cross-table temporal rule

  /** dq_ordering — the cross-TABLE temporal consistency audit: a line may
    * not ship before its order was placed. Single-table rules (dq_rules)
    * miss exactly this class — the inconsistency lives in the JOIN, the
    * place real pipelines corrupt it (late-arriving dimensions, clock
    * skew between services, partial backfills). Per order priority:
    * line count, violations, violation rate, and the ship-lag envelope
    * (min/mean/max days) — lag moments are exact integer day sums,
    * ratios one IEEE division each, 6 dp. One fact-side join keyed on
    * orderkey (co-partitioned), one map-side-combined aggregation.
    */
  val ordering: Q = (s, d) => {
    val j = tbl(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_date(col("o_orderdate")).as("od"))
      .join(tbl(s, d, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"),
          to_date(col("l_shipdate")).as("sd")), "o_orderkey")
      .withColumn("lag", datediff(col("sd"), col("od")).cast("long"))
    j.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("lag") < 0, 1L).otherwise(0L)).as("n_violations"),
        min(col("lag")).as("min_lag"),
        sum(col("lag")).as("sum_lag"),
        max(col("lag")).as("max_lag"))
      .select(col("o_orderpriority"), col("n_lines"), col("n_violations"),
        round(col("n_violations").cast("double") / col("n_lines"), 6)
          .as("violation_rate"),
        col("min_lag"),
        round(col("sum_lag").cast("double") / col("n_lines"), 6).as("mean_lag"),
        col("max_lag"))
      .orderBy(col("o_orderpriority"))
  }
  val orderingSql: String =
    """WITH j AS (
      |  SELECT o.o_orderpriority,
      |         CAST(datediff('day', CAST(o.o_orderdate AS DATE),
      |                       CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
      |SELECT o_orderpriority, count(*) AS n_lines,
      |       CAST(sum(CASE WHEN lag < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      |       round(CAST(sum(CASE WHEN lag < 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |             / count(*), 6) AS violation_rate,
      |       CAST(min(lag) AS BIGINT) AS min_lag,
      |       round(CAST(sum(lag) AS DOUBLE) / count(*), 6) AS mean_lag,
      |       CAST(max(lag) AS BIGINT) AS max_lag
      |FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------- schema drift

  /** dq_schema_drift — COLUMN-LEVEL drift audit between two ingest
    * slices of the event stream (early-month vs late-month here; in
    * production, yesterday's snapshot vs today's): per column, row
    * count, null rate, exact NDV, and a quantized mean metric (value
    * for numerics, string length for text), plus the two flags a
    * schema-drift monitor alerts on — mean shift > 10% and NDV ratio
    * outside [0.8, 1.25]. This is the whole-schema companion to
    * [[psi]] (one column's distribution) and [[stats]] (one slice's
    * catalog): the check that catches a upstream producer silently
    * changing a column's semantics (new enum value, unit change, null
    * flood) between snapshots.
    *
    * Scale shape: the table unpivots via `stack` into a (slice,
    * column, value) stream — a 4× width-for-rows trade that keeps ONE
    * scan for all columns — and collapses in ONE keyed aggregation on
    * (slice, column); output is O(columns). Exact NDV at gate scale
    * (partial-aggregated distinct); at 100 TB swap in the HLL sketch
    * (sk_hll_est pins its error envelope). The a/b comparison joins two
    * O(columns) frames — broadcast.
    *
    * Cross-engine determinism: NDV counts distinct STRING casts
    * (double→string is injective on observed values in both engines, so
    * the counts agree even where the renderings differ); means quantize
    * to floor(metric·1e6) integers before summing (order-free); flags
    * compare exact-integer-derived IEEE ratios.
    */
  val schemaDrift: Q = (s, d) => {
    val evRaw = tbl(s, d, "events")
    // ts arrives as TIMESTAMP(MICROS) from the driver's tables but as
    // epoch-nanos LONG from legacy/GenScale parquet — branch like
    // Temporal.eventTs so the audit runs against either encoding
    val tsCol = evRaw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts div 1000"))
      case _ => col("ts")
    }
    val ev = evRaw.select(
      when(dayofmonth(tsCol) <= 15, lit("a")).otherwise(lit("b")).as("slice"),
      expr("""stack(4,
             |  'event_type', event_type, CAST(floor(length(event_type) * 1e6) AS BIGINT),
             |  'props', props, CAST(floor(length(props) * 1e6) AS BIGINT),
             |  'user_id', CAST(user_id AS STRING), user_id * CAST(1000000 AS BIGINT),
             |  'value', CAST(value AS STRING), CAST(floor(value * 1e6) AS BIGINT))
             |AS (column_name, val_str, metric_q)""".stripMargin))
    val per = ev.groupBy(col("slice"), col("column_name")).agg(
      count(lit(1)).as("n"),
      sum(when(col("val_str").isNull, 1L).otherwise(0L)).as("n_null"),
      countDistinct(col("val_str")).as("ndv"),
      sum(col("metric_q").cast("decimal(38,0)")).as("smq"))
    def slice(tag: String) = per.where(col("slice") === tag).select(
      col("column_name"),
      col("n").as(s"n_$tag"),
      round(col("n_null").cast("double") / col("n"), 6).as(s"null_rate_$tag"),
      col("ndv").as(s"ndv_$tag"),
      round(col("smq").cast("double") / 1e6 / (col("n") - col("n_null")), 6)
        .as(s"mean_$tag"))
    slice("a").join(broadcast(slice("b")), Seq("column_name"))
      // a slice whose column is ALL NULL has no mean: both-null = stably
      // absent (0), one-null = the null flood itself (1) — never a NULL flag
      .withColumn("mean_drift",
        when(col("mean_a").isNull && col("mean_b").isNull, 0)
          .when(col("mean_a").isNull || col("mean_b").isNull, 1)
          .otherwise((abs(col("mean_b") - col("mean_a")) > abs(col("mean_a")) * 0.1)
            .cast("int")))
      .withColumn("ndv_drift",
        (col("ndv_b").cast("double") < col("ndv_a") * 0.8 ||
          col("ndv_b").cast("double") > col("ndv_a") * 1.25).cast("int"))
      .orderBy(col("column_name"))
  }
  val schemaDriftSql: String =
    """WITH ev AS (
      |  SELECT CASE WHEN day(ts) <= 15 THEN 'a' ELSE 'b' END AS slice,
      |         unnest(['event_type', 'props', 'user_id', 'value']) AS column_name,
      |         unnest([event_type, props, CAST(user_id AS VARCHAR),
      |                 CAST(value AS VARCHAR)]) AS val_str,
      |         unnest([CAST(floor(len(event_type) * 1e6) AS BIGINT),
      |                 CAST(floor(len(props) * 1e6) AS BIGINT),
      |                 user_id * CAST(1000000 AS BIGINT),
      |                 CAST(floor(value * 1e6) AS BIGINT)]) AS metric_q
      |  FROM events),
      |per AS (
      |  SELECT slice, column_name, count(*) AS n,
      |         CAST(sum(CASE WHEN val_str IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |         CAST(count(DISTINCT val_str) AS BIGINT) AS ndv,
      |         sum(CAST(metric_q AS DECIMAL(38,0))) AS smq
      |  FROM ev GROUP BY slice, column_name)
      |SELECT a.column_name,
      |       a.n AS n_a, round(CAST(a.n_null AS DOUBLE) / a.n, 6) AS null_rate_a,
      |       a.ndv AS ndv_a,
      |       round(CAST(a.smq AS DOUBLE) / 1e6 / (a.n - a.n_null), 6) AS mean_a,
      |       b.n AS n_b, round(CAST(b.n_null AS DOUBLE) / b.n, 6) AS null_rate_b,
      |       b.ndv AS ndv_b,
      |       round(CAST(b.smq AS DOUBLE) / 1e6 / (b.n - b.n_null), 6) AS mean_b,
      |       CASE
      |         WHEN a.smq IS NULL AND b.smq IS NULL THEN 0
      |         WHEN a.smq IS NULL OR b.smq IS NULL THEN 1
      |         ELSE CAST(abs(round(CAST(b.smq AS DOUBLE) / 1e6 / (b.n - b.n_null), 6)
      |                  - round(CAST(a.smq AS DOUBLE) / 1e6 / (a.n - a.n_null), 6))
      |              > abs(round(CAST(a.smq AS DOUBLE) / 1e6 / (a.n - a.n_null), 6)) * 0.1
      |              AS INT) END AS mean_drift,
      |       CAST((CAST(b.ndv AS DOUBLE) < a.ndv * 0.8
      |             OR CAST(b.ndv AS DOUBLE) > a.ndv * 1.25) AS INT) AS ndv_drift
      |FROM (SELECT * FROM per WHERE slice = 'a') a
      |JOIN (SELECT * FROM per WHERE slice = 'b') b USING (column_name)
      |ORDER BY column_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "dq_schema_drift" -> schemaDrift,
    "dq_stats"      -> stats,
    "dq_ordering"   -> ordering,
    "dq_fk_orphans" -> fkOrphans,
    "dq_rules"      -> rules,
    "dq_corr"       -> corrMatrix,
    "dq_benford"    -> benford,
    "dq_psi"        -> psi)
  val oracles: Map[String, String] = Map(
    "dq_schema_drift" -> schemaDriftSql,
    "dq_stats"      -> statsSql,
    "dq_ordering"   -> orderingSql,
    "dq_fk_orphans" -> fkOrphansSql,
    "dq_rules"      -> rulesSql,
    "dq_corr"       -> corrMatrixSql,
    "dq_benford"    -> benfordSql,
    "dq_psi"        -> psiSql)
}
