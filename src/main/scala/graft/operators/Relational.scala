package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{t => tbl}

/** Relational operator battery — one query per SURVEY.md §2 operator, each
  * expressed over the driver's generic tables with a DuckDB-equivalent oracle.
  *
  * Conventions that make the hash-compare deterministic:
  *   - every query ends in a total ORDER BY over non-null keys (same in SQL);
  *   - money/quantity aggregates are computed in DECIMAL (exact, order-
  *     independent) and the final value is CAST to DOUBLE on both sides —
  *     the decimal→double conversion is deterministic, so values are
  *     bit-identical regardless of summation order;
  *   - `events.ts` is nanosecond-precision parquet; Spark truncates to
  *     microseconds on read while DuckDB keeps ns, so oracles never emit or
  *     order by raw `ts` — `event_id` is the monotone stand-in.
  *
  * Citations are to the reference behavior each query re-expresses
  * (SURVEY.md §2 row ids, file:line into /root/reference).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- sources

  /** S1 — chunked filtered scan (scripts/index-events.ts:162-198): the only
    * pushed predicates are an equality filter and a range. `.explain` must
    * show PushedFilters + a 4-column ReadSchema.
    */
  val s1ScanFilter: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events")
      .select($"event_id", $"event_type", $"user_id", $"value")
      .where($"event_type" === "click" && $"event_id".between(100L, 900L))
      .orderBy($"event_id")
  }
  val s1ScanFilterSql: String =
    """SELECT event_id, event_type, user_id, value FROM events
      |WHERE event_type = 'click' AND event_id BETWEEN 100 AND 900
      |ORDER BY event_id""".stripMargin

  /** S3 — dimension-enrichment left join (events.ts:44-78 timestamp N+1 →
    * one broadcast left join). Small dim side broadcast explicitly.
    */
  val s3DimJoin: Q = (s, d) => {
    import s.implicits._
    val li = tbl(s, d, "lineitem")
    val p  = tbl(s, d, "part").select($"p_partkey", $"p_name", $"p_brand")
    li.select($"l_orderkey", $"l_linenumber", $"l_partkey")
      .join(broadcast(p), $"l_partkey" === $"p_partkey", "left")
      .select($"l_orderkey", $"l_linenumber", $"p_name", $"p_brand")
      .orderBy($"l_orderkey", $"l_linenumber")
  }
  val s3DimJoinSql: String =
    """SELECT l_orderkey, l_linenumber, p_name, p_brand
      |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** S6 — idempotent upsert (extract-events.ts:95-136): MERGE emulated as
    * full-outer coalesce of `existing` (first half) with `updates` (second
    * half), last-writer-wins per key. event_id is the arrival-order key.
    */
  val s6UpsertMerge: Q = (s, d) => {
    import s.implicits._
    val ev = tbl(s, d, "events").select($"event_id", $"user_id", $"event_type", $"value")
    val existing = ev.where($"event_id" <= 500L)
      .groupBy($"user_id").agg(max_by(struct($"value", $"event_type"), $"event_id").as("st"))
      .select($"user_id", $"st.value".as("old_value"), $"st.event_type".as("old_type"))
    val updates = ev.where($"event_id" > 500L && $"event_id" <= 700L)
      .groupBy($"user_id").agg(max_by(struct($"value", $"event_type"), $"event_id").as("st"))
      .select($"user_id", $"st.value".as("new_value"), $"st.event_type".as("new_type"))
    existing.join(updates, Seq("user_id"), "full_outer")
      .select($"user_id",
        coalesce($"new_value", $"old_value").as("value"),
        coalesce($"new_type", $"old_type").as("event_type"))
      .orderBy($"user_id")
  }
  val s6UpsertMergeSql: String =
    """WITH existing AS (
      |  SELECT user_id, max_by(value, event_id) AS old_value,
      |         max_by(event_type, event_id) AS old_type
      |  FROM events WHERE event_id <= 500 GROUP BY user_id),
      |updates AS (
      |  SELECT user_id, max_by(value, event_id) AS new_value,
      |         max_by(event_type, event_id) AS new_type
      |  FROM events WHERE event_id > 500 AND event_id <= 700 GROUP BY user_id)
      |SELECT coalesce(e.user_id, u.user_id) AS user_id,
      |       coalesce(u.new_value, e.old_value) AS value,
      |       coalesce(u.new_type, e.old_type) AS event_type
      |FROM existing e FULL OUTER JOIN updates u ON e.user_id = u.user_id
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------- transforms

  /** T5 — derived idempotency key (extract-events.ts:89-91). */
  val t5KeyDerive: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events")
      .select(concat_ws("_", $"user_id", $"event_id").as("row_key"),
        $"event_type")
      .where($"event_id" <= 200L)
      .orderBy($"row_key")
  }
  val t5KeyDeriveSql: String =
    """SELECT user_id || '_' || event_id AS row_key, event_type
      |FROM events WHERE event_id <= 200 ORDER BY row_key""".stripMargin

  /** T7 — display formatters (events.ts:253-263): shorten + date format. */
  val t7Format: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "orders")
      .select($"o_orderkey",
        concat(substring($"o_orderpriority", 1, 4), lit("..."))
          .as("prio_short"),
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_day"))
      .where($"o_orderkey" <= 2000L)
      .orderBy($"o_orderkey")
  }
  val t7FormatSql: String =
    """SELECT o_orderkey, substring(o_orderpriority, 1, 4) || '...' AS prio_short,
      |       strftime(o_orderdate, '%Y-%m-%d') AS order_day
      |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------ aggregations

  /** A1 — count by type (status.ts:65-71): one pass, vs reference's 7 queries. */
  val a1CountByType: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events").groupBy($"event_type").count()
      .select($"event_type", $"count".as("n"))
      .orderBy($"event_type")
  }
  val a1CountByTypeSql: String =
    "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type"

  /** A2 — percentage of total (status.ts:84-89): unpartitioned analytic
    * window over the 5-row grouped result (cheap — window input is tiny).
    */
  val a2PctOfTotal: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events").groupBy($"event_type").count()
      .withColumn("pct",
        ($"count" * lit(100.0)) / sum($"count").over(Window.partitionBy()))
      .select($"event_type", $"count".as("n"), $"pct")
      .orderBy($"event_type")
  }
  val a2PctOfTotalSql: String =
    """SELECT event_type, count(*) AS n,
      |       (count(*) * CAST(100.0 AS DOUBLE)) / CAST(sum(count(*)) OVER () AS DOUBLE) AS pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** A3 — top-1 latest (status.ts:96-99): max_by on the monotone key. */
  val a3Latest: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events").agg(
      max($"event_id").as("last_event_id"),
      max_by($"event_type", $"event_id").as("last_type"),
      max_by($"user_id", $"event_id").as("last_user"))
  }
  val a3LatestSql: String =
    """SELECT max(event_id) AS last_event_id,
      |       max_by(event_type, event_id) AS last_type,
      |       max_by(user_id, event_id) AS last_user
      |FROM events""".stripMargin

  /** A4 — filtered count (events/actions.ts:49). */
  val a4FilteredCount: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events")
      .where($"event_type" === "purchase" && $"value" > 50.0)
      .agg(count(lit(1)).as("total"))
  }
  val a4FilteredCountSql: String =
    "SELECT count(*) AS total FROM events WHERE event_type = 'purchase' AND value > 50.0"

  /** A5 — per-chunk counts by type (index-events.ts:201-254): the hand-rolled
    * chunk loop becomes one grouped aggregation over a derived bucket column.
    */
  val a5ChunkCounts: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events")
      .withColumn("chunk", floor($"event_id" / 250L).cast("long"))
      .groupBy($"chunk", $"event_type").count()
      .select($"chunk", $"event_type", $"count".as("n"))
      .orderBy($"chunk", $"event_type")
  }
  val a5ChunkCountsSql: String =
    """SELECT CAST(floor(event_id / 250.0) AS BIGINT) AS chunk, event_type, count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY chunk, event_type""".stripMargin

  /** A6 — sync-lag derivation (actions.ts:125-143): scalar arithmetic over a
    * max — the "chain head" is a literal, as in the reference UI.
    */
  val a6Lag: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events").agg(max($"event_id").as("last_id"))
      .select($"last_id", (lit(2000000L) - $"last_id").as("lag"),
        ($"last_id" + 1L).as("resume_from"))
  }
  val a6LagSql: String =
    """SELECT max(event_id) AS last_id, 2000000 - max(event_id) AS lag,
      |       max(event_id) + 1 AS resume_from FROM events""".stripMargin

  /** A7 — hierarchical totals via ROLLUP (engine surface beyond the
    * reference: subtotal+grand-total in one pass). Grouping nulls are
    * coalesced to 'ALL' so the hash compare is unambiguous.
    */
  val a7Rollup: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"), $"n")
      .orderBy($"status", $"priority")
  }
  val a7RollupSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |       coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** A8 — time bucketing: monthly order counts + exact revenue. */
  val a8Monthly: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "orders")
      .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("month"))
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy($"month")
  }
  val a8MonthlySql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |       count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1 ORDER BY month""".stripMargin

  /** A11 — month-over-month growth: the lag-window derivative of the a8
    * monthly rollup (revenue delta and relative growth, 6-dp). The window
    * is ordered but UNPARTITIONED by design — its input is the O(months)
    * aggregate, never the fact table (the w6_prefix_sum bucket-total
    * precedent), so the single-partition sort touches dozens of rows at
    * any corpus size. Exact decimal sums feed the double quotient only at
    * the end (suite parity rule).
    */
  val a11Growth: Q = (s, d) => {
    import s.implicits._
    val monthly = tbl(s, d, "orders")
      .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("month"))
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("total"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"month")
    monthly
      .withColumn("prev", lag($"total", 1).over(w))
      // decimal→double BEFORE arithmetic: both engines then run the same
      // double ops on identical (exact) inputs — decimal division scale
      // rules differ between engines, double division does not.
      .select($"month", $"total".cast("double").as("total"),
        round($"total".cast("double") - $"prev".cast("double"), 6).as("delta"),
        round(($"total".cast("double") - $"prev".cast("double")) / $"prev".cast("double"), 6)
          .as("growth"))
      .orderBy($"month")
  }
  val a11GrowthSql: String =
    """WITH m AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      |  FROM orders GROUP BY 1),
      |l AS (SELECT month, total, lag(total) OVER (ORDER BY month) AS prev FROM m)
      |SELECT month, CAST(total AS DOUBLE) AS total,
      |       round(CAST(total AS DOUBLE) - CAST(prev AS DOUBLE), 6) AS delta,
      |       round((CAST(total AS DOUBLE) - CAST(prev AS DOUBLE)) / CAST(prev AS DOUBLE), 6) AS growth
      |FROM l ORDER BY month""".stripMargin

  /** a12_rfm — RFM customer segmentation: recency (days since last
    * order, vs the dataset's max date), frequency (order count), and
    * monetary (lifetime cents) per customer, each cut into terciles at
    * exact percentile thresholds, then segment-level rollups. The
    * classic warehouse cohorting every CRM/marketing pipeline runs.
    *
    * Shape: one customer-keyed aggregation of orders; the six tercile
    * cutoffs are ONE 1-row aggregate over that O(customers) table,
    * broadcast back (tx_pp_bucket's threshold-broadcast pattern — no
    * global sort, no ntile window over the corpus); segment assignment
    * is a stateless projection and the rollup is O(27) groups. Money in
    * integer cents (sn_apply discipline), thresholds from `percentile`
    * ↔ `quantile_cont` (shared (n−1)·q interpolation, round-6), the
    * integer measures compare against identical threshold doubles in
    * both engines.
    *
    * Plan-audit note (r15 verdict item 2, measured r16): the per-
    * customer table feeds both the threshold aggregate and the segment
    * rollup, and because the fan-out re-derives it per branch with
    * fresh expression ids, ReuseExchange cannot match — the executed
    * plan holds TWO orders shuffle+aggs and FOUR orders scans. That
    * duplication is deliberately KEPT here: materializing c once
    * (`.localCheckpoint()` after the agg) was A/B-measured sf10
    * 9.81→10.16 s (wash — the duplicate branches overlap on idle cores)
    * and sf0.1 ~0.4→1.3 s (eager-job overhead dominates at bench
    * scale), so dedup only costs local wall. On a shared 100 TB cluster
    * the trade flips — two full orders scans are real money — and the
    * deployment shape is exactly that one-line localCheckpoint (or a
    * session-cached customers-sized table). PERF.md r16 carries the
    * numbers.
    */
  val a12Rfm: Q = (s, d) => {
    import s.implicits._
    val maxDay = tbl(s, d, "orders")
      .agg(max(to_date($"o_orderdate")).as("max_day"))
    val c = tbl(s, d, "orders")
      .crossJoin(broadcast(maxDay))
      .groupBy($"o_custkey")
      .agg(
        datediff(first($"max_day"), max(to_date($"o_orderdate"))).cast("long").as("r"),
        count(lit(1)).as("f"),
        // exact integer cents via floor(+0.5), not round(): Spark's round
        // on a double routes through BigDecimal.valueOf(Double.toString)
        // — ~1 µs/row, and this one ran per ORDER row (15 M at sf10; the
        // geo/rj_band_knn lesson). Prices are positive 2-dp decimals, so
        // x·100 is within ~1e-9 of an integer and floor(+0.5) recovers
        // the same integer round() did.
        sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("m"))
    val t = c.agg(
      round(expr("percentile(r, 0.333333)"), 6).as("r1"),
      round(expr("percentile(r, 0.666667)"), 6).as("r2"),
      round(expr("percentile(f, 0.333333)"), 6).as("f1"),
      round(expr("percentile(f, 0.666667)"), 6).as("f2"),
      round(expr("percentile(m, 0.333333)"), 6).as("m1"),
      round(expr("percentile(m, 0.666667)"), 6).as("m2"))
    def seg(v: String, t1: String, t2: String) =
      when(col(v) <= col(t1), 1).when(col(v) <= col(t2), 2).otherwise(3).cast("int")
    c.crossJoin(broadcast(t))
      .select(seg("r", "r1", "r2").as("r_seg"), seg("f", "f1", "f2").as("f_seg"),
        seg("m", "m1", "m2").as("m_seg"), $"m")
      .groupBy($"r_seg", $"f_seg", $"m_seg")
      .agg(count(lit(1)).as("n_customers"),
        round(sum($"m") / 100.0, 2).as("sum_monetary"))
      .orderBy($"r_seg", $"f_seg", $"m_seg")
  }
  val a12RfmSql: String =
    """WITH c AS (
      |  SELECT o_custkey,
      |         datediff('day', max(CAST(o_orderdate AS DATE)),
      |                  (SELECT max(CAST(o_orderdate AS DATE)) FROM orders)) AS r,
      |         count(*) AS f,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m
      |  FROM orders GROUP BY o_custkey),
      |t AS (SELECT round(quantile_cont(r, 0.333333), 6) AS r1,
      |             round(quantile_cont(r, 0.666667), 6) AS r2,
      |             round(quantile_cont(f, 0.333333), 6) AS f1,
      |             round(quantile_cont(f, 0.666667), 6) AS f2,
      |             round(quantile_cont(m, 0.333333), 6) AS m1,
      |             round(quantile_cont(m, 0.666667), 6) AS m2
      |      FROM c),
      |seg AS (
      |  SELECT CASE WHEN r <= r1 THEN 1 WHEN r <= r2 THEN 2 ELSE 3 END AS r_seg,
      |         CASE WHEN f <= f1 THEN 1 WHEN f <= f2 THEN 2 ELSE 3 END AS f_seg,
      |         CASE WHEN m <= m1 THEN 1 WHEN m <= m2 THEN 2 ELSE 3 END AS m_seg,
      |         m
      |  FROM c CROSS JOIN t)
      |SELECT r_seg, f_seg, m_seg, count(*) AS n_customers,
      |       round(CAST(sum(m) AS BIGINT) / 100.0, 2) AS sum_monetary
      |FROM seg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** T8 — semi-structured extraction: JSON payload field (events.props). */
  val t8Json: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events")
      .where($"event_id" <= 300L)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .orderBy($"event_id")
  }
  val t8JsonSql: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events WHERE event_id <= 300 ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------ query surface

  /** Q1 — getEvents filter+sort+paginate (events/actions.ts:14-60): page 3,
    * limit 20, sorted newest-first. A distributed top-k
    * (TakeOrderedAndProject: per-task top 60, tiny driver merge) feeds the
    * offset window, so row_number only ever sees page*limit rows. A global
    * row_number over the filtered table would single-partition the whole
    * scan — the 100 TB cliff this avoids.
    */
  val q1Page: Q = (s, d) => {
    import s.implicits._
    val w = Window.orderBy($"event_id".desc)
    tbl(s, d, "events")
      .where($"event_type" === "view")
      .select($"event_id", $"user_id", $"value")
      .orderBy($"event_id".desc)
      .limit(60)
      .withColumn("rn", row_number().over(w).cast("long"))
      .where($"rn" > 40)
      .select($"event_id", $"user_id", $"value", $"rn")
      .orderBy($"event_id".desc)
  }
  val q1PageSql: String =
    """SELECT event_id, user_id, value, rn FROM (
      |  SELECT event_id, user_id, value,
      |         row_number() OVER (ORDER BY event_id DESC) AS rn
      |  FROM events WHERE event_type = 'view')
      |WHERE rn > 40 AND rn <= 60 ORDER BY event_id DESC""".stripMargin

  /** Q1-keyset — the 100 TB-safe pagination variant (SURVEY.md §7.2 #4):
    * seek-below predicate + limit instead of a global-sort offset window.
    * The predicate prunes at the scan; no single-partition window.
    */
  val q1Keyset: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events")
      .where($"event_type" === "view" && $"event_id" < 5000L)
      .select($"event_id", $"user_id", $"value")
      .orderBy($"event_id".desc)
      .limit(20)
  }
  val q1KeysetSql: String =
    """SELECT event_id, user_id, value FROM events
      |WHERE event_type = 'view' AND event_id < 5000
      |ORDER BY event_id DESC LIMIT 20""".stripMargin

  /** Q2 — disjunctive multi-field filter (mongodb.ts:75-94): OR of
    * (type, field) conjunctions, ascending sort.
    */
  val q2MultiOr: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events")
      .where(($"event_type" === "click" && $"value" > 95.0) ||
             ($"event_type" === "purchase" && $"value" < 5.0) ||
             ($"user_id" === 42L))
      .select($"event_id", $"event_type", $"user_id", $"value")
      .orderBy($"event_id")
  }
  val q2MultiOrSql: String =
    """SELECT event_id, event_type, user_id, value FROM events
      |WHERE (event_type = 'click' AND value > 95.0)
      |   OR (event_type = 'purchase' AND value < 5.0)
      |   OR user_id = 42
      |ORDER BY event_id""".stripMargin

  /** Q3 — point lookup (mongodb.ts:99-107). */
  val q3PointLookup: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events").where($"event_id" === 123L)
      .select($"event_id", $"event_type", $"user_id", $"value")
  }
  val q3PointLookupSql: String =
    "SELECT event_id, event_type, user_id, value FROM events WHERE event_id = 123"

  /** Q4 — new-vs-existing split as anti-join (extract-events.ts:109-116):
    * customers with no orders after a cutoff (the orders side is filtered so
    * the anti-join result is non-trivial at every scale factor).
    */
  val q4AntiJoin: Q = (s, d) => {
    import s.implicits._
    val c = tbl(s, d, "customer")
    val o = tbl(s, d, "orders")
      .where($"o_orderdate" >= lit("1999-06-01").cast("timestamp"))
      .select($"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }
  val q4AntiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-06-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  /** Q5 — top-k sort (status.ts:74): types by count desc, k=3. */
  val q5TopK: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events").groupBy($"event_type").count()
      .select($"event_type", $"count".as("n"))
      .orderBy($"n".desc, $"event_type")
      .limit(3)
  }
  val q5TopKSql: String =
    """SELECT event_type, count(*) AS n FROM events GROUP BY event_type
      |ORDER BY n DESC, event_type LIMIT 3""".stripMargin

  // ----------------------------------------------- entries-fold primitives

  /** E1 — first-writer-wins creation attrs (mongodb.ts:166-183 $setOnInsert):
    * first event per user via ascending row_number.
    */
  val e1FirstPerKey: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    tbl(s, d, "events")
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"user_id", $"event_id".as("first_event_id"),
        $"event_type".as("first_type"))
      .orderBy($"user_id")
  }
  val e1FirstPerKeySql: String =
    """SELECT user_id, event_id AS first_event_id, event_type AS first_type FROM (
      |  SELECT user_id, event_id, event_type,
      |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** E2 — $addToSet children (mongodb.ts:185-194): set semantics via
    * collect_set; emitted as a sorted joined string (stable across engines).
    */
  val e2CollectSet: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events")
      .groupBy($"user_id")
      .agg(concat_ws(",", sort_array(collect_set($"event_type"))).as("types"))
      .orderBy($"user_id")
  }
  val e2CollectSetSql: String =
    """SELECT user_id, string_agg(event_type, ',' ORDER BY event_type) AS types
      |FROM (SELECT DISTINCT user_id, event_type FROM events)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** E4/E5 — last-writer-wins per (entity, label) (mongodb.ts:198-239):
    * latest value per (user, type) keyed by arrival order.
    */
  val e4LastWriter: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events")
      .groupBy($"user_id", $"event_type")
      .agg(max_by($"value", $"event_id").as("last_value"),
        max($"event_id").as("last_event_id"))
      .orderBy($"user_id", $"event_type")
  }
  val e4LastWriterSql: String =
    """SELECT user_id, event_type, max_by(value, event_id) AS last_value,
      |       max(event_id) AS last_event_id
      |FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin

  /** E8 — lastUpdateBlock bump (mongodb.ts:179,191,...): max over the union
    * of all transition streams per key.
    */
  val e8LastUpdate: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events")
      .groupBy($"user_id").agg(max($"event_id").as("last_update"),
        count(lit(1)).as("n_transitions"))
      .orderBy($"user_id")
  }
  val e8LastUpdateSql: String =
    """SELECT user_id, max(event_id) AS last_update, count(*) AS n_transitions
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // --------------------------------------------------- window / union / misc

  /** W2 — running aggregate (A5 running totals). Summed over an integer
    * projection of `value`: engines may associate float additions in the
    * frame differently, so the running sum is kept in exact arithmetic.
    */
  val w2RunningSum: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tbl(s, d, "events")
      .where($"user_id" < 20L)
      .select($"user_id", $"event_id",
        sum(floor($"value").cast("long")).over(w).as("running_value"))
      .orderBy($"user_id", $"event_id")
  }
  val w2RunningSumSql: String =
    """SELECT user_id, event_id,
      |       CAST(sum(CAST(floor(value) AS BIGINT))
      |         OVER (PARTITION BY user_id ORDER BY event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_value
      |FROM events WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin

  /** U1 — union of per-type projections with missing columns (T2 wide-table
    * rebuild): unionByName(allowMissingColumns).
    */
  val u1Union: Q = (s, d) => {
    import s.implicits._
    val ev = tbl(s, d, "events")
    val clicks = ev.where($"event_type" === "click")
      .select($"event_id", $"user_id", $"value".as("click_value"))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"value".as("purchase_value"))
    clicks.unionByName(purchases, allowMissingColumns = true)
      .orderBy($"event_id")
  }
  val u1UnionSql: String =
    """SELECT event_id, user_id, value AS click_value, NULL AS purchase_value
      |FROM events WHERE event_type = 'click'
      |UNION ALL
      |SELECT event_id, user_id, NULL AS click_value, value AS purchase_value
      |FROM events WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  /** U2/U3 — INTERSECT / EXCEPT (SURVEY §2.6 set-operation completeness):
    * users who both clicked and purchased / early event-ids that are not
    * errors (every user hits every type at test scale, so a user-level
    * EXCEPT would be vacuously empty — the id-range form removes ~20% of
    * its left side at all sfs, exercising real anti-join rows).
    * Spark plans both as aggregated joins (semi/anti after distinct) —
    * one shuffle on the compared key, no row-pair blowup.
    */
  val u2Intersect: Q = (s, d) => {
    import s.implicits._
    val ev = tbl(s, d, "events")
    ev.where($"event_type" === "click").select($"user_id")
      .intersect(ev.where($"event_type" === "purchase").select($"user_id"))
      .orderBy($"user_id")
  }
  val u2IntersectSql: String =
    """SELECT user_id FROM events WHERE event_type = 'click'
      |INTERSECT
      |SELECT user_id FROM events WHERE event_type = 'purchase'
      |ORDER BY user_id""".stripMargin

  val u3Except: Q = (s, d) => {
    import s.implicits._
    val ev = tbl(s, d, "events")
    ev.where($"event_id" < 1000L).select($"event_id")
      .except(ev.where($"event_type" === "error").select($"event_id"))
      .orderBy($"event_id")
  }
  val u3ExceptSql: String =
    """SELECT event_id FROM events WHERE event_id < 1000
      |EXCEPT
      |SELECT event_id FROM events WHERE event_type = 'error'
      |ORDER BY event_id""".stripMargin

  /** U4/U5 — INTERSECT ALL / EXCEPT ALL: the BAG-semantics set ops u2/u3
    * don't cover — multiplicities survive (min of the two sides /
    * left-minus-right per key), which is what reconciling event streams
    * with legitimate repeats needs (distinct-first would erase the very
    * duplication being measured). user_id repeats per type at every sf, so
    * both outputs carry real multiplicities. Spark plans these without
    * materializing row copies: a count-aggregate per side, a join, and a
    * generate of min(cl, cr) / (cl − cr) rows — one shuffle on the
    * compared key, same as u2/u3.
    */
  val u4IntersectAll: Q = (s, d) => {
    import s.implicits._
    val ev = tbl(s, d, "events")
    ev.where($"event_type" === "click").select($"user_id")
      .intersectAll(ev.where($"event_type" === "purchase").select($"user_id"))
      .orderBy($"user_id")
  }
  val u4IntersectAllSql: String =
    """SELECT user_id FROM events WHERE event_type = 'click'
      |INTERSECT ALL
      |SELECT user_id FROM events WHERE event_type = 'purchase'
      |ORDER BY user_id""".stripMargin

  val u5ExceptAll: Q = (s, d) => {
    import s.implicits._
    val ev = tbl(s, d, "events")
    ev.where($"event_type" === "click").select($"user_id")
      .exceptAll(ev.where($"event_type" === "error").select($"user_id"))
      .orderBy($"user_id")
  }
  val u5ExceptAllSql: String =
    """SELECT user_id FROM events WHERE event_type = 'click'
      |EXCEPT ALL
      |SELECT user_id FROM events WHERE event_type = 'error'
      |ORDER BY user_id""".stripMargin

  /** W5 — RANGE-frame window (value-based frame, vs w2's row cumsum):
    * per-type moving sum over an event_id RANGE of 100 — rows with equal
    * ordering values share a frame, which ROWS frames can't express.
    * Integer-valued summand keeps the hash compare drift-free.
    */
  val w5RangeFrame: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"event_id")
      .rangeBetween(-100L, Window.currentRow)
    tbl(s, d, "events")
      .where($"event_id" < 2000L)
      .select($"event_id", $"event_type",
        sum(floor($"value").cast("long")).over(w).as("moving"))
      .orderBy($"event_id", $"event_type")
  }
  val w5RangeFrameSql: String =
    """SELECT event_id, event_type,
      |       CAST(sum(CAST(floor(value) AS BIGINT)) OVER (
      |         PARTITION BY event_type ORDER BY event_id
      |         RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving
      |FROM events WHERE event_id < 2000
      |ORDER BY event_id, event_type""".stripMargin

  /** A9 — pivot (wide per-type aggregate): the columnar form of the
    * reference's per-type dashboards (actions.ts:92-110). Explicit pivot
    * value list keeps the plan a single pass (no distinct-values pre-query)
    * and the output schema stable.
    */
  val a9Pivot: Q = (s, d) => {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    tbl(s, d, "events")
      .groupBy($"user_id")
      .pivot("event_type", types)
      .agg(sum(floor($"value").cast("long")))
      .na.fill(0L, types)
      .orderBy($"user_id")
  }
  val a9PivotSql: String =
    """SELECT user_id,
      |  CAST(sum(CASE WHEN event_type='click' THEN CAST(floor(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS click,
      |  CAST(sum(CASE WHEN event_type='error' THEN CAST(floor(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS error,
      |  CAST(sum(CASE WHEN event_type='purchase' THEN CAST(floor(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(sum(CASE WHEN event_type='signup' THEN CAST(floor(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS signup,
      |  CAST(sum(CASE WHEN event_type='view' THEN CAST(floor(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** W4 — ntile decile assignment over per-user totals. The global window
    * runs AFTER the aggregate, over |users| rows — fine at dashboard
    * cardinalities. When |users| itself is huge, exact equal-size buckets
    * are inherently a global sort; the scale alternative is boundary
    * assignment from a quantile sketch (different remainder semantics),
    * provided as Sketches.approxNtileBounds/assignByBounds.
    * Tie-break on user_id makes the ntile deterministic.
    */
  val w4Ntile: Q = (s, d) => {
    import s.implicits._
    val w = Window.orderBy($"total", $"user_id")
    tbl(s, d, "events")
      .groupBy($"user_id").agg(sum(floor($"value").cast("long")).as("total"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .orderBy($"user_id")
  }
  val w4NtileSql: String =
    """WITH tot AS (SELECT user_id, CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS total
      |             FROM events GROUP BY user_id)
      |SELECT user_id, total, CAST(ntile(10) OVER (ORDER BY total, user_id) AS BIGINT) AS decile
      |FROM tot ORDER BY user_id""".stripMargin

  /** D1 — exact distinct (set-op surface, SURVEY §2.6). */
  val d1Distinct: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "events").select($"user_id", $"event_type").distinct()
      .orderBy($"user_id", $"event_type")
  }
  val d1DistinctSql: String =
    "SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type"

  // ---------------------------------------------------------- TPC-H classics

  /** TPC-H Q1-shaped pricing summary: exact decimal arithmetic, final DOUBLE.
    * The workhorse scan+agg benchmark query.
    */
  val tpchQ1: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "lineitem")
      .where($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum(($"l_extendedprice".cast("decimal(18,2)") *
             (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
          .cast("decimal(30,4)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  val tpchQ1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-shaped: 3-way join + agg + top-k revenue. Customer is the small
    * side → broadcast; orders↔lineitem shuffles on the join key once.
    */
  val tpchQ3: Q = (s, d) => {
    import s.implicits._
    val c = tbl(s, d, "customer").where($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val o = tbl(s, d, "orders").select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val l = tbl(s, d, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey")
      .agg(sum(($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
        .cast("decimal(30,4)")).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }
  val tpchQ3Sql: String =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Multi-way star join through nation/region — supplier accounts rolled up
    * by region. Both dims broadcast; one shuffle for the final agg.
    */
  val j1StarJoin: Q = (s, d) => {
    import s.implicits._
    val sup = tbl(s, d, "supplier")
    val nat = tbl(s, d, "nation").select($"n_nationkey", $"n_regionkey")
    val reg = tbl(s, d, "region").select($"r_regionkey", $"r_name")
    sup.join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n_suppliers"),
        sum($"s_acctbal".cast("decimal(18,2)")).cast("double").as("total_acctbal"))
      .orderBy($"r_name")
  }
  val j1StarJoinSql: String =
    """SELECT r_name, count(*) AS n_suppliers,
      |       CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** TPC-H Q5-shaped: 6-table join — revenue by nation for one region and
    * one order-date year. Join order matters at 100 TB: lineitem (the fact)
    * shuffles ONCE on l_orderkey against the date-filtered orders; every
    * dimension (customer, supplier, nation, region) broadcasts. The
    * c_nationkey = s_nationkey condition rides the supplier broadcast join
    * as a residual — no extra shuffle.
    */
  val tpchQ5: Q = (s, d) => {
    import s.implicits._
    val reg = tbl(s, d, "region").where($"r_name" === "ASIA").select($"r_regionkey")
    val nat = tbl(s, d, "nation").join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val cus = tbl(s, d, "customer").join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_nationkey")
    val ord = tbl(s, d, "orders")
      .where($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
             $"o_orderdate" <  lit("1997-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val sup = tbl(s, d, "supplier").select($"s_suppkey", $"s_nationkey")
    tbl(s, d, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cus), $"o_custkey" === $"c_custkey")
      .join(broadcast(sup),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum(($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
        .cast("decimal(30,4)")).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }
  val tpchQ5Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q18-shaped (large-volume customer): a HAVING-filtered aggregate
    * feeding a join — the one aggregate shape the rest of the suite
    * doesn't exercise. Spark-first plan: lineitem aggregates ONCE per
    * order (the HAVING filter and the output quantity reuse the same
    * aggregation — the classic Q18 double-scan is folded away), then the
    * small surviving key set joins orders and customer. At 100 TB the
    * fact shuffles once on l_orderkey; the survivors of HAVING are a few
    * permil of orders, so the orders/customer joins run on a sliver.
    * Decimal-then-double on l_quantity (double in parquet) keeps the sum
    * order-independent and the HAVING cut exact in both engines; unique
    * o_orderkey in the sort makes the LIMIT row set deterministic.
    */
  val tpchQ18: Q = (s, d) => {
    import s.implicits._
    val big = tbl(s, d, "lineitem")
      .select($"l_orderkey", $"l_quantity")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast("decimal(18,2)")).as("qty"))
      .where($"qty" > 200)
    // Plan-audit note (r15 verdict item 2, measured r16): AQE plans the
    // orders join from the agg STAGE's size (every order, pre-HAVING),
    // so it sort-merges with a full orders shuffle even though the
    // survivors are a few permil. The materialize-survivors-then-
    // broadcast variant (localCheckpoint + count-gated broadcast) was
    // A/B-measured sf10 9.56→10.02 s: locally the orders shuffle fully
    // overlaps the lineitem aggregation on idle cores, and the
    // checkpoint only serializes the two. The wall floor is the
    // inherent lineitem agg. On a shared 100 TB cluster — where the
    // orders shuffle is real money and survivors may outgrow a
    // broadcast anyway — that variant, with its count-gated fallback to
    // the shuffle join, is the deployment shape. PERF.md r16.
    val ord = tbl(s, d, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
    val cus = tbl(s, d, "customer").select($"c_custkey", $"c_name")
    big.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cus), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", $"qty".cast("double").as("total_qty"))
      .orderBy($"o_totalprice".desc, $"o_orderdate", $"o_orderkey")
      .limit(100)
  }
  val tpchQ18Sql: String =
    """WITH big AS (
      |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200)
      |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |       CAST(qty AS DOUBLE) AS total_qty
      |FROM big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H Q6-shaped (forecast revenue): the pure-scan aggregate — no
    * join, no group, just predicates × one sum. The whole query should
    * collapse to a single WholeStageCodegen scan stage with every
    * predicate in PushedFilters; at 100 TB this is the query shape that
    * proves pushdown works, because any unpushed filter shows up as a
    * full-corpus decode. Decimal accumulate, double out (suite rule).
    */
  val tpchQ6: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "lineitem")
      .where($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
             $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
             $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
             $"l_quantity" < 24)
      .agg(sum(($"l_extendedprice".cast("decimal(18,2)") *
            $"l_discount".cast("decimal(18,2)")).cast("decimal(30,4)"))
        .cast("double").as("revenue"))
  }
  val tpchQ6Sql: String =
    """SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                    CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4)))
      |            AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q10-shaped (returned-item reporting): revenue lost to returns
    * per customer, top 20. Spark-first plan inversion: the textbook Q10
    * joins customer/nation BEFORE aggregating (grouping by five customer
    * attributes); here the fact aggregates FIRST on o_custkey alone —
    * lineitem shuffles once against the quarter-filtered orders, and the
    * customer/nation attributes broadcast onto the ~|customers| aggregate
    * rows afterwards. Same result (custkey is the key), but the big
    * shuffle carries one bigint instead of names/balances — at 100 TB
    * that's the difference between shuffling keys and shuffling the
    * customer table. Revenue is projected to double before ranking so
    * both engines order identical values.
    */
  val tpchQ10: Q = (s, d) => {
    import s.implicits._
    val ord = tbl(s, d, "orders")
      .where($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
             $"o_orderdate" <  lit("1996-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val rev = tbl(s, d, "lineitem")
      .where($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(sum(($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
        .cast("decimal(30,4)")).cast("double").as("revenue"))
    val cus = tbl(s, d, "customer")
      .join(broadcast(tbl(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
    rev.join(broadcast(cus), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"revenue", $"c_acctbal", $"n_name")
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }
  val tpchQ10Sql: String =
    """SELECT c_custkey, c_name,
      |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |           AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
      |       c_acctbal, n_name
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q14-shaped (promotion effect): conditional share of revenue —
    * one month of the fact, part dimension broadcast, a CASE inside the
    * sum. The two sums ride ONE aggregation over one scan (no
    * second pass for the denominator). Both decimal sums are cast to
    * double before the division so the quotient is the same double in
    * both engines; round-6 by suite convention.
    */
  val tpchQ14: Q = (s, d) => {
    import s.implicits._
    val prt = tbl(s, d, "part").select($"p_partkey", $"p_type")
    tbl(s, d, "lineitem")
      .where($"l_shipdate" >= lit("1996-03-01").cast("timestamp") &&
             $"l_shipdate" <  lit("1996-04-01").cast("timestamp"))
      .select($"l_partkey", $"l_extendedprice", $"l_discount")
      .join(broadcast(prt), $"l_partkey" === $"p_partkey")
      .withColumn("disc_price",
        ($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
          .cast("decimal(30,4)"))
      .agg(
        sum(when($"p_type" === "PROMO", $"disc_price")).cast("double").as("promo"),
        sum($"disc_price").cast("double").as("total"))
      .select(round($"promo" * 100 / $"total", 6).as("promo_revenue"))
  }
  val tpchQ14Sql: String =
    """SELECT round(CAST(sum(CASE WHEN p_type = 'PROMO' THEN disc_price END) AS DOUBLE)
      |             * 100 /
      |             CAST(sum(disc_price) AS DOUBLE), 6) AS promo_revenue
      |FROM (
      |  SELECT p_type,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |              AS DECIMAL(30,4)) AS disc_price
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00')""".stripMargin

  /** TPC-H Q7-shaped (volume shipping): revenue between a nation PAIR by
    * ship year, in both directions. The disjunctive nation-pair predicate
    * never touches the fact as a filter — it prunes the supplier and
    * customer DIMENSIONS to the two nations before their broadcasts, so
    * the first broadcast join drops the fact to the pair's suppliers
    * before the one l_orderkey shuffle; the asymmetric direction filter
    * (supp ≠ cust) rides the customer broadcast as a residual. Year
    * buckets come from the shipdate already in the row — no extra scan.
    */
  val tpchQ7: Q = (s, d) => {
    import s.implicits._
    val n = tbl(s, d, "nation").where($"n_name".isin("NATION_13", "NATION_19"))
    val sup = tbl(s, d, "supplier")
      .join(broadcast(n.select($"n_nationkey", $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"supp_nation")
    val cus = tbl(s, d, "customer")
      .join(broadcast(n.select($"n_nationkey".as("nk2"), $"n_name".as("cust_nation"))),
        $"c_nationkey" === $"nk2")
      .select($"c_custkey", $"cust_nation")
    val ord = tbl(s, d, "orders").select($"o_orderkey", $"o_custkey")
    tbl(s, d, "lineitem")
      .where($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
             $"l_shipdate" <  lit("1998-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate",
        $"l_extendedprice", $"l_discount")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cus), $"o_custkey" === $"c_custkey")
      .where($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("long").as("l_year"))
      .agg(sum(($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
        .cast("decimal(30,4)")).cast("double").as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }
  val tpchQ7Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |       CAST(sum(volume) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |              AS DECIMAL(30,4)) AS volume
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |  WHERE ((n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
      |      OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00')
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q15-shaped (top supplier): revenue per supplier for one
    * quarter, then the supplier(s) achieving the maximum — the
    * aggregate-of-aggregate view pattern. The per-supplier revenue
    * aggregates once (fact scan + one keyed shuffle); the 1-row max
    * broadcasts back as an EQUI-join on the exact decimal revenue (no
    * double compare — decimal equality is well-defined cross-engine),
    * and the supplier dimension broadcasts onto the one surviving row.
    */
  val tpchQ15: Q = (s, d) => {
    import s.implicits._
    val rev = tbl(s, d, "lineitem")
      .where($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
             $"l_shipdate" <  lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum(($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
        .cast("decimal(30,4)")).as("rev"))
    val mx = rev.agg(max($"rev").as("mr"))
    rev.join(broadcast(mx), $"rev" === $"mr")
      .join(broadcast(tbl(s, d, "supplier").select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"rev".cast("double").as("total_revenue"))
      .orderBy($"s_suppkey")
  }
  val tpchQ15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |             AS DECIMAL(30,4))) AS rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
      |FROM rev JOIN (SELECT max(rev) AS mr FROM rev) ON rev = mr
      |JOIN supplier ON s_suppkey = l_suppkey
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17-shaped (small-quantity-order revenue): lineitems below
    * half their part's average quantity — the correlated-scalar-subquery
    * pattern, decorrelated into one per-part aggregate + a fact re-join.
    * The average is never materialized as a double: qty < avg/2 is
    * cross-multiplied to 2·qty·cnt < sum_qty, all exact decimal/integer
    * arithmetic, so no engine's summation order can flip a boundary row.
    *
    * The fact shuffles ONCE: the per-part aggregate rides a whole-
    * partition window over l_partkey instead of a groupBy feeding a
    * self-join. The join formulation shuffled lineitem TWICE (r15 sf10
    * audit: 7.2×/decade, the battery's steepest TPC-H row) because the
    * two branches could never share their exchange — column pruning
    * gives the aggregate branch a 2-col scan and predicate pushdown
    * gives the probe branch an extra isnotnull(l_quantity) filter, so
    * the subplans canonicalize differently and ReuseExchange can't
    * match them; an explicit shared repartition() was measured to split
    * the same way. The window is one exchange + one in-partition radix
    * sort by construction, and the part-group sizes (~30 rows) keep
    * WindowExec's group buffer trivial.
    */
  val tpchQ17: Q = (s, d) => {
    import s.implicits._
    // r18 batch 2 A/B: the aggregate-then-rejoin form (per-part agg +
    // second column-pruned scan, no fact sort — the shape the SQL mirror
    // uses) measured 0.825 s isolated sf0.1 vs 0.700 s for this window
    // form: one shuffle+sort of three narrow columns beats two scans
    // locally, where the second scan does NOT overlap (both sides feed
    // the same join). At 100 TB the trade can flip (a fact-table sort is
    // real money; the agg is |parts|-bounded and broadcastable), so the
    // rejoin variant stays documented here as the cluster alternative.
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"l_partkey")
    tbl(s, d, "lineitem")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .withColumn("sum_qty", sum($"l_quantity".cast("decimal(18,2)")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .where($"l_quantity".cast("decimal(18,2)") * 2 * $"cnt" < $"sum_qty")
      .agg(round((sum($"l_extendedprice".cast("decimal(18,2)")).cast("double") / 7), 6)
        .as("avg_yearly"))
  }
  val tpchQ17Sql: String =
    """WITH pa AS (
      |  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
      |         count(*) AS cnt
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7, 6)
      |         AS avg_yearly
      |FROM lineitem JOIN pa USING (l_partkey)
      |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 2 * cnt < sum_qty""".stripMargin

  /** TPC-H Q22-shaped (dormant high-balance customers): customers with
    * above-average balance and NO order since 2000, grouped by nation —
    * scalar subquery + anti-join. The global average is likewise
    * cross-multiplied (bal·n > sum) so the cut is exact decimal; the
    * 1-row total broadcasts, and the anti-join runs against the
    * date-pruned DISTINCT custkey set (a sliver of orders), not the
    * order table.
    */
  val tpchQ22: Q = (s, d) => {
    import s.implicits._
    val cust = tbl(s, d, "customer")
    val tot = cust.where($"c_acctbal" > 0).agg(
      sum($"c_acctbal".cast("decimal(18,2)")).as("sb"),
      count(lit(1)).as("n"))
    val active = tbl(s, d, "orders")
      .where($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select($"o_custkey").distinct()
    cust.crossJoin(broadcast(tot))
      .where($"c_acctbal".cast("decimal(18,2)") * $"n" > $"sb")
      .join(active, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        sum($"c_acctbal".cast("decimal(18,2)")).cast("double").as("totacctbal"))
      .orderBy($"c_nationkey")
  }
  val tpchQ22Sql: String =
    """SELECT c_nationkey, count(*) AS numcust,
      |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |CROSS JOIN (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sb, count(*) AS n
      |            FROM customer WHERE c_acctbal > 0)
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > sb
      |  AND c_custkey NOT IN (
      |    SELECT DISTINCT o_custkey FROM orders
      |    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** TPC-H Q4-shaped (order priority checking): an EXISTS semi-join FEEDING
    * an aggregate — j2SemiJoin proves the join type, this proves the shape
    * that matters at scale: the fact side never widens the orders rows (no
    * distinct needed, no row multiplication from multi-line orders), so
    * the priority histogram aggregates exactly |matching orders| rows.
    * Adapted predicate: the dataset's lineitem has no commitdate/
    * receiptdate, so "late line exists" is expressed as l_shipdate >
    * o_orderdate — same EXISTS-with-range-condition plan shape as the
    * original (equi key + non-equi residual on the semi join). At 100 TB
    * the quarter filter prunes orders first, and the semi join shuffles
    * keys+dates only.
    */
  val tpchQ4: Q = (s, d) => {
    import s.implicits._
    val ord = tbl(s, d, "orders")
      .where($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
             $"o_orderdate" <  lit("1996-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = tbl(s, d, "lineitem").select($"l_orderkey", $"l_shipdate")
    ord.join(li, $"l_orderkey" === $"o_orderkey" && $"l_shipdate" > $"o_orderdate",
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }
  val tpchQ4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q8-shaped (national market share): the deepest join tree in
    * TPC-H — seven tables with NATION playing two different roles
    * (customer's nation gates the market region; supplier's nation is
    * the grouping attribute), then a conditional-share aggregate per
    * year. Spark-first plan: the most selective dimension (part,
    * p_type) broadcasts onto the fact FIRST so the ~1/6 surviving
    * lineitem is all that shuffles to meet the date-pruned orders; the
    * customer→nation→region chain pre-prunes to one region and rides a
    * broadcast keyed on custkey; supplier+nation broadcast their name.
    * Share numerator and denominator come from ONE aggregation pass
    * (Q14 discipline: conditional + total decimal sums, divide in
    * double after). At 100 TB the fact shuffles once, on l_orderkey,
    * carrying only (orderkey, volume, suppkey-resolved nation).
    */
  val tpchQ8: Q = (s, d) => {
    import s.implicits._
    val part = tbl(s, d, "part").where($"p_type" === "ECONOMY").select($"p_partkey")
    val ord = tbl(s, d, "orders")
      .where($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
             $"o_orderdate" <  lit("1997-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey", year($"o_orderdate").cast("long").as("o_year"))
    val cus = tbl(s, d, "customer")
      .join(broadcast(tbl(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(tbl(s, d, "region")
        .where($"r_name" === "AMERICA")), $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey")
    val sup = tbl(s, d, "supplier")
      .join(broadcast(tbl(s, d, "nation")), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("nation"))
    tbl(s, d, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        ($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
          .cast("decimal(30,4)").as("volume"))
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cus), $"o_custkey" === $"c_custkey", "left_semi")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .groupBy($"o_year")
      .agg(sum(when($"nation" === "NATION_13", $"volume")
          .otherwise(lit(0).cast("decimal(30,4)"))).as("nat"),
        sum($"volume").as("tot"))
      .select($"o_year",
        round($"nat".cast("double") / $"tot".cast("double"), 6).as("mkt_share"))
      .orderBy($"o_year")
  }
  val tpchQ8Sql: String =
    """WITH an AS (
      |  SELECT year(o_orderdate) AS o_year, n2.n_name AS nation,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |              AS DECIMAL(30,4)) AS volume
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
      |  JOIN orders ON l_orderkey = o_orderkey
      |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey)
      |SELECT o_year,
      |       round(CAST(sum(CASE WHEN nation = 'NATION_13' THEN volume
      |                           ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE) /
      |             CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
      |FROM an GROUP BY o_year ORDER BY o_year""".stripMargin

  /** TPC-H Q13-shaped (customer order distribution): the aggregate-of-an-
    * aggregate histogram over an OUTER join — the one join/agg composition
    * the suite doesn't otherwise exercise (zero-count customers must
    * survive). Spark-first inversion: the textbook form left-joins
    * customer to raw orders then groups twice; here orders pre-aggregates
    * to one (custkey, count) row, so the outer join carries |customers| +
    * |customers-with-orders| rows instead of |orders| — at 100 TB the
    * difference between shuffling the fact and shuffling its per-key
    * summary. coalesce(count, 0) restores the zero bucket the inversion
    * would otherwise lose; results are identical because c_count depends
    * on custkey alone. Adapted predicate: o_orderpriority <> '1-URGENT'
    * stands in for the original's o_comment NOT LIKE (no comment column).
    */
  val tpchQ13: Q = (s, d) => {
    import s.implicits._
    val perCust = tbl(s, d, "orders")
      .where($"o_orderpriority" =!= "1-URGENT")
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_ord"))
    tbl(s, d, "customer").select($"c_custkey")
      .join(perCust, $"c_custkey" === $"o_custkey", "left_outer")
      .select(coalesce($"n_ord", lit(0L)).as("c_count"))
      .groupBy($"c_count").agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }
  val tpchQ13Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q12-shaped (shipping-mode priority audit): per-mode counts of
    * high- vs low-priority lines among late shipments in one year —
    * the two-conditional-counts-over-a-join shape. Adapted columns: the
    * generator ships no l_shipmode/l_commitdate/l_receiptdate, so
    * l_returnflag stands in for the mode dimension and the Q4 lateness
    * proxy (l_shipdate > o_orderdate) for receipt-after-commit.
    * Spark-first: the date range prunes lineitem at the scan (pushed),
    * one shuffle joins the o_orderpriority in, and both CASE-counts fold
    * into a single aggregate pass — never two scans for two counters.
    */
  val tpchQ12: Q = (s, d) => {
    import s.implicits._
    val hi = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    tbl(s, d, "lineitem")
      .where($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
             $"l_shipdate" <  lit("1998-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_returnflag", $"l_shipdate")
      .join(tbl(s, d, "orders").select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .where($"l_shipdate" > $"o_orderdate")
      .groupBy($"l_returnflag")
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy($"l_returnflag")
  }
  val tpchQ12Sql: String =
    """SELECT l_returnflag,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > o_orderdate
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q19-shaped (discounted revenue, disjunctive predicates): the
    * OR-of-ANDs join — three (brand, size-range, quantity-range) branches
    * where part attributes and lineitem attributes are entangled in ONE
    * disjunction. Catalyst extracts the common p_partkey equi-key (hash
    * join, not NLJ) and derives branch-union filters it can push to BOTH
    * scans (l_quantity BETWEEN 1 AND 40, p_size BETWEEN 1 AND 50, brand
    * IN (...)), so at 100 TB the fact scan pre-drops rows no branch can
    * accept before the broadcast probe. Adapted: no p_container /
    * l_shipinstruct columns, so size ranges stand in for containers.
    */
  val tpchQ19: Q = (s, d) => {
    import s.implicits._
    val branches =
      ($"p_brand" === "Brand#3"  && $"p_size".between(1, 15)  && $"l_quantity".between(1, 20))  ||
      ($"p_brand" === "Brand#12" && $"p_size".between(10, 30) && $"l_quantity".between(10, 30)) ||
      ($"p_brand" === "Brand#15" && $"p_size".between(20, 50) && $"l_quantity".between(20, 40))
    tbl(s, d, "lineitem")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
      .join(broadcast(tbl(s, d, "part").select($"p_partkey", $"p_brand", $"p_size")),
        $"l_partkey" === $"p_partkey" && branches)
      .agg(sum(($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
          .cast("decimal(30,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }
  val tpchQ19Sql: String =
    """SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |           AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      | AND ((p_brand = 'Brand#3'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 20)
      |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40))""".stripMargin

  /** TPC-H Q9-shaped (product-type profit by nation and year): the widest
    * LIKE-filtered fact explosion — lineitem joined to part (name LIKE),
    * supplier→nation, and orders (year only). Adapted: the generator has
    * no partsupp, so p_retailprice·quantity stands in for
    * ps_supplycost·quantity as the cost leg; the join DAG is unchanged.
    * Spark-first: part/supplier/nation all broadcast (the LIKE prunes
    * part before the build side ships); orders is the only shuffle
    * partner, keyed on orderkey. Profit stays exact DECIMAL until the
    * final cast — revenue and cost each land in decimal(30,4) BEFORE the
    * subtraction so both engines subtract identical quantized values.
    */
  val tpchQ9: Q = (s, d) => {
    import s.implicits._
    val amount =
      ($"l_extendedprice".cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)"))).cast("decimal(30,4)") -
      ($"p_retailprice".cast("decimal(18,2)") * $"l_quantity".cast("decimal(18,2)")).cast("decimal(30,4)")
    tbl(s, d, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        $"l_quantity", $"l_extendedprice", $"l_discount")
      .join(broadcast(tbl(s, d, "part").where($"p_name".like("%widget%"))
        .select($"p_partkey", $"p_retailprice")), $"l_partkey" === $"p_partkey")
      .join(broadcast(tbl(s, d, "supplier").select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(tbl(s, d, "nation").select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .join(tbl(s, d, "orders").select($"o_orderkey", year($"o_orderdate").cast("long").as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name".as("nation"), $"o_year")
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }
  val tpchQ9Sql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                     (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |                     AS DECIMAL(30,4))
      |                - CAST(CAST(p_retailprice AS DECIMAL(18,2)) *
      |                       CAST(l_quantity AS DECIMAL(18,2))
      |                       AS DECIMAL(30,4))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY n_name, year(o_orderdate) ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q16-shaped (supplier count by part attribute): COUNT DISTINCT
    * over a filtered many-to-many with an excluded-supplier anti-join.
    * Adapted: lineitem's (partkey, suppkey) pairs stand in for partsupp;
    * s_acctbal < 1000 stands in for the complaint-comment LIKE (no
    * s_comment column). Spark-first: the excluded-supplier set is a tiny
    * broadcast LEFT ANTI (never a shuffled NOT IN); part attributes ride
    * a broadcast; the only wide move is the final distinct-count shuffle
    * on the (brand, type, size) grouping — duplicate (part,supp) pairs
    * need no pre-distinct pass because count(DISTINCT) absorbs them.
    */
  val tpchQ16: Q = (s, d) => {
    import s.implicits._
    val sizes = Seq(1, 4, 9, 14, 19, 23, 36, 45)
    val excluded = tbl(s, d, "supplier")
      .where($"s_acctbal" < 1000.0).select($"s_suppkey")
    tbl(s, d, "lineitem").select($"l_partkey", $"l_suppkey")
      .join(broadcast(tbl(s, d, "part")
          .where($"p_brand" =!= "Brand#3" && $"p_type" =!= "PROMO" &&
                 $"p_size".isin(sizes: _*))
          .select($"p_partkey", $"p_brand", $"p_type", $"p_size")),
        $"l_partkey" === $"p_partkey")
      .join(broadcast(excluded), $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }
  val tpchQ16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |       count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q11-shaped (important inventory): per-part value among one
    * region's suppliers, kept only where it exceeds a fixed fraction of
    * the GLOBAL total — the scalar-subquery-in-HAVING shape. Adapted: no
    * partsupp, so lineitem revenue through region-3 suppliers stands in
    * for ps_supplycost·ps_availqty (fraction 0.1%, calibrated non-vacuous
    * at every sf). Spark-first: region suppliers are a broadcast semi
    * filter; per-part value aggregates once on l_partkey; the 1-row total
    * re-aggregates FROM the per-part table (no second fact scan) and
    * broadcasts back. The threshold compare is cross-multiplied
    * (value·1000 > total) in exact decimal — no engine's summation order
    * can flip a boundary part.
    */
  val tpchQ11: Q = (s, d) => {
    import s.implicits._
    val elig = tbl(s, d, "supplier")
      .join(broadcast(tbl(s, d, "nation").where($"n_regionkey" === 3)),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    // Pinned (r18 batch 3): the scaladoc's "no second fact scan" claim
    // was only true of the LOGICAL shape — `value` feeds both the total
    // and the final filter, and unpinned, Catalyst replicated the
    // lineitem scan + semi-join + aggregation into each branch (measured
    // plan: 2 fact scans). The checkpoint is |parts|-bounded.
    val value = tbl(s, d, "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
      .join(broadcast(elig), $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_partkey")
      .agg(sum(($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
          .cast("decimal(30,4)")).as("value"))
      .localCheckpoint(true)
    val total = value.agg(sum($"value").as("total"))
    value.crossJoin(broadcast(total))
      .where($"value" * 1000 > $"total")
      .select($"l_partkey".as("ps_partkey"), $"value".cast("double").as("value"))
      .orderBy($"value".desc, $"ps_partkey")
  }
  val tpchQ11Sql: String =
    """WITH v AS (
      |  SELECT l_partkey AS ps_partkey,
      |         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |             AS DECIMAL(30,4))) AS value
      |  FROM lineitem
      |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
      |                      JOIN nation ON s_nationkey = n_nationkey
      |                      WHERE n_regionkey = 3)
      |  GROUP BY 1)
      |SELECT ps_partkey, CAST(value AS DOUBLE) AS value
      |FROM v WHERE value * 1000 > (SELECT sum(value) FROM v)
      |ORDER BY value DESC, ps_partkey""".stripMargin

  /** TPC-H Q20-shaped (concentrated suppliers): suppliers of red parts
    * whose one-year shipped quantity exceeds HALF their all-time shipped
    * quantity of that part — the correlated-aggregate-threshold →
    * semi-join chain. Adapted: no partsupp/availqty, so the all-time
    * per-(supp,part) quantity is the correlation target; nation filter →
    * region 3 via the same broadcast chain. Spark-first: both the
    * numerator and denominator come from ONE conditional aggregation pass
    * over the part-pruned fact (never two scans); the compare is
    * cross-multiplied exact decimal; the surviving supplier set joins
    * supplier as a broadcast semi.
    */
  val tpchQ20: Q = (s, d) => {
    import s.implicits._
    val in97 = $"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
               $"l_shipdate" <  lit("1998-01-01").cast("timestamp")
    val conc = tbl(s, d, "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_quantity", $"l_shipdate")
      .join(broadcast(tbl(s, d, "part").where($"p_name".like("red%"))
        .select($"p_partkey")), $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(sum(when(in97, $"l_quantity".cast("decimal(18,2)"))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("q97"),
        sum($"l_quantity".cast("decimal(18,2)")).as("qall"))
      .where($"q97" * 2 > $"qall")
      .select($"l_suppkey").distinct()
    tbl(s, d, "supplier")
      .join(broadcast(tbl(s, d, "nation").where($"n_regionkey" === 3)),
        $"s_nationkey" === $"n_nationkey")
      .join(broadcast(conc), $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }
  val tpchQ20Sql: String =
    """SELECT s_suppkey, s_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_regionkey = 3 AND s_suppkey IN (
      |  SELECT l_suppkey FROM (
      |    SELECT l_suppkey, l_partkey,
      |           sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |                     AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |                    THEN CAST(l_quantity AS DECIMAL(18,2))
      |                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS q97,
      |           sum(CAST(l_quantity AS DECIMAL(18,2))) AS qall
      |    FROM lineitem JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
      |    GROUP BY 1, 2)
      |  WHERE q97 * 2 > qall)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q21-shaped (suppliers who kept orders waiting): for finished
    * orders, suppliers whose line shipped late while EVERY other supplier
    * on the order shipped on time, and the order had at least two
    * suppliers — the EXISTS + NOT-EXISTS double self-join. Adapted
    * lateness: l_shipdate > o_orderdate + 60 days (no commit/receipt
    * dates); numwait counts DISTINCT orders (the generator fans multiple
    * lines per (order, supplier)). Spark-first decorrelation, r18 window
    * shape: the r17 form kept ONE logical fact pass but Catalyst planned
    * its two references (the per-order countDistinct aggregate and the
    * late-pair distinct) as TWO physical lineitem scans + orders joins,
    * an Expand×2 for the multi-distinct, and an SMJ to marry the
    * branches (plans/r18/tpch_q21_before.txt: 2 scans, 5 Exchanges,
    * Expand). Collapsing to (order, supplier) grain first — max(late)
    * per pair — then a per-order window (count = distinct suppliers,
    * sum(late) = distinct late suppliers; both exact because rows are
    * unique by (ok, sk)) reads the fact ONCE, plans no Expand and no
    * self-join, and each waiting pair is already distinct so numwait is
    * a plain count (guide §2.4/§3: remove the second fact scan + the
    * branch-marrying shuffle outright). Oracle unchanged — hash-proven.
    */
  val tpchQ21: Q = (s, d) => {
    import s.implicits._
    val pair = tbl(s, d, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(tbl(s, d, "orders").where($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_orderdate"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAY")).as("late"))
    val w = Window.partitionBy($"l_orderkey")
    pair
      .withColumn("nsupp", count(lit(1)).over(w))
      .withColumn("nlate", sum(when($"late", 1L).otherwise(0L)).over(w))
      .where($"late" && $"nsupp" >= 2 && $"nlate" === 1)
      .join(broadcast(tbl(s, d, "supplier").select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
  }
  val tpchQ21Sql: String =
    """SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
      |FROM lineitem l1
      |JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  /** TPC-H Q2-shaped (minimum-cost supplier): for each mid-size LARGE
    * part, the region-3 supplier(s) offering the minimum price — the
    * correlated-scalar-MIN-subquery-joined-back shape. Adapted: no
    * partsupp, so the per-(part, supplier) minimum lineitem price stands
    * in for ps_supplycost. Spark-first: the part filter and eligible-
    * supplier semi both prune the fact BEFORE the offer aggregate; the
    * per-part minimum re-aggregates from the offer table and joins back
    * on exact DECIMAL equality (the Q15 discipline — never a double
    * compare); supplier attributes arrive by broadcast at the very end,
    * on the handful of winning rows.
    */
  val tpchQ2: Q = (s, d) => {
    import s.implicits._
    val elig = tbl(s, d, "supplier")
      .join(broadcast(tbl(s, d, "nation").select($"n_nationkey", $"n_name", $"n_regionkey")
        .where($"n_regionkey" === 3)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val offers = tbl(s, d, "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_extendedprice")
      .join(broadcast(tbl(s, d, "part")
          .where($"p_size".between(10, 20) && $"p_type" === "LARGE")
          .select($"p_partkey")), $"l_partkey" === $"p_partkey")
      .join(broadcast(elig.select($"s_suppkey")), $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min($"l_extendedprice".cast("decimal(18,2)")).as("moff"))
      // pinned (r18 batch 3): offers feeds the per-part min AND the
      // equality rejoin — unpinned, the fact scan + filtered-part join +
      // aggregation replicated into both branches; the table is bounded
      // by (filtered parts × their suppliers)
      .localCheckpoint(true)
    val mins = offers.groupBy($"l_partkey".as("pk")).agg(min($"moff").as("mn"))
    offers.join(mins, $"l_partkey" === $"pk" && $"moff" === $"mn")
      .join(broadcast(elig), $"l_suppkey" === $"s_suppkey")
      .select($"s_acctbal", $"s_name", $"n_name", $"l_partkey".as("p_partkey"),
        $"moff".cast("double").as("min_offer"))
      .orderBy($"p_partkey", $"s_name")
  }
  val tpchQ2Sql: String =
    """WITH elig AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_regionkey = 3),
      |off AS (
      |  SELECT l_partkey, l_suppkey,
      |         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS moff
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |   AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
      |  WHERE l_suppkey IN (SELECT s_suppkey FROM elig)
      |  GROUP BY 1, 2),
      |mn AS (SELECT l_partkey AS pk, min(moff) AS mnv FROM off GROUP BY 1)
      |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey,
      |       CAST(moff AS DOUBLE) AS min_offer
      |FROM off JOIN mn ON l_partkey = pk AND moff = mnv
      |JOIN elig ON l_suppkey = s_suppkey
      |ORDER BY p_partkey, s_name""".stripMargin

  /** A10 — GROUPING SETS beyond rollup's prefix lattice: (status, priority),
    * (priority) alone, and grand total — an aggregation shape rollup/cube
    * can't express. Single pass (Spark expands the sets in one Expand node,
    * not one scan per set). grouping_id disambiguates a real NULL key from
    * a subtotal row, so the coalesce to 'ALL' is unambiguous.
    */
  val a10GroupingSets: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "orders")
      .groupingSets(
        Seq(Seq($"o_orderstatus", $"o_orderpriority"), Seq($"o_orderpriority"), Seq()),
        $"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total"),
        grouping_id().as("gid"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"gid", $"n", $"total")
      .orderBy($"gid", $"status", $"priority")
  }
  val a10GroupingSetsSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       GROUPING(o_orderstatus, o_orderpriority) AS gid,
      |       count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
      |ORDER BY gid, status, priority""".stripMargin

  /** Semi-join (E4/E5 existence check, mongodb.ts:200-222): orders whose
    * customer is in a segment — EXISTS, not a widening join.
    */
  val j2SemiJoin: Q = (s, d) => {
    import s.implicits._
    val o = tbl(s, d, "orders")
    val c = tbl(s, d, "customer").where($"c_mktsegment" === "MACHINERY")
      .select($"c_custkey")
    o.join(c, $"o_custkey" === $"c_custkey", "left_semi")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
      .orderBy($"o_orderkey")
  }
  val j2SemiJoinSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |WHERE EXISTS (SELECT 1 FROM customer
      |              WHERE c_custkey = o_custkey AND c_mktsegment = 'MACHINERY')
      |ORDER BY o_orderkey""".stripMargin

  /** A13 — unpivot (wide→long): the inverse of a9_pivot, melting the four
    * lineitem measures into (key, measure, value) rows via `stack` — the
    * narrow shape feature stores and plotting layers want. Pure
    * projection + explode: no shuffle except the presentation sort, and
    * column pruning still reaches the scan (only the four measures +
    * keys are read).
    */
  val a13Unpivot: Q = (s, d) => {
    import s.implicits._
    tbl(s, d, "lineitem").where($"l_orderkey" < 1000)
      .select($"l_orderkey", $"l_linenumber",
        expr("""stack(4, 'discount', l_discount, 'extendedprice', l_extendedprice,
               |         'quantity', l_quantity, 'tax', l_tax) AS (measure, value)""".stripMargin))
      .orderBy($"l_orderkey", $"l_linenumber", $"measure")
  }
  val a13UnpivotSql: String =
    """SELECT l_orderkey, l_linenumber, measure, value
      |FROM (
      |  SELECT l_orderkey, l_linenumber, 'discount' AS measure, l_discount AS value
      |  FROM lineitem WHERE l_orderkey < 1000
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
      |  FROM lineitem WHERE l_orderkey < 1000
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'quantity', l_quantity
      |  FROM lineitem WHERE l_orderkey < 1000
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'tax', l_tax
      |  FROM lineitem WHERE l_orderkey < 1000)
      |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin

  /** A14 — exact order statistics per group: interpolated quartiles
    * (Spark `percentile` and DuckDB `quantile_cont` both use the type-7
    * index p·(n−1), so the interpolation arithmetic is identical) plus a
    * DETERMINISTIC mode — smallest value among the most frequent,
    * computed with an explicit count+rank rather than either engine's
    * tie-arbitrary mode(). Medians of integral quantities interpolate to
    * exact halves — no float hazard.
    */
  val a14Median: Q = (s, d) => {
    import s.implicits._
    val li = tbl(s, d, "lineitem")
    val quart = li.groupBy($"l_returnflag".as("flag")).agg(
      count(lit(1)).as("n"),
      expr("percentile(l_quantity, 0.25)").as("q1"),
      expr("percentile(l_quantity, 0.5)").as("median"),
      expr("percentile(l_quantity, 0.75)").as("q3"))
    val mode = li.groupBy($"l_returnflag".as("flag"), $"l_quantity").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"flag").orderBy($"c".desc, $"l_quantity")))
      .where($"rk" === 1)
      .select($"flag", $"l_quantity".as("mode_qty"))
    quart.join(mode, Seq("flag")).orderBy($"flag")
  }
  val a14MedianSql: String =
    """WITH quart AS (
      |  SELECT l_returnflag AS flag, count(*) AS n,
      |         quantile_cont(l_quantity, 0.25) AS q1,
      |         quantile_cont(l_quantity, 0.5)  AS median,
      |         quantile_cont(l_quantity, 0.75) AS q3
      |  FROM lineitem GROUP BY 1),
      |md AS (
      |  SELECT flag, l_quantity AS mode_qty FROM (
      |    SELECT l_returnflag AS flag, l_quantity, count(*) AS c,
      |           row_number() OVER (PARTITION BY l_returnflag
      |                              ORDER BY count(*) DESC, l_quantity) AS rk
      |    FROM lineitem GROUP BY 1, 2)
      |  WHERE rk = 1)
      |SELECT q.flag, q.n, q.q1, q.median, q.q3, md.mode_qty
      |FROM quart q JOIN md USING (flag) ORDER BY q.flag""".stripMargin

  /** W7 — percent_rank + cume_dist over per-user totals: the relative-
    * standing twins of w4's ntile (exact integer-ratio outputs, so the
    * only floats are two final divisions, quantized). Same post-aggregate
    * O(|users|) global window as w4 — sketch-based bounds are the scale
    * path when |users| alone exceeds a sort budget.
    */
  val w7PercentRank: Q = (s, d) => {
    import s.implicits._
    val w = Window.orderBy($"total", $"user_id")
    tbl(s, d, "events")
      .groupBy($"user_id").agg(sum(floor($"value").cast("long")).as("total"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .orderBy($"user_id")
  }
  val w7PercentRankSql: String =
    """WITH tot AS (SELECT user_id, CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS total
      |             FROM events GROUP BY user_id)
      |SELECT user_id, total,
      |       round(percent_rank() OVER (ORDER BY total, user_id), 6) AS pct_rank,
      |       round(cume_dist()    OVER (ORDER BY total, user_id), 6) AS cume
      |FROM tot ORDER BY user_id""".stripMargin

  // ----------------------------------------------------------------- export

  val queries: Map[String, Q] = Map(
    "s1_scan_filter"   -> s1ScanFilter,
    "s3_dim_join"      -> s3DimJoin,
    "s6_upsert_merge"  -> s6UpsertMerge,
    "t5_key_derive"    -> t5KeyDerive,
    "t7_format"        -> t7Format,
    "a1_count_by_type" -> a1CountByType,
    "a2_pct_of_total"  -> a2PctOfTotal,
    "a3_latest"        -> a3Latest,
    "a4_filtered_count" -> a4FilteredCount,
    "a5_chunk_counts"  -> a5ChunkCounts,
    "a6_lag"           -> a6Lag,
    "a7_rollup"        -> a7Rollup,
    "a8_monthly"       -> a8Monthly,
    "a11_growth"       -> a11Growth,
    "a12_rfm"          -> a12Rfm,
    "t8_json"          -> t8Json,
    "q1_page"          -> q1Page,
    "q1_keyset"        -> q1Keyset,
    "q2_multi_or"      -> q2MultiOr,
    "q3_point_lookup"  -> q3PointLookup,
    "q4_anti_join"     -> q4AntiJoin,
    "q5_topk"          -> q5TopK,
    "e1_first_per_key" -> e1FirstPerKey,
    "e2_collect_set"   -> e2CollectSet,
    "e4_last_writer"   -> e4LastWriter,
    "e8_last_update"   -> e8LastUpdate,
    "w2_running_sum"   -> w2RunningSum,
    "a9_pivot"         -> a9Pivot,
    "a13_unpivot"      -> a13Unpivot,
    "a14_median"       -> a14Median,
    "w7_percent_rank"  -> w7PercentRank,
    "w4_ntile"         -> w4Ntile,
    "u1_union"         -> u1Union,
    "u2_intersect"     -> u2Intersect,
    "u3_except"        -> u3Except,
    "u4_intersect_all" -> u4IntersectAll,
    "u5_except_all"    -> u5ExceptAll,
    "w5_range_frame"   -> w5RangeFrame,
    "d1_distinct"      -> d1Distinct,
    "tpch_q1"          -> tpchQ1,
    "tpch_q3"          -> tpchQ3,
    "tpch_q5"          -> tpchQ5,
    "tpch_q18"         -> tpchQ18,
    "tpch_q6"          -> tpchQ6,
    "tpch_q10"         -> tpchQ10,
    "tpch_q14"         -> tpchQ14,
    "tpch_q7"          -> tpchQ7,
    "tpch_q15"         -> tpchQ15,
    "tpch_q17"         -> tpchQ17,
    "tpch_q22"         -> tpchQ22,
    "tpch_q4"          -> tpchQ4,
    "tpch_q2"          -> tpchQ2,
    "tpch_q8"          -> tpchQ8,
    "tpch_q9"          -> tpchQ9,
    "tpch_q11"         -> tpchQ11,
    "tpch_q12"         -> tpchQ12,
    "tpch_q13"         -> tpchQ13,
    "tpch_q16"         -> tpchQ16,
    "tpch_q19"         -> tpchQ19,
    "tpch_q20"         -> tpchQ20,
    "tpch_q21"         -> tpchQ21,
    "a10_grouping_sets" -> a10GroupingSets,
    "j1_star_join"     -> j1StarJoin,
    "j2_semi_join"     -> j2SemiJoin,
  )

  val oracles: Map[String, String] = Map(
    "s1_scan_filter"   -> s1ScanFilterSql,
    "s3_dim_join"      -> s3DimJoinSql,
    "s6_upsert_merge"  -> s6UpsertMergeSql,
    "t5_key_derive"    -> t5KeyDeriveSql,
    "t7_format"        -> t7FormatSql,
    "a1_count_by_type" -> a1CountByTypeSql,
    "a2_pct_of_total"  -> a2PctOfTotalSql,
    "a3_latest"        -> a3LatestSql,
    "a4_filtered_count" -> a4FilteredCountSql,
    "a5_chunk_counts"  -> a5ChunkCountsSql,
    "a6_lag"           -> a6LagSql,
    "a7_rollup"        -> a7RollupSql,
    "a8_monthly"       -> a8MonthlySql,
    "a11_growth"       -> a11GrowthSql,
    "a12_rfm"          -> a12RfmSql,
    "t8_json"          -> t8JsonSql,
    "q1_page"          -> q1PageSql,
    "q1_keyset"        -> q1KeysetSql,
    "q2_multi_or"      -> q2MultiOrSql,
    "q3_point_lookup"  -> q3PointLookupSql,
    "q4_anti_join"     -> q4AntiJoinSql,
    "q5_topk"          -> q5TopKSql,
    "e1_first_per_key" -> e1FirstPerKeySql,
    "e2_collect_set"   -> e2CollectSetSql,
    "e4_last_writer"   -> e4LastWriterSql,
    "e8_last_update"   -> e8LastUpdateSql,
    "w2_running_sum"   -> w2RunningSumSql,
    "a9_pivot"         -> a9PivotSql,
    "a13_unpivot"      -> a13UnpivotSql,
    "a14_median"       -> a14MedianSql,
    "w7_percent_rank"  -> w7PercentRankSql,
    "w4_ntile"         -> w4NtileSql,
    "u1_union"         -> u1UnionSql,
    "u2_intersect"     -> u2IntersectSql,
    "u3_except"        -> u3ExceptSql,
    "u4_intersect_all" -> u4IntersectAllSql,
    "u5_except_all"    -> u5ExceptAllSql,
    "w5_range_frame"   -> w5RangeFrameSql,
    "d1_distinct"      -> d1DistinctSql,
    "tpch_q1"          -> tpchQ1Sql,
    "tpch_q3"          -> tpchQ3Sql,
    "tpch_q5"          -> tpchQ5Sql,
    "tpch_q18"         -> tpchQ18Sql,
    "tpch_q6"          -> tpchQ6Sql,
    "tpch_q10"         -> tpchQ10Sql,
    "tpch_q14"         -> tpchQ14Sql,
    "tpch_q7"          -> tpchQ7Sql,
    "tpch_q15"         -> tpchQ15Sql,
    "tpch_q17"         -> tpchQ17Sql,
    "tpch_q22"         -> tpchQ22Sql,
    "tpch_q4"          -> tpchQ4Sql,
    "tpch_q2"          -> tpchQ2Sql,
    "tpch_q8"          -> tpchQ8Sql,
    "tpch_q9"          -> tpchQ9Sql,
    "tpch_q11"         -> tpchQ11Sql,
    "tpch_q12"         -> tpchQ12Sql,
    "tpch_q13"         -> tpchQ13Sql,
    "tpch_q16"         -> tpchQ16Sql,
    "tpch_q19"         -> tpchQ19Sql,
    "tpch_q20"         -> tpchQ20Sql,
    "tpch_q21"         -> tpchQ21Sql,
    "a10_grouping_sets" -> a10GroupingSetsSql,
    "j1_star_join"     -> j1StarJoinSql,
    "j2_semi_join"     -> j2SemiJoinSql,
  )
}
