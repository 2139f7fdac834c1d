package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t => tbl}

/** Z-order (Morton-curve) layout: multi-dimensional data clustering so
  * parquet min/max file stats prune on EVERY query dimension, not just the
  * sort-leading one.
  *
  * Why this matters at 100 TB: a table sorted by `user_id` answers user
  * predicates with tight file skipping but scans everything for a time
  * predicate; sorting by the interleaved bits of (user bucket, time bucket)
  * keeps each file's min/max box tight in BOTH dimensions, so a
  * two-dimensional box query touches O(perimeter) files instead of
  * O(table). This is the layout trick Delta/Iceberg expose as `OPTIMIZE
  * ZORDER BY`; here it is plain Spark — an arithmetic sort key, a range
  * repartition, and parquet's native stats (ZOrderSpec measures the actual
  * file-count reduction; `ly_zorder` hash-verifies the curve itself).
  *
  * The z-value is pure integer arithmetic (shiftright/and/shiftleft), so it
  * stays inside whole-stage codegen and costs nothing on the write path
  * relative to the shuffle it feeds.
  */
object ZOrder {

  type Q = (SparkSession, String) => DataFrame

  /** Bits kept per dimension (16-bit z-value for 2 dims: plenty to spread
    * any realistic target file count; resolution beyond file count is
    * wasted).
    */
  val Bits = 8

  /** Interleave the low [[Bits]] bits of n non-negative longs: bit i of
    * dimension k lands at position i·n + k. Callers normalize dimensions
    * into [0, 2^Bits) first (bucketing preserves locality).
    */
  def zvalueN(dims: Seq[Column]): Column = {
    require(dims.nonEmpty && dims.size * Bits <= 62,
      s"zvalueN: ${dims.size} dims × $Bits bits must fit a long")
    val n = dims.size
    (0 until Bits).flatMap { i =>
      dims.zipWithIndex.map { case (c, k) =>
        shiftleft(shiftright(c, i).bitwiseAND(1), i * n + k)
      }
    }.reduce(_ + _)
  }

  /** 2-dim special case (x in even bits, y in odd). */
  def zvalue(x: Column, y: Column): Column = zvalueN(Seq(x, y))

  /** Add a Hilbert-curve index column for (x, y) in [0, 2^bits)² — the
    * other classic space-filling layout key. Hilbert never takes the
    * Morton curve's quadrant-boundary jumps (consecutive indices are
    * always grid neighbors), which tightens per-file envelopes on box
    * workloads at the cost of heavier key arithmetic. The canonical
    * top-down bit algorithm (extract quadrant, accumulate
    * s²·quadrant-rank, rotate the frame) unrolled over the bit levels.
    *
    * Shaped as a DataFrame transformer, not a Column: each level's
    * (x, y, d) state must land in NAMED columns, because a single nested
    * Column expression references the previous level's x and y several
    * times and the tree (and its codegen) grows exponentially in `bits` —
    * measured as a multi-minute analysis hang at 8 bits. Named attributes
    * keep it linear, CollapseProject leaves multiply-referenced non-cheap
    * aliases alone, and every level stays inside whole-stage codegen.
    */
  def withHilbert(df: DataFrame, x: Column, y: Column, out: String,
                  bits: Int = Bits): DataFrame = {
    val n = 1L << bits
    var cur = df
      .withColumn("__hx", x.cast("long"))
      .withColumn("__hy", y.cast("long"))
      .withColumn(out, lit(0L))
    var s = n >> 1
    while (s > 0) {
      cur = cur
        .withColumn("__rx", when(col("__hx").bitwiseAND(s) > 0, 1L).otherwise(0L))
        .withColumn("__ry", when(col("__hy").bitwiseAND(s) > 0, 1L).otherwise(0L))
        .withColumn(out,
          col(out) + lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        .withColumn("__ht", col("__hx"))
        .withColumn("__hx",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(n - 1) - col("__hy")).otherwise(col("__hy")))
            .otherwise(col("__hx")))
        .withColumn("__hy",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(n - 1) - col("__ht")).otherwise(col("__ht")))
            .otherwise(col("__hy")))
      s >>= 1
    }
    cur.drop("__hx", "__hy", "__rx", "__ry", "__ht")
  }

  /** Write `df` clustered by an arbitrary curve key: range partition on
    * the key (balanced files even under skew — range boundaries come from
    * a sample), sort within partitions so row-group stats are tight, drop
    * the helper column on disk.
    */
  def writeClustered(df: DataFrame, key: Column, path: String, files: Int): Unit =
    df.withColumn("__k", key)
      .repartitionByRange(files, col("__k"))
      .sortWithinPartitions(col("__k"))
      .drop("__k")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** n-dimensional Hilbert index via Skilling's transpose algorithm
    * (Skilling 2004, "Programming the Hilbert curve" — the standard
    * public formulation): per bit level, each axis conditionally inverts
    * or exchanges low bits against axis 0 ("inverse undo"), then a Gray
    * encode and a parity correction, and the transposed coordinates
    * interleave into the index (axis 0 most significant per level). Same
    * named-column-per-step discipline as [[withHilbert]] — every step is
    * a handful of integer/CASE projections inside whole-stage codegen.
    * The 2-dim special case traces a valid Hilbert curve but in a
    * different orientation than [[withHilbert]]'s canonical rotate form;
    * both satisfy the bijectivity + unit-step property ZOrderSpec
    * asserts.
    */
  def withHilbertN(df: DataFrame, dims: Seq[Column], out: String,
                   bits: Int = Bits): DataFrame = {
    val n = dims.size
    require(n >= 2 && n * bits <= 62, s"withHilbertN: $n dims × $bits bits must fit a long")
    var cur = df
    for (i <- 0 until n) cur = cur.withColumn(s"__x$i", dims(i).cast("long"))
    // inverse undo: from the top bit down, invert or exchange against axis 0
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      for (i <- 0 until n) {
        cur = cur
          .withColumn("__b", col(s"__x$i").bitwiseAND(q) > 0)
          .withColumn("__t", col("__x0").bitwiseXOR(col(s"__x$i")).bitwiseAND(p))
          .withColumn("__n0",
            when(col("__b"), col("__x0").bitwiseXOR(p))
              .otherwise(col("__x0").bitwiseXOR(col("__t"))))
          .withColumn("__ni",
            when(col("__b"), col(s"__x$i"))
              .otherwise(col(s"__x$i").bitwiseXOR(col("__t"))))
        cur = cur.withColumn("__x0", col("__n0"))
        if (i != 0) cur = cur.withColumn(s"__x$i", col("__ni"))
      }
      q >>= 1
    }
    // Gray encode (sequential: each axis folds in its predecessor's NEW value)
    for (i <- 1 until n) cur = cur
      .withColumn(s"__x$i", col(s"__x$i").bitwiseXOR(col(s"__x${i - 1}")))
    // parity correction from the last axis's bits
    var tExpr: Column = lit(0L)
    q = 1L << (bits - 1)
    while (q > 1) {
      tExpr = tExpr.bitwiseXOR(
        when(col(s"__x${n - 1}").bitwiseAND(q) > 0, q - 1).otherwise(0L))
      q >>= 1
    }
    cur = cur.withColumn("__gt", tExpr)
    for (i <- 0 until n) cur = cur
      .withColumn(s"__x$i", col(s"__x$i").bitwiseXOR(col("__gt")))
    // interleave the transposed coords: bit q of axis i → position q·n + (n−1−i)
    val d = (0 until bits).flatMap { qq =>
      (0 until n).map { i =>
        shiftleft(shiftright(col(s"__x$i"), qq).bitwiseAND(1), qq * n + (n - 1 - i))
      }
    }.reduce(_ + _)
    cur.withColumn(out, d)
      .drop(((0 until n).map(i => s"__x$i") ++ Seq("__b", "__t", "__n0", "__ni", "__gt")): _*)
  }

  /** Morton layout on two pre-bucketed dimension columns. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, files: Int): Unit =
    writeClustered(df, zvalue(col(xCol), col(yCol)), path, files)

  /** Hilbert layout on two pre-bucketed dimension columns. */
  def writeHilbertOrdered(df: DataFrame, xCol: String, yCol: String,
                          path: String, files: Int): Unit =
    withHilbert(df, col(xCol), col(yCol), "__k")
      .repartitionByRange(files, col("__k"))
      .sortWithinPartitions(col("__k"))
      .drop("__k")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Gate: the z-curve over (user bucket, event bucket) on the events
    * table — verifies the interleave arithmetic bit-for-bit against a
    * DuckDB mirror. (The layout effect itself is measured by ZOrderSpec;
    * file placement isn't SQL-observable.)
    */
  val zorderCurve: Q = (s, d) => {
    val x = col("user_id").bitwiseAND((1 << Bits) - 1)
    val y = col("event_id").bitwiseAND((1 << Bits) - 1)
    tbl(s, d, "events")
      .select(col("event_id"), zvalue(x, y).cast("long").as("zvalue"))
      .orderBy(col("event_id"))
  }

  val zorderCurveSql: String = {
    val mask = (1 << Bits) - 1
    val terms = (0 until Bits).map { i =>
      s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"""SELECT event_id, CAST($terms AS BIGINT) AS zvalue
       |FROM (SELECT event_id, user_id & $mask AS x, event_id & $mask AS y
       |      FROM events)
       |ORDER BY event_id""".stripMargin
  }

  /** Gate: the 3-dim Morton curve over (user, event, value) buckets —
    * verifies the n-dim interleave bit-for-bit.
    */
  val zorder3Curve: Q = (s, d) => {
    val mask = (1 << Bits) - 1
    tbl(s, d, "events")
      .select(col("event_id"),
        zvalueN(Seq(
          col("user_id").bitwiseAND(mask),
          col("event_id").bitwiseAND(mask),
          // explicit floor: a bare double→long CAST truncates in Spark but
          // ROUNDS in DuckDB — floor is the one spelling both agree on
          floor(col("value")).cast("long").bitwiseAND(mask))).cast("long").as("zvalue3"))
      .orderBy(col("event_id"))
  }

  val zorder3CurveSql: String = {
    val mask = (1 << Bits) - 1
    val terms = (0 until Bits).flatMap { i =>
      Seq(s"(((x >> $i) & 1) << ${i * 3})",
        s"(((y >> $i) & 1) << ${i * 3 + 1})",
        s"(((z >> $i) & 1) << ${i * 3 + 2})")
    }.mkString(" + ")
    s"""SELECT event_id, CAST($terms AS BIGINT) AS zvalue3
       |FROM (SELECT event_id, user_id & $mask AS x, event_id & $mask AS y,
       |             CAST(floor(value) AS BIGINT) & $mask AS z
       |      FROM events)
       |ORDER BY event_id""".stripMargin
  }

  /** Gate: the Hilbert index over the same (user, event) buckets as
    * ly_zorder — the unrolled rotate-and-accumulate levels mirrored in
    * SQL so the curve arithmetic is hash-checked cross-engine.
    */
  val hilbertCurve: Q = (s, d) => {
    val mask = (1 << Bits) - 1
    withHilbert(tbl(s, d, "events"),
      col("user_id").bitwiseAND(mask), col("event_id").bitwiseAND(mask), "hvalue")
      .select(col("event_id"), col("hvalue").cast("long").as("hvalue"))
      .orderBy(col("event_id"))
  }

  val hilbertCurveSql: String = {
    val mask = (1 << Bits) - 1
    val n = 1L << Bits
    var inner =
      s"""SELECT event_id, CAST(0 AS BIGINT) AS d,
         |       CAST(user_id & $mask AS BIGINT) AS x,
         |       CAST(event_id & $mask AS BIGINT) AS y
         |FROM events""".stripMargin
    var s0 = n >> 1
    while (s0 > 0) {
      inner =
        s"""SELECT event_id,
           |  d + ${s0 * s0} * (CASE WHEN rx = 0 AND ry = 0 THEN 0
           |                         WHEN rx = 0 AND ry = 1 THEN 1
           |                         WHEN rx = 1 AND ry = 1 THEN 2
           |                         ELSE 3 END) AS d,
           |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1} - y ELSE y END)
           |       ELSE x END AS x,
           |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1} - x ELSE x END)
           |       ELSE y END AS y
           |FROM (SELECT event_id, d, x, y,
           |             CASE WHEN (x & $s0) > 0 THEN 1 ELSE 0 END AS rx,
           |             CASE WHEN (y & $s0) > 0 THEN 1 ELSE 0 END AS ry
           |      FROM ($inner))""".stripMargin
      s0 >>= 1
    }
    s"SELECT event_id, d AS hvalue FROM ($inner) ORDER BY event_id"
  }

  /** Gate: the 3-dim Skilling Hilbert index over (user, event, value)
    * buckets — every transpose step mirrored in SQL.
    */
  val hilbert3Curve: Q = (s, d) => {
    val mask = (1 << Bits) - 1
    withHilbertN(tbl(s, d, "events"),
      Seq(col("user_id").bitwiseAND(mask),
        col("event_id").bitwiseAND(mask),
        floor(col("value")).cast("long").bitwiseAND(mask)), "hvalue3")
      .select(col("event_id"), col("hvalue3").cast("long").as("hvalue3"))
      .orderBy(col("event_id"))
  }

  /** SQL mirror of [[withHilbertN]] for n=3: one chained subquery per
    * transpose step (linear chain, each level referenced once — no
    * MATERIALIZED needed), xor via DuckDB's xor(). Generated from the
    * same (Bits, n) so the engines can't drift.
    */
  val hilbert3CurveSql: String = {
    val n = 3
    val mask = (1 << Bits) - 1
    val axes = (0 until n).map(i => s"x$i")
    var inner =
      s"""SELECT event_id,
         |       CAST(user_id & $mask AS BIGINT) AS x0,
         |       CAST(event_id & $mask AS BIGINT) AS x1,
         |       CAST(floor(value) AS BIGINT) & $mask AS x2
         |FROM events""".stripMargin
    def level(selects: Seq[String]): Unit =
      inner = s"SELECT event_id, ${selects.mkString(", ")}\nFROM ($inner)"
    var q = 1L << (Bits - 1)
    while (q > 1) {
      val p = q - 1
      for (i <- 0 until n) {
        val cond = s"(x$i & $q) > 0"
        val t = s"(xor(x0, x$i) & $p)"
        level(axes.map {
          case "x0" => s"CASE WHEN $cond THEN xor(x0, $p) ELSE xor(x0, $t) END AS x0"
          case a if a == s"x$i" =>
            s"CASE WHEN $cond THEN x$i ELSE xor(x$i, $t) END AS x$i"
          case a => a
        })
      }
      q >>= 1
    }
    for (i <- 1 until n) // sequential Gray fold, one level per axis
      level(axes.map { case a if a == s"x$i" => s"xor(x$i, x${i - 1}) AS x$i"; case a => a })
    val gtTerms = {
      var terms = Seq.empty[String]
      var qq = 1L << (Bits - 1)
      while (qq > 1) {
        terms :+= s"CASE WHEN (x${n - 1} & $qq) > 0 THEN ${qq - 1} ELSE 0 END"
        qq >>= 1
      }
      terms.reduce((a, b) => s"xor($a, $b)")
    }
    level(axes :+ s"$gtTerms AS gt")
    level(axes.map(a => s"xor($a, gt) AS $a"))
    val interleave = (0 until Bits).flatMap { qq =>
      (0 until n).map(i => s"(((x$i >> $qq) & 1) << ${qq * n + (n - 1 - i)})")
    }.mkString(" + ")
    s"""SELECT event_id, CAST($interleave AS BIGINT) AS hvalue3
       |FROM ($inner)
       |ORDER BY event_id""".stripMargin
  }

  // ------------------------------------------------------ compaction plan

  /** ly_compaction — small-file compaction planning: group each
    * partition's files into target-sized merge bins. The maintenance job
    * every long-lived table layout needs (streaming ingest and per-batch
    * upserts strew small files; scan cost degrades with file COUNT, not
    * just bytes) — and the planning is itself a distributed query over
    * the file listing, never a driver loop.
    *
    * Bin rule: within a partition, order files by size descending (the
    * first-fit-decreasing heuristic's ordering, deterministic via the
    * file-id tiebreak), take a running byte total, and cut a new bin
    * every `target` bytes — one partitioned window + one keyed
    * aggregation. Each bin then compacts to ≤ ~2 files over target in
    * the worst case and ~target on average; bins are independent, so the
    * rewrite fans out embarrassingly parallel. The file listing stands
    * in here as (source, doc_id, n_chars) over the documents table; on a
    * real lake it is the transaction log / LIST result.
    */
  val compaction: Q = (s, d) => {
    import s.implicits._
    val files = tbl(s, d, "documents").where($"doc_id" < 2000)
      .select($"source".as("part"), $"doc_id".as("file_id"), $"n_chars".as("bytes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"part").orderBy($"bytes".desc, $"file_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    files.withColumn("cum", sum($"bytes").over(w))
      .withColumn("bin", expr("(cum - bytes) div 8000"))
      .groupBy($"part", $"bin")
      .agg(count(lit(1)).as("n_files"), sum($"bytes").as("bin_bytes"))
      .orderBy($"part", $"bin")
  }
  val compactionSql: String =
    """WITH files AS (
      |  SELECT source AS part, doc_id AS file_id, n_chars AS bytes
      |  FROM documents WHERE doc_id < 2000),
      |a AS (
      |  SELECT part, bytes,
      |         sum(bytes) OVER (PARTITION BY part ORDER BY bytes DESC, file_id
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM files)
      |SELECT part, CAST((cum - bytes) // 8000 AS BIGINT) AS bin,
      |       count(*) AS n_files, CAST(sum(bytes) AS BIGINT) AS bin_bytes
      |FROM a GROUP BY part, bin ORDER BY part, bin""".stripMargin

  // ----------------------------------------------- skip-ratio effectiveness

  /** ly_file_skip — the WHY of this file: quantified min/max file pruning
    * under three physical layouts of the same 32-file table. Every row
    * gets a file under (a) insertion order, (b) value-sorted order,
    * (c) Z-order on (user, value); per (layout, file) min/max envelopes
    * are exactly the footer stats a lakehouse reader prunes with; a
    * value-range predicate and a user-range predicate then count the
    * files whose envelope intersects. Expected shape — and what the gate
    * pins: insertion order scans ~everything on both predicates; a
    * single-column sort is near-perfect on its column and useless on the
    * other; Z-order prunes materially on BOTH — the multi-dimensional
    * trade [[zvalueN]] exists to buy.
    *
    * Dimensions quantize to 8-bit ranks via ntile-256 (locality-
    * preserving, unlike the & mask wrap), with full (col, event_id)
    * orderings so every tile assignment is total-order deterministic.
    * The global ntile windows are the ANALYZER'S emulation of a 32-file
    * write — production writes use [[writeClustered]], where the layout
    * key is the writer's range partitioner and no global window exists.
    * The analyzer runs on a 1-in-10 SYSTEMATIC sample (event_id mod 10,
    * deterministic, oracle-mirrored): layout comparison is a statistics
    * question, and the sample keeps the emulation's one-partition sort
    * bounded while the corpus grows (measured 7.6× wall at 10× data
    * unsampled, ~flat sampled).
    */
  val fileSkip: Q = (s, d) => {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val ev = tbl(s, d, "events").where($"event_id" % 10 === 0)
      .select($"event_id", $"user_id", $"value")
    val px = ntile(256).over(W.orderBy($"user_id", $"event_id")) - 1
    val py = ntile(256).over(W.orderBy($"value", $"event_id")) - 1
    val laid = ev
      .withColumn("zv", zvalue(px, py).cast("long"))
      .withColumn("f_ins", ntile(32).over(W.orderBy($"event_id")).cast("long"))
      .withColumn("f_val", ntile(32).over(W.orderBy($"value", $"event_id")).cast("long"))
      .withColumn("f_z", ntile(32).over(W.orderBy($"zv", $"event_id")).cast("long"))
      .select($"user_id", $"value",
        expr("stack(3, 'insertion', f_ins, 'value_sorted', f_val, 'zorder', f_z)")
          .as(Seq("layout", "file")))
    val stats = laid.groupBy($"layout", $"file").agg(
      min($"value").as("min_v"), max($"value").as("max_v"),
      min($"user_id").as("min_u"), max($"user_id").as("max_u"))
    stats.groupBy($"layout").agg(
        count(lit(1)).as("n_files"),
        sum(when($"min_v" <= 120.0 && $"max_v" >= 100.0, 1L).otherwise(0L))
          .as("hit_value"),
        sum(when($"min_u" <= 120L && $"max_u" >= 100L, 1L).otherwise(0L))
          .as("hit_user"))
      .orderBy($"layout")
  }
  val fileSkipSql: String = {
    val zterms = (0 until Bits).map { i =>
      s"(((px >> $i) & 1) << ${2 * i}) + (((py >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"""WITH q AS (
       |  SELECT event_id, user_id, value,
       |         ntile(256) OVER (ORDER BY user_id, event_id) - 1 AS px,
       |         ntile(256) OVER (ORDER BY value, event_id) - 1 AS py
       |  FROM events WHERE event_id % 10 = 0),
       |laid AS (
       |  SELECT user_id, value,
       |         ntile(32) OVER (ORDER BY event_id) AS f_ins,
       |         ntile(32) OVER (ORDER BY value, event_id) AS f_val,
       |         ntile(32) OVER (ORDER BY CAST($zterms AS BIGINT), event_id) AS f_z
       |  FROM q),
       |st AS (
       |  SELECT layout, file, min(value) AS min_v, max(value) AS max_v,
       |         min(user_id) AS min_u, max(user_id) AS max_u
       |  FROM (
       |    SELECT user_id, value, 'insertion' AS layout, CAST(f_ins AS BIGINT) AS file FROM laid
       |    UNION ALL
       |    SELECT user_id, value, 'value_sorted', CAST(f_val AS BIGINT) FROM laid
       |    UNION ALL
       |    SELECT user_id, value, 'zorder', CAST(f_z AS BIGINT) FROM laid)
       |  GROUP BY layout, file)
       |SELECT layout, count(*) AS n_files,
       |       CAST(sum(CASE WHEN min_v <= 120.0 AND max_v >= 100.0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS hit_value,
       |       CAST(sum(CASE WHEN min_u <= 120 AND max_u >= 100 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS hit_user
       |FROM st GROUP BY layout ORDER BY layout""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "ly_zorder"     -> zorderCurve,
    "ly_file_skip"  -> fileSkip,
    "ly_zorder3"    -> zorder3Curve,
    "ly_hilbert"    -> hilbertCurve,
    "ly_hilbert3"   -> hilbert3Curve,
    "ly_compaction" -> compaction,
  )

  val oracles: Map[String, String] = Map(
    "ly_zorder"     -> zorderCurveSql,
    "ly_file_skip"  -> fileSkipSql,
    "ly_zorder3"    -> zorder3CurveSql,
    "ly_hilbert"    -> hilbertCurveSql,
    "ly_hilbert3"   -> hilbert3CurveSql,
    "ly_compaction" -> compactionSql,
  )
}
