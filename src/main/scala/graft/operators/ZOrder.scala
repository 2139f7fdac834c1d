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

  /** Interleave the low [[Bits]] bits of two non-negative longs:
    * z = Σᵢ ((x>>i)&1)·2^(2i) + ((y>>i)&1)·2^(2i+1). Callers normalize
    * dimensions into [0, 2^Bits) first (bucketing preserves locality).
    */
  def zvalue(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)

  /** Write `df` z-clustered on two pre-bucketed dimension columns: range
    * partition on the z-value (balanced files even under skew — range
    * boundaries come from a sample), sort within partitions so row-group
    * stats are tight, drop the helper column on disk.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, files: Int): Unit =
    df.withColumn("__z", zvalue(col(xCol), col(yCol)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
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

  val queries: Map[String, Q] = Map(
    "ly_zorder" -> zorderCurve,
  )

  val oracles: Map[String, String] = Map(
    "ly_zorder" -> zorderCurveSql,
  )
}
