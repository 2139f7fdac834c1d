package graft.hypermap

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S7 — the reference's secondary indexes (sparse per-type Mongo indexes,
  * scripts/extract-events.ts:163-166) replaced by physical layout, the
  * columnar-warehouse way (SURVEY.md §4):
  *
  *   - `partitionBy(eventType, block_bucket)`: partition pruning serves
  *     the two hot predicates (type filter from Q1/A1, block range from
  *     S1) — a type+range query at 100 TB touches only matching
  *     directories.
  *   - parquet row-group min/max stats on blockNumber/namehash give
  *     file-level skipping inside each partition (the "index" for Q3
  *     point lookups); sortWithinPartitions tightens those ranges —
  *     the plain-parquet equivalent of Z-ordering a single column.
  *   - bucket counts: block_bucket = blockNumber / 100k blocks keeps
  *     partitions coarse (~2 days of chain) so small-file pressure stays
  *     bounded; tune with expected event density.
  */
object Layout {

  val BlockBucketSize = 100000L

  /** Write the wide events table in pruned layout. */
  def writeEvents(events: DataFrame, dir: String,
                  mode: SaveMode = SaveMode.Overwrite): Unit =
    events
      .withColumn("block_bucket",
        (floor(col("blockNumber") / BlockBucketSize) * BlockBucketSize).cast("long"))
      .sortWithinPartitions(col("blockNumber"), col("logIndex"))
      .write
      .partitionBy("eventType", "block_bucket")
      .mode(mode)
      .parquet(dir)

  /** Read back with partition columns restored to the wide schema shape. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("block_bucket")

  /** Entries table: high-cardinality point lookups on namehash →
    * range-sort so file stats give the lookup pruning (Z-order stand-in).
    */
  def writeEntries(entries: DataFrame, dir: String, buckets: Int = 64): Unit =
    entries
      .repartitionByRange(buckets, col("namehash"))
      .sortWithinPartitions(col("namehash"))
      .write.mode(SaveMode.Overwrite).parquet(dir)
}
