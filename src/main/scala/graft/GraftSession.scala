package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: every entry point (Verify, Bench, tests)
  * builds its session here so config stays consistent.
  *
  * Scale notes (targets a 1000-executor cluster; local[N] only for tests):
  *   - AQE on: runtime partition coalescing, skew-join splitting, and
  *     dynamic broadcast conversion replace hand-tuned chunk sizes
  *     (reference's CHUNK_SIZE constants, SURVEY.md §4).
  *   - shuffle.partitions matches local cores here; on a real cluster this
  *     is sized to ~2-3× total cores and AQE coalesces down.
  *   - nanosAsLong: the driver's `events.ts` parquet column is
  *     TIMESTAMP(NANOS) which Spark 4 otherwise rejects; reading it as
  *     epoch-nanos Long keeps full precision (DuckDB keeps ns too).
  */
object GraftSession {

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
