package graft

import graft.hypermap.{Decode, Fixtures, Sinks}
import org.apache.spark.sql.functions._

/** Write-amplification benchmark for the two S6 upsert paths:
  * `runMain graft.SinkBench [nLogs] [batchRows] [nBuckets]`.
  *
  * Seeds a table from the bulk ABI-correct fixture, then applies the same
  * small update batch through the flat full-rewrite upsert and the
  * bucketed O(touched) upsert, reporting wall time and bytes written per
  * batch. The numbers PERF.md cites for the bucketed-sink claim.
  */
object SinkBench {

  private def dirBytes(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(dir))
  }

  def main(args: Array[String]): Unit = {
    val nLogs = args.headOption.map(_.toInt).getOrElse(200000)
    val batchRows = args.lift(1).map(_.toInt).getOrElse(1000)
    val nBuckets = args.lift(2).map(_.toInt).getOrElse(256)
    val spark = GraftSession.local(appName = "graft-sink-bench")
    val base = java.nio.file.Files.createTempDirectory("graft-sinkbench")
    try {
      val decoded = Decode.decode(Fixtures.toDF(spark, Fixtures.randomLogs(nLogs)))
        .repartition(32).persist()
      val n = decoded.count()
      // spread batch: keys uniform over all buckets — bucketing's WORST case
      // (touches ~every bucket). narrow batch: keys confined to 4 buckets —
      // the incremental-entries shape (few distinct keys per micro-batch).
      val spreadBatch = decoded.orderBy(col("event_id")).limit(batchRows).persist()
      val narrowBatch = decoded
        .where(Sinks.bucketCol("event_id", nBuckets) < 4)
        .orderBy(col("event_id")).limit(batchRows).persist()
      spreadBatch.count(); narrowBatch.count()

      val flatDir = base.resolve("flat").toString
      val bucketedDir = base.resolve("bucketed").toString
      Sinks.upsert(spark, flatDir, decoded)
      Sinks.upsertBucketed(spark, bucketedDir, decoded, nBuckets = nBuckets)
      val tableBytes = dirBytes(flatDir)

      def timeIt(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // warm both paths once, then measure
      Sinks.upsert(spark, flatDir, spreadBatch)
      Sinks.upsertBucketed(spark, bucketedDir, spreadBatch, nBuckets = nBuckets)
      val flatSec = timeIt(Sinks.upsert(spark, flatDir, spreadBatch))
      val spreadSec = timeIt(
        Sinks.upsertBucketed(spark, bucketedDir, spreadBatch, nBuckets = nBuckets))
      val narrowSec = timeIt(
        Sinks.upsertBucketed(spark, bucketedDir, narrowBatch, nBuckets = nBuckets))

      println(s"""{"rows":$n,"batch":$batchRows,"buckets":$nBuckets,""" +
        s""""table_mb":${tableBytes / 1048576.0},""" +
        s""""flat_upsert_sec":$flatSec,"bucketed_spread_sec":$spreadSec,""" +
        s""""bucketed_narrow_sec":$narrowSec}""")
    } finally {
      // don't leak hundreds of MB of bench tables per run
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(base.toFile)
      spark.stop()
    }
  }
}
