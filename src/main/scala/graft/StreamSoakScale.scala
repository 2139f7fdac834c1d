package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.hypermap._
import graft.streaming.Tail

/** Streaming-tail scale soak (r15 verdict item 6): proves the per-batch
  * wall of `Tail.startWithEntriesBucketed` stays O(touched keys) — NOT
  * O(entries table) — as the maintained table grows across decades.
  *
  * `runMain graft.StreamSoakScale [smallSeed] [scale] [batches] [batchLogs]`
  * (defaults 40000, 10, 6, 200).
  *
  * For each seed size S ∈ {small, small×scale}:
  *   1. BACKFILL through the batch path, per the tail's documented cost
  *      contract (Tail.scala): decode `Fixtures.randomLogs(S)`, land the
  *      events table, full-fold into the bucketed entries layout.
  *   2. Start the bucketed tail over an empty raw dir, then land
  *      `batches` chunk files of `batchLogs` fresh ABI-correct logs each
  *      (disjoint id/block space — the steady-state tail shape: small
  *      batches touching few keys) and time each
  *      `processAllAvailable()`.
  *
  * Per-batch work = events-table columnar scan filtered to the batch's
  * keys (broadcast semi-join) + fold of the touched slice + O(touched
  * buckets) write, so the wall across a `scale`× larger table should
  * grow far below `scale`× — the printed `ratio` is the evidence row
  * PERF.md records, and StreamingSpec holds the CI-sized assertion.
  */
object StreamSoakScale {

  private def timeIt[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Land one raw-log chunk file (NDJSON, Schemas.rawLogs shape) the way
    * Rpc.pollOnce would, atomically (write-then-rename into the tailed
    * dir so the file stream never reads a partial file).
    */
  private def landChunk(s: SparkSession, rawDir: String, name: String,
                        logs: Seq[Fixtures.Log]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-soak-chunk").toString
    Fixtures.toDF(s, logs).coalesce(1).write.mode("overwrite").json(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
      .getOrElse(sys.error(s"no part file in $tmp"))
    java.nio.file.Files.move(part.toPath,
      new java.io.File(rawDir, name).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    (): Unit
  }

  /** One full soak at a given seed size; returns per-batch walls. */
  def soak(s: SparkSession, seedLogs: Int, batches: Int, batchLogs: Int,
           base: java.nio.file.Path): Seq[Double] = {
    val rawDir = base.resolve("raw").toString
    val evDir = base.resolve("ev").toString
    val enDir = base.resolve("en").toString
    val ckDir = base.resolve("ck").toString
    new java.io.File(rawDir).mkdirs()
    // 1. batch backfill (seed the big table)
    val seeded = Decode.decode(
      Fixtures.toDF(s, Fixtures.randomLogs(seedLogs))).cache()
    Sinks.insertIfAbsent(s, evDir, seeded)
    Sinks.upsertBucketed(s, enDir, EntriesFold.fold(seeded),
      nBuckets = 64, keyCol = "namehash")
    seeded.unpersist()
    // 2. steady-state tail: small fresh batches against the seeded table
    val q = Tail.startWithEntriesBucketed(s, rawDir + "/chunk_*.json",
      evDir, enDir, ckDir, trigger = Trigger.ProcessingTime("1 second"),
      nBuckets = 64)
    try {
      (1 to batches).map { b =>
        landChunk(s, rawDir, f"chunk_$b%04d.json",
          Fixtures.randomLogs(batchLogs, seed = 1000L + b,
            idOffset = seedLogs.toLong + b.toLong * batchLogs))
        timeIt(q.processAllAvailable())
      }
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val smallSeed = args.headOption.map(_.toInt).getOrElse(40000)
    val scale = args.lift(1).map(_.toInt).getOrElse(10)
    val batches = args.lift(2).map(_.toInt).getOrElse(6)
    val batchLogs = args.lift(3).map(_.toInt).getOrElse(200)
    val spark = GraftSession.local(appName = "graft-stream-soak")
    spark.sparkContext.setLogLevel("ERROR")
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val root = java.nio.file.Files.createTempDirectory("graft-soak")
    // warmup soak: absorb JIT/codegen for the whole tail path so the
    // measured small-vs-large pair isn't tilted by compile order (the
    // first soak otherwise runs cold and inflates its own walls)
    soak(spark, 500, 2, batchLogs, root.resolve("warm"))
    val small = soak(spark, smallSeed, batches, batchLogs, root.resolve("small"))
    val large = soak(spark, smallSeed * scale, batches, batchLogs, root.resolve("large"))
    val ratio = med(large) / med(small)
    spark.stop()
    println()
    println(s"""{"metric":"stream_soak","small_seed":$smallSeed,"scale":$scale,""" +
      s""""batch_logs":$batchLogs,"small_batch_sec":[${small.map(t => f"$t%.3f").mkString(",")}],""" +
      s""""large_batch_sec":[${large.map(t => f"$t%.3f").mkString(",")}],""" +
      f""""median_small":${med(small)}%.3f,"median_large":${med(large)}%.3f,"ratio":$ratio%.2f}""")
  }
}
