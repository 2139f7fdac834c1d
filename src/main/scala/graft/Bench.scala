package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry point (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR at local[N] and prints ONE JSON line.
  *
  * Methodology: a warmup pass (flagship + one shuffle-heavy query) absorbs
  * JVM JIT + codegen compilation so per-query numbers measure the engine,
  * not first-call compilation; queries then run in sorted name order
  * (deterministic attribution across rounds).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "graft-bench")

    // warmup: JIT + codegen + parquet footer caches
    try {
      SparkEntry.entry(spark).count()
      operators.Relational.tpchQ1(spark, sfDir).count()
      operators.Relational.tpchQ3(spark, sfDir).count()
    } catch { case _: Throwable => }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
