package graft

import org.apache.spark.sql.functions._

/** Per-round cost decomposition for the iterative graph family:
  * `runMain graft.IterBench [sfDir]`.
  *
  * gr_hits (and the cc_* loops) pay a fixed per-round cost — job
  * scheduling, stage setup, checkpoint bookkeeping — on top of the actual
  * keyed join+aggregate data work. PERF.md claims the fixed part
  * "vanishes at scale" (cores grow with bytes, scheduling doesn't); this
  * main puts a number on it by timing `hitsBipartite` at iters = 1..4 and
  * reporting the MARGINAL wall per added round (3-pass medians, warm).
  * The marginal round cost at a tiny sf is ~pure scheduling floor (data
  * work negligible); the same marginal at sf0.1 / sf1 splits into
  * floor + data term. One JSON line per sfDir.
  */
object IterBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "graft-iter-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def bp = Tables.t(spark, sfDir, "orders")
      .join(Tables.t(spark, sfDir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))

    // warm: codegen + parquet footers + the persisted edge build
    operators.Graph.hitsBipartite(bp, iters = 3).count()

    val medians = (1 to 4).map { it =>
      val times = Seq.fill(3) {
        val t0 = System.nanoTime()
        operators.Graph.hitsBipartite(bp, iters = it).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      it -> times(1)
    }
    val marginals = medians.sliding(2).map {
      case Seq((_, a), (i2, b)) => i2 -> (b - a)
    }.toSeq
    val mj = medians.map { case (i, v) => s""""iters_$i":${f"$v%.3f"}""" }.mkString(",")
    val gj = marginals.map { case (i, v) => s""""round_$i":${f"$v%.3f"}""" }.mkString(",")
    spark.stop()
    println()
    println(s"""{"metric":"gr_hits_rounds","sf":"$sfDir",$mj,$gj}""")
    System.out.flush()
  }
}
