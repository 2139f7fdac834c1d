package graft

/** Plan-evidence dump: `runMain graft.Explain <sfDir> [query ...]` prints
  * the formatted physical plan of each named gate query (all when none
  * named). The artifact PERF.md cites when claiming pushdown/broadcast/
  * no-global-shuffle properties — re-runnable instead of trusted.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(appName = "graft-explain")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(q) =>
          println(s"\n===== $n =====")
          try q(spark, sfDir).explain("formatted")
          catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
        case None => println(s"\n===== $n ===== UNKNOWN QUERY")
      }
    }
    spark.stop()
  }
}
