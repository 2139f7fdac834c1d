package graft

/** Plan diagnostic: run a named gate query and dump its executed plan.
  * Usage: tools/run_main.sh graft.PlanDump <query> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.PlanDump <query> [sfDir]")
      sys.exit(2)
    }
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val fn = SparkEntry.queries.getOrElse(name, {
      System.err.println(s"unknown query: $name (${SparkEntry.queries.size} known; " +
        "see SparkEntry.queries keys)")
      sys.exit(2)
    })
    val spark = GraftSession.local(cpus = "32", appName = "plancheck")
    spark.sparkContext.setLogLevel("ERROR")
    val df = fn(spark, d)
    val t0 = System.nanoTime()
    // execute df's OWN query execution (not a derived count plan) so the
    // printed AdaptiveSparkPlan is the AQE-final one
    df.queryExecution.toRdd.count()
    println(f"wall: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
