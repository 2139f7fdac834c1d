package graft

import graft.operators.{Graph, Temporal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Linear-scaling probe for the composed temporal operators:
  * `runMain graft.ScaleProbe [nRows]` (default 10M — 100× the sf0.1
  * events table). Generates a deterministic synthetic event stream with
  * `spark.range` (no RNG state: values derive from xxhash64 of the id),
  * then times sessionize, as-of join, binned range join, and the running
  * sum at that scale. The numbers PERF.md cites when claiming the
  * one-shuffle shapes survive a 100× scale-up — each op's cost must grow
  * ~linearly with rows, not blow up on a single-partition collapse.
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10_000_000L)
    val spark: SparkSession = GraftSession.local(appName = "graft-scale-probe")
    import spark.implicits._

    val events = spark.range(n).select(
        $"id".as("event_id"),
        pmod(xxhash64($"id", lit("u")), lit(50000L)).as("user_id"),
        element_at(
          array(lit("click"), lit("view"), lit("purchase"), lit("signup"), lit("error")),
          (pmod(xxhash64($"id", lit("t")), lit(5L)) + 1).cast("int")).as("event_type"),
        (pmod(xxhash64($"id", lit("v")), lit(50000L)) / 100.0).as("value"))
      .repartition(32).persist()
    events.count() // materialize: probes time the operator, not the generator

    def timeIt(label: String)(f: => Long): (String, Double, Long) = {
      f // warm: codegen + JIT
      val t0 = System.nanoTime()
      val rows = f
      (label, (System.nanoTime() - t0) / 1e9, rows)
    }

    val results = Seq(
      timeIt("sessionize") {
        Temporal.sessionize(events, "user_id", "event_id", gap = 500000L)
          .groupBy($"user_id", $"session_id").count().count()
      },
      timeIt("asof_join") {
        val probe = events.where($"event_type" === "click")
          .select($"user_id", $"event_id")
        val build = events.where($"event_type" === "view")
          .select($"user_id", $"event_id", $"value")
        Temporal.asofJoin(probe, build, Seq("user_id"), "event_id").count()
      },
      timeIt("range_join") {
        val bands = spark.createDataFrame(
          (0 until 10).map(i => (i, i * 50.0, (i + 1) * 50.0))).toDF("band_id", "lo", "hi")
        Temporal.binnedRangeJoin(events, "value", broadcast(bands), "lo", "hi", 50.0)
          .groupBy($"band_id").count().count()
      },
      timeIt("running_sum") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events.select($"user_id", sum(floor($"value").cast("long")).over(w).as("rv"))
          .where($"rv" < 0).count() // forces full evaluation, tiny result
      },
      // The adversarial CC input: ONE component shaped as an n/100-hop
      // chain (every 100th id linked in sequence). Min-label propagation
      // would need n/100 rounds — hours of driver round-trips; the star
      // path must land in ~2·log2 rounds or the O(log n) claim is talk.
      timeIt("cc_star_chain") {
        val chain = spark.range(n / 100 - 1)
          .select(($"id" * 100).as("a"), (($"id" + 1) * 100).as("b"))
        Graph.connectedComponentsStar(chain, maxIter = 40)
          .agg(count_distinct(col("cluster"))).as[Long].head()
      })

    val fields = results.map { case (l, s, r) => s""""$l":{"sec":$s,"rows":$r}""" }
    println(s"""{"n":$n,${fields.mkString(",")}}""")
    spark.stop()
  }
}
