package graft

import graft.operators.{Graph, Sketches, Temporal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-2 composed operators: sessionize, as-of join,
  * binned range join, connected components, mergeable sketches.
  */
class TemporalGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sessionize splits on gaps strictly greater than the threshold") {
    val df = Seq(
      (1L, 10L), (1L, 15L), (1L, 25L), // gap 10 == threshold → same session
      (1L, 40L),                       // gap 15 > threshold → new session
      (2L, 100L)                       // other user: own session 0
    ).toDF("k", "t")
    val out = Temporal.sessionize(df, "k", "t", gap = 10L)
      .select($"k", $"t", $"session_id").as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 10L, 0L), (1L, 15L, 0L), (1L, 25L, 0L),
      (1L, 40L, 1L), (2L, 100L, 0L)))
  }

  test("asofJoin picks the latest build row at-or-before each probe row") {
    val probe = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "tag")
    val build = Seq((1L, 5L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0))
      .toDF("k", "t", "v")
    val out = Temporal.asofJoin(probe, build, Seq("k"), "t")
      .select($"k", $"t", $"tag", $"asof_t", $"asof_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4))).toSet
    assert(out == Set(
      (1L, 10L, "p1", 5L, 1.0),   // strictly-before build row
      (1L, 20L, "p2", 20L, 2.0),  // equal ordinal matches (≤ semantics)
      (2L, 5L, "p3", null, null)  // no build row for this key
    ))
  }

  test("asofJoin keeps all asof_ columns from the same build row") {
    // Build row at t=5 has a null v; a per-column last(ignoreNulls) would
    // stitch v from t=1 with t from t=5. The struct transport must not.
    val probe = Seq((1L, 10L)).toDF("k", "t")
    val build = Seq((1L, 1L, Some(9.0)), (1L, 5L, None)).toDF("k", "t", "v")
    val r = Temporal.asofJoin(probe, build, Seq("k"), "t")
      .select($"asof_t", $"asof_v").collect().head
    assert(r.getLong(0) == 5L && r.isNullAt(1))
  }

  test("binnedRangeJoin equals the naive inequality join") {
    val facts = spark.range(0, 1000).select(($"id" * 7 % 501).cast("double").as("v"))
    val ranges = spark.createDataFrame(Seq(
      (0, 0.0, 120.0), (1, 120.0, 121.5), (2, 121.5, 500.0), (3, 600.0, 700.0)
    )).toDF("rid", "lo", "hi")
    val binned = Temporal.binnedRangeJoin(facts, "v", ranges, "lo", "hi", 50.0)
      .groupBy($"rid").count().as[(Int, Long)].collect().toMap
    val naive = facts.join(ranges, $"v" >= $"lo" && $"v" < $"hi")
      .groupBy($"rid").count().as[(Int, Long)].collect().toMap
    assert(binned == naive)
    assert(!binned.contains(3)) // empty range stays empty
  }

  test("connectedComponents labels chains, cliques and handles convergence") {
    // chain 1-2-3-4 (diameter 3), clique 10-11-12, pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (21L, 20L)).toDF("a", "b")
    val cc = Graph.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents refuses to return unconverged labels") {
    val chain = (1L until 6L).map(i => (i, i + 1)).toDF("a", "b") // diameter 5
    intercept[IllegalStateException] {
      Graph.connectedComponents(chain, maxIter = 2)
    }
    val cc = Graph.connectedComponents(chain, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet == Set(1L) && cc.size == 6)
  }

  test("HLL sketches merge across groups to the exact distinct count") {
    val df = spark.range(0, 5000)
      .select(($"id" % 10).as("g"), ($"id" % 700).as("v"))
    val perGroup = Sketches.distinctSketchByGroup(df.toDF(), "g", "v")
    val merged = Sketches.mergeSketches(
      perGroup.withColumn("all", lit(1)), "all")
    val est = merged.select($"approx_distinct").as[Long].collect().head
    assert(math.abs(est - 700L) <= 35L, s"HLL estimate $est off by >5%")
  }
}
