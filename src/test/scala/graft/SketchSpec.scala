package graft

import graft.functions.sketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SpaceSaving heavy-hitters: sketch top-k must contain the true heavy
  * hitters with counts within the sketch's error bound.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val toks = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(explode(split($"text", " ")).as("tok"))
    .cache()

  test("sketch finds the true top tokens with bounded error") {
    val exact = toks.groupBy($"tok").count()
      .orderBy($"count".desc, $"tok").limit(10)
      .as[(String, Long)].collect()
    val sketched = toks.agg(sketch.top_k_freq($"tok", 10).as("tk"))
      .select(explode($"tk").as("s"))
      .select($"s.item", $"s.est_count", $"s.max_err")
      .as[(String, Long, Long)].collect()
    val exactMap = toks.groupBy($"tok").count().as[(String, Long)].collect().toMap
    // every sketched item's estimate bounds its true count
    sketched.foreach { case (item, est, err) =>
      val truth = exactMap.getOrElse(item, 0L)
      assert(est >= truth && est - err <= truth,
        s"$item: est=$est err=$err truth=$truth")
    }
    // the true #1 and #2 heavy hitters must be present
    val sketchedItems = sketched.map(_._1).toSet
    assert(exact.take(2).forall(e => sketchedItems.contains(e._1)),
      s"top-2 ${exact.take(2).map(_._1).toSeq} not all in ${sketchedItems}")
  }

  test("sketch is deterministic across runs") {
    val a = toks.agg(sketch.top_k_freq($"tok", 5)).head().getSeq[Any](0)
    val b = toks.agg(sketch.top_k_freq($"tok", 5)).head().getSeq[Any](0)
    assert(a == b)
  }
}
