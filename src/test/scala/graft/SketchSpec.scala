package graft

import graft.functions.sketch
import graft.operators.Sketches
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

  test("CMS estimate dominates the exact count for EVERY token") {
    val cms = operators.Sketches.cmsCells(toks).cache()
    val exact = toks.groupBy($"tok").count()
    val est = operators.Sketches.cmsEstimate(cms, exact.select($"tok"))
    val bad = exact.join(est, Seq("tok"))
      .where($"est" < $"count").as[(String, Long, Long)].collect()
    assert(bad.isEmpty, s"CMS undercounted: ${bad.take(5).toSeq}")
    // a token never inserted estimates at most the collision mass, and the
    // left_outer path returns 0 when all its cells are empty
    val ghost = operators.Sketches
      .cmsEstimate(cms, Seq("⟂never-seen-token⟂").toDF("tok"))
      .as[(String, Long)].head()
    assert(ghost._2 >= 0L)
    cms.unpersist()
  }

  test("md5-HLL registers merge by cell-wise max; raw estimate lands near exact") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val whole = operators.Sketches.hllRegisters($"l_orderkey", li)
    val merged = operators.Sketches
      .hllRegisters($"l_orderkey", li.where($"l_orderkey" % 2 === 0))
      .unionAll(operators.Sketches
        .hllRegisters($"l_orderkey", li.where($"l_orderkey" % 2 =!= 0)))
      .groupBy($"reg").agg(max($"mx").as("mx"))
    assert(merged.join(whole, Seq("reg"))
      .where(merged("mx") =!= whole("mx")).isEmpty)
    assert(merged.count() == whole.count())
    // the estimate the registers yield is within the m=256 error budget
    val Array(exact, est) = operators.Sketches.hllEst(spark, "/root/testdata/sf0.001")
      .collect().head.toSeq.map(_.toString.toDouble).toArray
    assert(math.abs(est - exact) / exact < 0.2, s"est=$est exact=$exact")
  }

  test("CMS shard sketches merge cell-wise into the whole-corpus sketch") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def tk(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(split(lower($"text"), " ")).as("tok"))
        .where(length($"tok") > 0)
    val whole = operators.Sketches.cmsCells(tk(docs))
    val merged = operators.Sketches.cmsMerge(
      operators.Sketches.cmsCells(tk(docs.where($"doc_id" % 2 === 0))),
      operators.Sketches.cmsCells(tk(docs.where($"doc_id" % 2 =!= 0))))
    assert(merged.join(whole, Seq("r", "b"))
      .where(merged("c") =!= whole("c")).isEmpty)
    assert(merged.count() == whole.count())
  }

  test("KMV sketch is exact below k and its set-ops recover crafted overlaps") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv").toString
    // day 2024-07-01: views by users 1,2; purchase by user 2 only
    val ts = java.sql.Timestamp.valueOf("2024-07-01 10:00:00")
    Seq((1L, 1L, "view", ts), (2L, 2L, "view", ts), (3L, 2L, "purchase", ts),
        (4L, 1L, "view", ts)) // duplicate user-day view must not double-count
      .toDF("event_id", "user_id", "event_type", "ts")
      .write.parquet(s"$dir/events.parquet")
    val est = Sketches.kmvEst(spark, dir)
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // below k the sketch IS the exact set: est == exact, ok everywhere
    assert(est("view") == ((2L, 2.0, true)))
    assert(est("purchase") == ((1L, 1.0, true)))
    val so = Sketches.kmvSetops(spark, dir).collect().head
    assert(so.getAs[Long]("exact_union") == 2L)
    assert(so.getAs[Double]("est_union") == 2.0)
    assert(so.getAs[Long]("exact_inter") == 1L)
    assert(so.getAs[Double]("est_inter") == 1.0)
    assert(so.getAs[Boolean]("ok_union") && so.getAs[Boolean]("ok_inter"))
  }
}
