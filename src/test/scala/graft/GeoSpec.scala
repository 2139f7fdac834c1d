package graft

import graft.operators.Geo
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Haversine correctness and band-pruning exactness for the geo gates. */
class GeoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("haversine matches the known Paris-London great-circle distance") {
    val got = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF("a", "b", "c", "d")
      .select(Geo.haversine(col("a"), col("b"), col("c"), col("d")).as("km"))
      .as[Double].collect().head
    assert(math.abs(got - 343.56) < 1.0, s"got $got km")
  }

  test("banded radius join equals the unpruned cross join (pruning is exact)") {
    val sf = "/root/testdata/sf0.001"
    val pruned = Geo.geoRadiusJoin(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    val cust = Geo.coords(graft.Tables.t(spark, sf, "customer"), "c_custkey")
      .select($"c_custkey", $"lat".as("clat"), $"lon".as("clon"))
    val supp = Geo.coords(graft.Tables.t(spark, sf, "supplier"), "s_suppkey")
      .select($"s_suppkey", $"lat".as("slat"), $"lon".as("slon"))
    val brute = cust.crossJoin(supp)
      .withColumn("dist_km",
        round(Geo.haversine($"clat", $"clon", $"slat", $"slon"), 4))
      .where($"dist_km" <= 200.0)
      .select($"c_custkey", $"s_suppkey", $"dist_km")
      .as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty, "fixture should yield at least one pair")
    assert(pruned == brute,
      s"pruning lost/invented pairs: ${pruned.diff(brute)} / ${brute.diff(pruned)}")
  }

  test("geoRadiusKnn equals the brute-force radius join capped at k per probe") {
    val sf = "/root/testdata/sf0.001"
    val got = Geo.geoRadiusKnn(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    val cust = Geo.coords(graft.Tables.t(spark, sf, "customer"), "c_custkey")
      .select($"c_custkey", $"lat".as("clat"), $"lon".as("clon"))
    val supp = Geo.coords(graft.Tables.t(spark, sf, "supplier"), "s_suppkey")
      .select($"s_suppkey", $"lat".as("slat"), $"lon".as("slon"))
    val brute = cust.crossJoin(supp)
      .withColumn("dist_km",
        round(Geo.haversine($"clat", $"clon", $"slat", $"slon"), 4))
      .where($"dist_km" <= 200.0)
      .select($"c_custkey", $"s_suppkey", $"dist_km")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(
        _.sortBy(r => (r._3, r._2)).take(Geo.GeoRadiusK).map(r => (r._2, r._3)).toSeq)
      .toMap
    assert(got.nonEmpty && got.keySet == brute.keySet)
    got.foreach { case (c, neigh) =>
      assert(neigh == brute(c), s"probe $c: $neigh vs ${brute(c)}")
      assert(neigh.size <= Geo.GeoRadiusK)
      assert(neigh.forall(_._2 <= 200.0), s"probe $c: match beyond the radius")
    }
  }

  test("lon sub-cell pruning is a pure optimization: flag off (pure band) " +
       "equals flag on, pair for pair") {
    // The unpruned-cross-join test above already proves the lon-cell
    // path exact; this pins the A/B control itself (r17 verdict item 2):
    // -Dgraft.geo.lonCells=false must give the identical answer via the
    // band-only plan, so PERF A/Bs compare plans, never semantics.
    val sf = "/root/testdata/sf0.001"
    val on = Geo.geoRadiusJoin(spark, sf).as[(Long, Long, Double)].collect().toSet
    val prev = sys.props.put("graft.geo.lonCells", "false")
    val off = try
      Geo.geoRadiusJoin(spark, sf).as[(Long, Long, Double)].collect().toSet
    finally prev match {
      case Some(v) => sys.props.put("graft.geo.lonCells", v)
      case None => sys.props.remove("graft.geo.lonCells")
    }
    assert(on.nonEmpty && on == off,
      s"lon-cell pruning changed the answer: ${on.diff(off)} / ${off.diff(on)}")
  }

  test("geo_knn_exact equals the WINDOW-FREE brute-force global top-3 " +
       "(band widening terminates with the true neighbors)") {
    val sf = "/root/testdata/sf0.001"
    val got = Geo.geoKnnExact(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    val cust = Geo.coords(graft.Tables.t(spark, sf, "customer"), "c_custkey")
      .where($"c_custkey" <= 300)
      .select($"c_custkey", $"lat".as("clat"), $"lon".as("clon"))
    val supp = Geo.coords(graft.Tables.t(spark, sf, "supplier"), "s_suppkey")
      .select($"s_suppkey", $"lat".as("slat"), $"lon".as("slon"))
    val brute = cust.crossJoin(supp)
      .withColumn("dist_km",
        round(Geo.haversine($"clat", $"clon", $"slat", $"slon"), 4))
      .select($"c_custkey", $"s_suppkey", $"dist_km")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).toSeq
      .flatMap { case (c, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(3).zipWithIndex
          .map { case ((_, sk, dk), i) => (c, (i + 1).toLong, sk, dk) }
      }.sortBy(r => (r._1, r._2))
    assert(got.nonEmpty && got == brute,
      s"first diff: ${got.zip(brute).find(p => p._1 != p._2)}")
  }

  test("MinKPairs buffer: bounded at k, merge exact, (score, id) tie-break, " +
       "duplicate add is idempotent") {
    val a = new graft.functions.MinKPairs(3)
    Seq((5.0, 50L), (1.0, 10L), (3.0, 30L), (4.0, 40L)).foreach { case (s, i) => a.add(s, i) }
    assert(a.pairs.toSeq == Seq((1.0, 10L), (3.0, 30L), (4.0, 40L)))
    // duplicate of a live pair must not evict anything
    a.add(1.0, 10L)
    assert(a.pairs.toSeq == Seq((1.0, 10L), (3.0, 30L), (4.0, 40L)))
    // equal score, smaller id wins the last slot (deterministic tie-break)
    a.add(4.0, 39L)
    assert(a.pairs.toSeq == Seq((1.0, 10L), (3.0, 30L), (4.0, 39L)))
    val b = new graft.functions.MinKPairs(3)
    Seq((0.5, 5L), (2.0, 20L)).foreach { case (s, i) => b.add(s, i) }
    a.merge(b)
    assert(a.pairs.toSeq == Seq((0.5, 5L), (1.0, 10L), (2.0, 20L)),
      s"merge broke the k-smallest invariant: ${a.pairs.toSeq}")
  }

  test("geoKnn equals brute-force top-3 restricted to the declared band window") {
    val sf = "/root/testdata/sf0.001"
    val got = Geo.geoKnn(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    val cust = Geo.coords(graft.Tables.t(spark, sf, "customer"), "c_custkey")
      .where($"c_custkey" <= 300)
      .select($"c_custkey", $"lat".as("clat"), $"lon".as("clon"))
    val supp = Geo.coords(graft.Tables.t(spark, sf, "supplier"), "s_suppkey")
      .select($"s_suppkey", $"lat".as("slat"), $"lon".as("slon"))
    val brute = cust.crossJoin(supp)
      .where(floor($"slat" / 2.0) - floor($"clat" / 2.0) >= -2 &&
        floor($"slat" / 2.0) - floor($"clat" / 2.0) <= 2)
      .withColumn("dist_km",
        round(Geo.haversine($"clat", $"clon", $"slat", $"slon"), 4))
      .as[(Long, Double, Double, Long, Double, Double, Double)].collect()
      .groupBy(_._1).view.mapValues(
        _.sortBy(r => (r._7, r._4)).take(3).map(r => (r._4, r._7)).toSeq).toMap
    assert(got.nonEmpty && got.keySet == brute.keySet.filter(brute(_).nonEmpty))
    got.foreach { case (c, neigh) =>
      assert(neigh == brute(c), s"probe $c: $neigh vs ${brute(c)}")
      // ranked by distance, nearest first
      assert(neigh.map(_._2) == neigh.map(_._2).sorted)
    }
  }
}
