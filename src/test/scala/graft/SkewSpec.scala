package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted aggregation/join equivalence: skew mitigation must not change
  * results.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("salted sum/count equals plain aggregation") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy($"event_type".as("k"))
      .agg(sum(floor($"value").cast("long")).as("total"), count(lit(1)).as("cnt"))
    val salted = Skew.saltedSumCount(ev, $"event_type",
      floor($"value").cast("long"), $"event_id", buckets = 8)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey", $"l_quantity")
    val p = Tables.part(spark, sf).select($"p_partkey".as("l_partkey"), $"p_brand")
    val plain = li.join(p, Seq("l_partkey")).select($"l_orderkey", $"l_partkey", $"p_brand")
    val salted = Skew.saltedJoin(li, p, "l_partkey", $"l_orderkey", buckets = 4)
      .select($"l_orderkey", $"l_partkey", $"p_brand")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() == plain.count())
  }
}
