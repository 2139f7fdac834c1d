package graft

import graft.operators.Audit
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the data-quality audit family beyond what the oracle gates
  * hash-check: the correlation screen must SEPARATE the two regimes it
  * exists to detect (independent columns vs near-collinear ones), not just
  * reproduce numbers.
  */
class AuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("corrMatrix separates independent measures from derived revenue") {
    val corr = Audit.corrMatrix(spark, sf)
      .as[(String, Double)].collect().toMap
    assert(corr.size == 10, s"expected 10 pairs, got ${corr.keySet}")
    // revenue = extendedprice·(1−discount): near-collinear with price,
    // meaningfully negatively coupled to discount
    assert(corr("l_extendedprice~revenue") > 0.99,
      s"derived-column leakage not detected: ${corr("l_extendedprice~revenue")}")
    assert(corr("l_discount~revenue") < 0.0)
    // the generator's base measures are mutually independent
    val base = Seq("l_quantity~l_extendedprice", "l_quantity~l_discount",
      "l_quantity~l_tax", "l_extendedprice~l_discount",
      "l_extendedprice~l_tax", "l_discount~l_tax")
    base.foreach(p =>
      assert(math.abs(corr(p)) < 0.05, s"$p unexpectedly correlated: ${corr(p)}"))
    // Pearson r is bounded
    corr.values.foreach(r => assert(r >= -1.0 && r <= 1.0))
  }

  test("fkOrphans reports zero orphans on physical edges, fires on the lagged dim") {
    val edges = Audit.fkOrphans(spark, sf)
      .as[(String, Long, Long)].collect()
      .map { case (e, n, o) => e -> ((n, o)) }.toMap
    val (laggedN, laggedOrphans) = edges("orders.o_custkey->customer@lagged")
    assert(laggedOrphans > 0 && laggedOrphans < laggedN,
      s"lagged edge should fire partially: $laggedOrphans of $laggedN")
    edges.filterNot(_._1.endsWith("@lagged")).foreach { case (e, (_, o)) =>
      assert(o == 0L, s"physical edge $e has $o orphans") }
  }
}
