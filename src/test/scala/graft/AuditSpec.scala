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

  test("ordering audit fires on a line shipped before its order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ord").toString
    def d(s: String) = java.sql.Date.valueOf(s)
    Seq((1L, "1-URGENT", d("2024-05-10")))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, d("2024-05-12")), (1L, d("2024-05-08")))
      .toDF("l_orderkey", "l_shipdate").write.parquet(s"$dir/lineitem.parquet")
    val r = graft.operators.Audit.ordering(spark, dir).collect().head
    assert(r.getAs[Long]("n_lines") == 2L && r.getAs[Long]("n_violations") == 1L)
    assert(r.getAs[Double]("violation_rate") == 0.5)
    assert(r.getAs[Long]("min_lag") == -2L && r.getAs[Long]("max_lag") == 2L)
    assert(r.getAs[Double]("mean_lag") == 0.0)
  }
}
