package graft

import graft.operators.Recommender
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed co-occurrence/cosine/lift on a four-basket fixture. */
class RecommenderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-rec").toString
    // baskets: b1={1,2,3} (item 1 twice — distinct must dedup), b2={1,2},
    // b3={1,2,4}, b4={3,4} → only pair (1,2) reaches support 2 (count 3)
    val lines = Seq((1L, 1L), (1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (3L, 4L), (4L, 3L), (4L, 4L))
    lines.toDF("l_orderkey", "l_partkey").write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("rcCooccur counts distinct co-baskets above the support floor") {
    val got = Recommender.rcCooccur(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L)), s"got $got")
  }

  test("rcItemsim normalizes by item marginals") {
    val (a, b, nab, na, nb, cos) = Recommender.rcItemsim(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert((a, b, nab, na, nb) == ((1L, 2L, 3L, 3L, 3L)))
    assert(math.abs(cos - 1.0) < 1e-6, s"cosine $cos") // 3/√(3·3)
  }

  test("rcAssoc emits both directions with confidence and lift") {
    val got = Recommender.rcAssoc(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map { case (x, y, n, c, l) => (x, y) -> ((n, c, l)) }.toMap
    // conf(1→2) = 3/3 = 1; lift = 1 / (3/4) = 1.333333 — symmetric here
    assert(got.keySet == Set((1L, 2L), (2L, 1L)))
    got.values.foreach { case (n, c, l) =>
      assert(n == 3L && math.abs(c - 1.0) < 1e-6 && math.abs(l - 1.333333) < 1e-5)
    }
  }

  test("rcGini: popularity [1,3] gives the textbook Gini 0.25") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gini").toString
    // item 10 in baskets 1..3, item 20 in basket 1 only
    Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L))
      .toDF("l_orderkey", "l_partkey").write.parquet(s"$dir/lineitem.parquet")
    val r = graft.operators.Recommender.rcGini(spark, dir).collect().head
    assert(r.getAs[Long]("n_items") == 2L && r.getAs[Long]("total") == 4L)
    assert(r.getAs[Long]("max_c") == 3L)
    // ranks asc: (1,c=1),(2,c=3) → 2·7/(2·4) − 3/2 = 0.25
    assert(r.getAs[Double]("gini") == 0.25)
  }
}
