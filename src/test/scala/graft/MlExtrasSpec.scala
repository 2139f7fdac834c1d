package graft

import graft.operators.{Similarity, Temporal, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 ML/engagement extras: streaks, PCA, calibration. */
class MlExtrasSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("evStreak finds the longest run across gaps") {
    val dir = java.nio.file.Files.createTempDirectory("graft-streak").toString
    // user 1: days 1,2,3, 5,6 → longest 3, active 5; user 2: day 10 → 1,1
    val rows = Seq((1L, 1), (1L, 2), (1L, 3), (1L, 5), (1L, 6), (2L, 10))
      .zipWithIndex.map { case ((u, day), i) =>
        (i.toLong, u, java.sql.Timestamp.valueOf(f"2024-06-$day%02d 09:00:00")) }
    rows.toDF("event_id", "user_id", "ts").write.parquet(s"$dir/events.parquet")
    val full = Temporal.evStreak(spark, dir)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(full == Map(1L -> ((3L, 5L)), 2L -> ((1L, 1L))), s"got $full")
  }

  test("pcaTopComponent's projection carries at least the max single-dim variance") {
    val sf = "/root/testdata/sf0.001"
    val (vec, proj) = Similarity.pcaTopComponent(spark, sf)
    assert(math.abs(vec.map(x => x * x).sum - 1.0) < 1e-6, "eigvec must be unit norm")
    val pv = proj.agg(
      (sum($"pc1" * $"pc1") / count(lit(1)) -
        (sum($"pc1") / count(lit(1))) * (sum($"pc1") / count(lit(1)))).as("v"))
      .as[Double].collect().head
    val covDiag = Similarity.pcaCov(spark, sf)
      .where($"dim_i" === $"dim_j").select($"cov").as[Double].collect()
    assert(covDiag.forall(_ <= pv + 1e-6),
      s"projection variance $pv must dominate single dims ${covDiag.toSeq}")
  }

  test("tx_clf_calib emits 10 decile bins with weakly increasing mean_pred") {
    val bins = TextAnalysis.clfCalib(spark, "/root/testdata/sf0.001")
      .select($"bin", $"mean_pred").as[(Long, Double)].collect().sortBy(_._1)
    assert(bins.map(_._1).toSeq == (1L to 10L), s"got ${bins.map(_._1).toSeq}")
    assert(bins.zip(bins.tail).forall { case ((_, a), (_, b)) => b >= a - 1e-9 },
      s"decile means must be non-decreasing: ${bins.toSeq}")
  }
}
