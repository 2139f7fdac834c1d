package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the time-series gates on planted series: EWMA matches the
  * sequential recursion, ACF finds a planted weekly period, decomposition
  * attributes the spike to its day-of-week, CUSUM peaks at a level shift.
  */
class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Write a corpus whose daily counts follow `counts` starting 2024-05-01. */
  private def corpus(counts: Seq[Int]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts").toString
    val rows = for {
      (c, d) <- counts.zipWithIndex
      i <- 0 until c
    } yield ((d * 1000 + i).toLong,
      java.sql.Timestamp.valueOf(f"2024-05-${d + 1}%02d 12:00:00"))
    rows.toDF("event_id", "ts").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  // 28 days, level 5 with a +10 spike every 7th day (indices 0,7,14,21)
  lazy val weekly: String =
    corpus((0 until 28).map(d => 5 + (if (d % 7 == 0) 10 else 0)))
  // 15 days at 10, then 15 days at 30 — a clean level shift
  lazy val shifted: String =
    corpus(Seq.fill(15)(10) ++ Seq.fill(15)(30))

  test("tsEwma closed form matches the sequential recursion") {
    val got = TimeSeries.tsEwma(spark, weekly)
      .select($"n", $"ewma").as[(Long, Double)].collect()
    var y = got.head._1.toDouble
    got.zipWithIndex.foreach { case ((x, e), i) =>
      if (i > 0) y = 0.3 * x + 0.7 * y
      assert(math.abs(e - y) < 1e-4, s"day $i: closed $e vs recursive $y")
    }
  }

  test("tsHolt closed form matches the sequential Brown recursion") {
    val got = TimeSeries.tsHolt(spark, weekly)
      .select($"n", $"level", $"trend", $"forecast")
      .as[(Long, Double, Double, Double)].collect()
    var s1 = got.head._1.toDouble
    var s2 = s1
    got.zipWithIndex.foreach { case ((x, lv, tr, fc), i) =>
      if (i > 0) { s1 = 0.3 * x + 0.7 * s1; s2 = 0.3 * s1 + 0.7 * s2 }
      val (el, et) = (2 * s1 - s2, 0.3 / 0.7 * (s1 - s2))
      assert(math.abs(lv - el) < 1e-4, s"day $i level: $lv vs $el")
      assert(math.abs(tr - et) < 1e-4, s"day $i trend: $tr vs $et")
      assert(math.abs(fc - (el + et)) < 1e-4, s"day $i forecast")
    }
  }

  test("tsHolt locks onto a linear ramp: trend → slope, forecast → next value") {
    val ramp = corpus((0 until 30).map(d => 10 + 2 * d))
    val last = TimeSeries.tsHolt(spark, ramp)
      .orderBy($"day").select($"trend", $"forecast")
      .as[(Double, Double)].collect().last
    // After 30 days of a +2/day ramp the trend estimate is ≈2 and the
    // one-step forecast ≈ the unobserved day-30 value 10+2·30 = 70.
    assert(math.abs(last._1 - 2.0) < 0.05, s"trend ${last._1}")
    assert(math.abs(last._2 - 70.0) < 0.5, s"forecast ${last._2}")
  }

  test("tsAcf peaks at the planted weekly lag") {
    val acf = TimeSeries.tsAcf(spark, weekly)
      .select($"lag", $"acf").as[(Int, Double)].collect().toMap
    assert(acf(7) > 0.9, s"lag-7 ACF should be ~1 on a period-7 series: $acf")
    (1 to 6).foreach(l =>
      assert(acf(l) < acf(7), s"lag $l (${acf(l)}) must be below lag 7 (${acf(7)})"))
  }

  test("tsDecompose assigns the spike to its day-of-week and NULLs edge trend") {
    val rows = TimeSeries.tsDecompose(spark, weekly)
      .select($"day".cast("string"), $"trend", $"dow", $"seasonal")
      .collect()
    // centered 7-day MA undefined on the first/last 3 days
    val nullTrend = rows.filter(_.isNullAt(1)).map(_.getString(0)).toSet
    assert(nullTrend == Set("2024-05-01", "2024-05-02", "2024-05-03",
      "2024-05-26", "2024-05-27", "2024-05-28"), s"got $nullTrend")
    // 2024-05-01 is a Wednesday (dow=2, Monday-based): the spike day-of-week
    val seasonal = rows.map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(seasonal(2L) > 7.0, s"spike dow should carry ~+8.6 seasonal: $seasonal")
    assert(seasonal.filter(_._1 != 2L).values.forall(_ < 0.0),
      s"non-spike dows sit below trend: $seasonal")
  }

  test("tsCusum peaks exactly at the planted level shift") {
    val rows = TimeSeries.tsCusum(spark, shifted)
      .select($"day".cast("string"), $"cusum", $"is_changepoint")
      .as[(String, Double, Boolean)].collect()
    val flagged = rows.filter(_._3).map(_._1)
    assert(flagged.toSeq == Seq("2024-05-15"),
      s"changepoint should be the last pre-shift day: ${flagged.toSeq}")
    // CUSUM of a below-mean prefix is monotonically decreasing to the peak
    val toPeak = rows.takeWhile(!_._3).map(_._2)
    assert(toPeak.zip(toPeak.tail).forall { case (a, b) => b < a },
      s"prefix must fall monotonically: ${toPeak.toSeq}")
  }

  test("tsPeriodogram peaks at a planted 3-day cycle") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pgram").toString
    import spark.implicits._
    // 12 days: counts 9,1,1,9,1,1,... -> strongest power at p=3
    val rows = for {
      day <- 0 until 12
      n = if (day % 3 == 0) 9 else 1
      k <- 0 until n
    } yield ((day * 100 + k).toLong,
      java.sql.Timestamp.valueOf(f"2024-03-${day + 1}%02d 12:00:00"))
    rows.toDF("event_id", "ts").write.parquet(s"$dir/events.parquet")
    val out = TimeSeries.tsPeriodogram(spark, dir).collect()
      .map(r => r.getAs[Long]("p") -> r.getAs[Double]("power")).toMap
    val best = out.maxBy(_._2)._1
    assert(best == 3L, s"expected peak at p=3, got $best: $out")
    // the planted cycle should dominate the non-harmonic periods clearly
    assert(out(3L) > 5.0 * out(5L), s"p3=${out(3L)} p5=${out(5L)}")
  }
}
