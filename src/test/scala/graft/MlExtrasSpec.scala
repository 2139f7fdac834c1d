package graft

import graft.operators.{Learn, Multimodal, Similarity, Temporal, TextAnalysis, TimeSeries}
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

  test("kppStride is pinned to the oracle SQL literal at every oracle scale, " +
       "with ≥2x corpus-growth margin, and grows K-bounded beyond") {
    // Enforces the Spark-side stride ↔ DuckDB literal coupling (r15
    // advisory): the gate corpora must sit strictly INSIDE the pinned
    // region, not on its edge.
    val sf01Count = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet").count()
    assert(Similarity.KppOracleBound >= 2 * sf01Count,
      s"oracle bound ${Similarity.KppOracleBound} leaves <2x margin over " +
        s"the largest oracle corpus ($sf01Count embeddings)")
    assert(Similarity.kppStride(sf01Count) == Similarity.KppStride)
    assert(Similarity.kppStride(2 * sf01Count) == Similarity.KppStride)
    assert(Similarity.mlKmeansppSql.contains(s"% ${Similarity.KppStride}"),
      "oracle SQL literal drifted from KppStride")
    // beyond the pinned region the seed set is K-bounded (~20 seeds)
    val big = 100L * Similarity.KppOracleBound
    assert(Similarity.kppStride(big) == big / 20)
  }

  test("tx_clf_calib emits 10 decile bins with weakly increasing mean_pred") {
    val bins = TextAnalysis.clfCalib(spark, "/root/testdata/sf0.001")
      .select($"bin", $"mean_pred").as[(Long, Double)].collect().sortBy(_._1)
    assert(bins.map(_._1).toSeq == (1L to 10L), s"got ${bins.map(_._1).toSeq}")
    assert(bins.zip(bins.tail).forall { case ((_, a), (_, b)) => b >= a - 1e-9 },
      s"decile means must be non-decreasing: ${bins.toSeq}")
  }

  test("nbScores reproduces the hand-computed add-one posterior and argmax") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    // train (id%5!=0): doc1 lang a "x x", doc2 lang b "y y"; test doc0 "x"
    Seq((0L, "a", "x"), (1L, "a", "x x"), (2L, "b", "y y"))
      .toDF("doc_id", "lang", "text").write.parquet(s"$dir/documents.parquet")
    val scores = Learn.nbScores(spark, dir).collect()
      .map(r => r.getAs[String]("label") ->
        r.getAs[java.math.BigDecimal]("score").doubleValue).toMap
    // P(x|a) = (2+1)/(2+2), P(x|b) = (0+1)/(2+2); priors both 1/2
    assert(math.abs(scores("a") - (math.log(0.5) + math.log(0.75))) < 1e-6)
    assert(math.abs(scores("b") - (math.log(0.5) + math.log(0.25))) < 1e-6)
    val conf = Learn.nbConfusion(spark, dir)
      .as[(String, String, Long)].collect()
    assert(conf.toSeq == Seq(("a", "a", 1L)))
  }

  test("textrank scores a symmetric 2-token graph uniformly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-trank").toString
    Seq((1L, "alpha beta alpha beta alpha"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.textrank(spark, dir)
      .as[(Long, String, Double)].collect()
    assert(out.map(_._2).sorted.toSeq == Seq("alpha", "beta"))
    assert(out.forall(_._3 == 0.5), s"expected uniform 0.5: ${out.toSeq}")
  }

  test("burstiness: clumped token VMR 4, evenly spread token VMR 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-burst").toString
    // 'even' once per doc (variance 0); 'bursty' 4x in one doc
    Seq((1L, "even bursty bursty bursty bursty"), (2L, "even"),
        (3L, "even"), (4L, "even"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.burstiness(spark, dir)
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    assert(out("even") == ((4L, 4L, 0.0)), s"got $out")
    // Σc²=16, var=(16−4)/3=4, mean=1 → VMR 4
    assert(out("bursty") == ((1L, 4L, 4.0)), s"got $out")
  }

  test("readability counts words/sentences/vowel-group syllables exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-read").toString
    Seq((1L, "the cat runs. the dog sits!")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.readability(spark, dir).collect().head
    assert(r.getAs[Long]("n_words") == 6L && r.getAs[Long]("n_sents") == 2L &&
      r.getAs[Long]("n_syll") == 6L)
    // 206.835 − 1.015·(6/2) − 84.6·(6/6)
    assert(r.getAs[Double]("flesch") == 119.19)
  }

  test("ixSuggest ranks prefix completions by corpus frequency") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sugg").toString
    val text = (Seq.fill(10)("hello") ++ Seq.fill(6)("help") ++
      Seq.fill(5)("hero") ++ Seq.fill(7)("west")).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = operators.Retrieval.ixSuggest(spark, dir)
      .as[(String, Long, String, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(out("he") == Seq("hello", "help", "hero"), s"got $out")
    assert(out("hel") == Seq("hello", "help") && out("her") == Seq("hero"))
    assert(out("we") == Seq("west") && out("wes") == Seq("west"))
  }

  test("evLtv builds running per-member cohort value curves") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ltv").toString
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-05-$day%02d 10:00:00")
    // w1 = week of Mon 2024-05-06, w2 = 2024-05-13.
    // u1: 10.0 in w1, 20.0 in w2; u2: 30.0 in w1; u3 (w2 cohort): 40.0.
    Seq((1L, t(6), 10.0), (1L, t(14), 20.0), (2L, t(8), 30.0), (3L, t(13), 40.0))
      .toDF("user_id", "ts", "value").write.parquet(s"$dir/events.parquet")
    val out = Temporal.evLtv(spark, dir)
      .select($"cohort".cast("string"), $"off", $"cohort_users",
        $"n_active", $"week_value", $"ltv_per_user")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("2024-05-06", 0L, 2L, 2L, 40.0, 20.0),
      ("2024-05-06", 1L, 2L, 1L, 20.0, 30.0),
      ("2024-05-13", 0L, 1L, 1L, 40.0, 40.0)), s"got $out")
  }

  test("evPaths mines preceding-pair conversion paths incl. boundary placeholders") {
    val dir = java.nio.file.Files.createTempDirectory("graft-paths").toString
    Seq((1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
        (2L, 1L, "purchase"))
      .toDF("user_id", "event_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val out = Temporal.evPaths(spark, dir)
      .as[(Long, String, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(out == Map("view>click>purchase" -> 1L, "∅>∅>purchase" -> 1L), s"got $out")
  }

  test("dqFreshness flags a stream that went quiet behind the freshest one") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fresh").toString
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-05-0$day%d 10:00:00")
    Seq(("A", t(5)), ("A", t(1)), ("B", t(3)))
      .toDF("event_type", "ts").write.parquet(s"$dir/events.parquet")
    val out = Temporal.dqFreshness(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("A") == ((0L, false)) && out("B") == ((2L, true)), s"got $out")
  }

  test("evLifecycle decomposes DAU into new/retained/resurrected and books churn days") {
    val dir = java.nio.file.Files.createTempDirectory("graft-life").toString
    // user 1 active d1,d2,d4; user 2 active d2 only (d = 2024-05-0d)
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-05-0$day%d 10:00:00")
    Seq((1L, t(1)), (1L, t(2)), (1L, t(4)), (2L, t(2)))
      .toDF("user_id", "ts").write.parquet(s"$dir/events.parquet")
    val out = Temporal.evLifecycle(spark, dir)
      .select($"day".cast("string"), $"n_new", $"n_retained",
        $"n_resurrected", $"n_churned")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-05-01", 1L, 0L, 0L, 0L),
      ("2024-05-02", 1L, 1L, 0L, 0L),
      ("2024-05-03", 0L, 0L, 0L, 2L),   // churn-only day still gets a row
      ("2024-05-04", 0L, 0L, 1L, 0L)),  // user 1's post-horizon churn clipped
      s"got $out")
  }

  test("mlKnnConfusion classifies clustered held-out vectors onto the diagonal") {
    val dir = java.nio.file.Files.createTempDirectory("graft-knn").toString
    // two clean clusters along the axes; vec 0 and 10 are held out (%10)
    Seq(
      (0L, Seq(1.0f, 0.1f), 0), (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.9f, 0.0f), 0), (3L, Seq(1.0f, 0.05f), 0),
      (10L, Seq(0.1f, 1.0f), 1), (11L, Seq(0.0f, 1.0f), 1),
      (12L, Seq(0.0f, 0.9f), 1), (13L, Seq(0.05f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.mlKnnConfusion(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((0L, 0L, 1L), (1L, 1L, 1L)), s"got $out")
  }

  test("evHeatmap grids counts by weekday x hour with exact shares") {
    val dir = java.nio.file.Files.createTempDirectory("graft-heat").toString
    def t(day: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-05-$day%02d $h%02d:00:00")
    // 2024-05-06 is a Monday (dow 0)
    Seq(t(6, 10), t(6, 10), t(6, 10), t(7, 12)).map(Tuple1(_))
      .toDF("ts").write.parquet(s"$dir/events.parquet")
    val out = Temporal.evHeatmap(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set((0L, 10L, 3L, 0.75), (1L, 12L, 1L, 0.25)), s"got $out")
  }

  test("featureHash matches a JVM-side replay of the md5 bucket/sign arithmetic") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fhash").toString
    Seq((1L, "alpha alpha"), (2L, "alpha beta gamma"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    def hx(tok: String): (Long, Long) = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"fh:$tok".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = (Integer.parseInt(h.substring(0, 2), 16) % 64).toLong
      val sign = if (Integer.parseInt(h.substring(2, 3), 16) % 2 == 0) 1L else -1L
      (bucket, sign)
    }
    def expect(toks: Seq[String]): (Double, Long, Long) = {
      val vec = toks.map(hx).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      // the operator rounds l2 to 6 dp
      (math.rint(math.sqrt(vec.values.map(c => c * c).sum.toDouble) * 1e6) / 1e6,
        vec.getOrElse(7L, 0L), vec.getOrElse(42L, 0L))
    }
    val out = Learn.featureHash(spark, dir)
      .as[(Long, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == expect(Seq("alpha", "alpha")), s"got ${out(1L)}")
    assert(out(2L) == expect(Seq("alpha", "beta", "gamma")), s"got ${out(2L)}")
    // a repeated token doubles its bucket magnitude: l2 of "alpha alpha" = 2
    assert(out(1L)._1 == 2.0)
  }

  test("tsBacktest: on a linear ramp the trend-aware smoother beats persistence") {
    val ramp = corpusTs((0 until 30).map(d => 10 + 2 * d))
    val r = TimeSeries.tsBacktest(spark, ramp).collect().head
    assert(r.getAs[Long]("n_days") == 29L)
    val (h, p) = (r.getAs[Double]("mae_holt"), r.getAs[Double]("mae_persistence"))
    assert(p == 2.0, s"persistence MAE on a +2/day ramp must be 2, got $p")
    assert(h < p && r.getAs[Double]("skill") < 1.0, s"holt $h vs persistence $p")
  }

  /** events corpus whose daily counts follow `counts` from 2024-05-01. */
  private def corpusTs(counts: Seq[Int]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts2").toString
    val rows = for {
      (c, d) <- counts.zipWithIndex
      i <- 0 until c
    } yield ((d * 1000 + i).toLong,
      java.sql.Timestamp.valueOf(f"2024-05-${d + 1}%02d 12:00:00"))
    rows.toDF("event_id", "ts").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  test("zipf fits an exact power law with slope -1 and r2 = 1") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    // freq = 12/rank exactly: a×12 b×6 c×4 d×3 → ln-ln line of slope −1
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.zipf(spark, dir).collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(math.abs(r.getAs[Double]("slope") + 1.0) < 1e-4, s"slope ${r.getAs[Double]("slope")}")
    assert(math.abs(r.getAs[Double]("intercept") - math.log(12.0)) < 1e-4)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-6)
  }

  test("rake ranks a repeated multi-word phrase above a more frequent single word") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rake").toString
    // Phrases per doc: "deep learning model" ×1, "cat" ×3 (stopwords split).
    // deg/freq: deep=learning=model = 6/2 = 3 → phrase score 9; cat = 6/6 = 1.
    val text = "the deep learning model of the cat and the cat and the cat"
    Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.rake(spark, dir)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out == Seq((1L, "deep learning model", 2L, 9.0), (2L, "cat", 6L, 1.0)),
      s"got $out")
  }

  test("targetEncode shrinks category means toward the prior by m=100") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tenc").toString
    (Seq.fill(2)(("A", 10.0)) ++ Seq.fill(2)(("B", 20.0)))
      .toDF("event_type", "value").write.parquet(s"$dir/events.parquet")
    val out = Learn.targetEncode(spark, dir)
      .as[(String, Long, Double, Double)].collect()
      .map { case (t, n, p, e) => t -> ((n, p, e)) }.toMap
    // prior 15; enc_A = (20+1500)/102, enc_B = (40+1500)/102
    assert(out("A") == ((2L, 15.0, 14.901961)), s"got $out")
    assert(out("B") == ((2L, 15.0, 15.098039)), s"got $out")
  }

  test("scaleStats recovers exact per-dim mean and unbiased std") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fsc").toString
    Seq((1L, Seq(0.0f, 1.0f)), (2L, Seq(2.0f, 3.0f)))
      .toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    val out = Learn.scaleStats(spark, dir)
      .as[(Long, Long, Double, Double)].collect()
      .map { case (dim, n, m, sd) => dim -> ((n, m, sd)) }.toMap
    assert(out(0L) == ((2L, 1.0, 1.414214)), s"got $out")
    assert(out(1L) == ((2L, 2.0, 1.414214)), s"got $out")
  }

  test("phash pairs identical payloads at hamming 0 and skips unrelated ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phash").toString
    val base = (1 to 80).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val other = (1 to 80).map(i => ('a' + (i * i * 11 + 3) % 26).toChar).mkString
    Seq((1L, base), (2L, base), (3L, other))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = Multimodal.phash(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.contains((1L, 2L, 0L)), s"identical pair missing: $out")
    assert(out.forall(p => !(p._1 == 1L && p._2 == 3L) || p._3 > 0),
      "unrelated docs must not collide at distance 0")
  }

  test("knScore matches the hand-computed interpolated Kneser-Ney mean log") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kn").toString
    // "x y x y": c2 = {xy:2, yx:1}; c1_x=2 n1f_x=1; c1_y=1 n1f_y=1;
    // N1+(.y)=1, N1+(.x)=1, N1+(..)=2, D=0.75:
    // p(y|x) = (1.25 + .75*.5)/2 = 0.8125; p(x|y) = (0.25 + .375)/1 = 0.625
    // mean ln over positions [xy, yx, xy] = (2 ln .8125 + ln .625)/3
    Seq((1L, "x y x y")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val (id, nb, score) = TextAnalysis.knScore(spark, dir)
      .as[(Long, Long, Double)].collect().head
    val expected = (2 * math.log(0.8125) + math.log(0.625)) / 3
    assert(id == 1L && nb == 3L)
    assert(math.abs(score - expected) < 1e-6, s"got $score want $expected")
  }

  test("mlMmd recovers the exact centroid-shift MMD2 on orthogonal labels") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mmd").toString
    // label 0 at (1,0), label 1 at (0,1): mu_0 - mu_rest = (1,-1) → MMD2 = 2
    Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
        (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.mlMmd(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 2L, 2.0), (1L, 2L, 2.0)), s"got $out")
  }

  test("heaps fits beta = 1 exactly on an all-unique-token corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-heaps").toString
    // every token globally unique → cum vocab == cum tokens at every
    // checkpoint → ln-ln points on y = x: beta 1, logk 0, r2 1. Docs span
    // three checkpoint cells (doc 0 | docs 1-2 | docs 3-6).
    val docs = (0L to 6L).map(i =>
      (i, (0 until (2 + (i % 3).toInt)).map(j => s"t${i}_$j").mkString(" ")))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.heaps(spark, dir).collect().head
    assert(r.getAs[Long]("n") == 3L)
    assert(math.abs(r.getAs[Double]("beta") - 1.0) < 1e-4, s"beta ${r.getAs[Double]("beta")}")
    assert(math.abs(r.getAs[Double]("logk")) < 1e-4)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-6)
  }

  test("mlSilhouette scores perfectly separated labels at 1.0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sil").toString
    // each vector sits ON its own centroid (a = 0) at d2 = 2 from the
    // other centroid (b = 2) → s = (2 - 0)/2 = 1 for every vector
    Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
        (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.mlSilhouette(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 2L, 1.0), (1L, 2L, 1.0)), s"got $out")
  }

  test("novelty credits first occurrences only, in doc_id order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nov").toString
    // doc 1 introduces both of its 3-grams; doc 2 reuses "a b c" and
    // introduces "b c x" → novelty 0.5; doc 3 is all reuse → 0.0
    Seq((1L, "a b c d"), (2L, "a b c x"), (3L, "a b c d"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.novelty(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5), (3L, 2L, 0L, 0.0)),
      s"got $out")
  }

  test("dq_psi matches the hand-computed smoothed PSI on a two-bin split") {
    val dir = java.nio.file.Files.createTempDirectory("graft-psi").toString
    // type A entirely in bin 0, type B entirely in bin 1 → symmetric PSI
    Seq((1L, "A", 10.0), (2L, "A", 10.0), (3L, "B", 30.0), (4L, "B", 30.0))
      .toDF("event_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = operators.Audit.psi(spark, dir)
      .as[(String, Long, Double)].collect()
      .map { case (k, n, p) => k -> ((n, p)) }.toMap
    // pa = (2.5/3, 0.5/3) vs pb = (0.5, 0.5), smoothing +0.5 with B=2 bins
    val expected = BigDecimal((2.5 / 3 - 0.5) * math.log(2.5 / 3 / 0.5) +
      (0.5 / 3 - 0.5) * math.log(0.5 / 3 / 0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Map("A" -> ((2L, expected)), "B" -> ((2L, expected))), s"got $out want $expected")
  }

  test("brandes: path-graph dependencies match the closed form") {
    // path 1-2-3-4-5, source 1: δ(2)=3, δ(3)=2, δ(4)=1, δ(5)=0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val srcs = Seq(1L).toDF("src")
    val bc = operators.Graph.brandes(edges, srcs)
      .as[(Long, Double)].collect().toMap
    assert(bc == Map(2L -> 3.0, 3L -> 2.0, 4L -> 1.0, 5L -> 0.0), s"got $bc")
  }

  test("brandes: diamond splits dependency across the two shortest paths") {
    // 1-2, 1-3, 2-4, 3-4, source 1: σ(4)=2 → δ(2)=δ(3)=1/2·(1+0)=0.5
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("a", "b")
    val srcs = Seq(1L).toDF("src")
    val bc = operators.Graph.brandes(edges, srcs)
      .as[(Long, Double)].collect().toMap
    assert(bc == Map(2L -> 0.5, 3L -> 0.5, 4L -> 0.0), s"got $bc")
  }

  test("stumpSplits picks the perfectly separating boundary with gain = parent Gini") {
    // bin 0: 5 rows all positive; bin 1: 5 rows all negative →
    // split after bin 0, gain = 1 − 2·0.5² − 0 = 0.5
    val bins = (Seq.fill(5)(("f", 0L, 1L)) ++ Seq.fill(5)(("f", 1L, 0L)))
      .toDF("feat", "bin", "y")
    val best = Learn.stumpSplits(bins)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(best.toSeq == Seq(("f", 0L, 5L, 5L, 0.5)), s"got ${best.toSeq}")
  }

  test("rouge reproduces hand-computed clipped bigram P/R/F on a planted pair") {
    // cand (doc 0): bigrams ab,ba,ab,bc → ab:2 ba:1 bc:1 (tc=4)
    // ref  (doc 1): bigrams ab,bc,cd          (tr=3)
    // clipped overlap = min(2,1)+min(1,0)+min(1,1) = 2 →
    // P=0.5, R=2/3, F=2·2/(4+3)
    val dir = java.nio.file.Files.createTempDirectory("graft-rouge").toString
    Seq((0L, "a b a b c"), (1L, "a b c d"), (2L, "solo"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.rouge(spark, dir)
      .select($"pair", $"overlap", $"tc", $"tr", $"rouge_p", $"rouge_r", $"rouge_f")
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().toList
    // pair 1 (doc 2 alone, < 2 tokens on one side) must be absent entirely
    assert(out == List((0L, 2L, 4L, 3L, 0.5, 0.666667, 0.571429)), s"got $out")
  }

  test("quantileNorm maps two shifted uniform sources onto their rank-wise average") {
    // 16 values per source (B=16 → every bucket exactly one row):
    // src a = 1..16, src b = 101..116 → bucket k holds (k+1, k+101),
    // so norm_mean(k) = k + 51 exactly, raw means are the values.
    val dir = java.nio.file.Files.createTempDirectory("graft-qnorm").toString
    ((1L to 16L).map(("a", _)) ++ (101L to 116L).map(("b", _)))
      .toDF("source", "n_chars").write.parquet(s"$dir/documents.parquet")
    val out = Learn.quantileNorm(spark, dir)
      .select($"source", $"bucket", $"bucket_cnt", $"raw_mean", $"norm_mean")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(out.length == 32 && out.forall(_._3 == 1L), s"got ${out.toList}")
    out.foreach { case (src, b, _, raw, norm) =>
      val expRaw = if (src == "a") b + 1.0 else b + 101.0
      assert(raw == expRaw && norm == b + 51.0, s"bucket $b $src: got ($raw, $norm)")
    }
  }

  test("gmmEm separates two planted length modes in one E/M round") {
    // 10 docs at length 100, 10 at 500; shared-σ init puts the logistic
    // midpoint at 300, so the round must land component means near the
    // modes with ~equal weights.
    val dir = java.nio.file.Files.createTempDirectory("graft-gmm").toString
    (0L until 20L).map(i => (i, if (i < 10) 100L else 500L))
      .toDF("doc_id", "n_chars").write.parquet(s"$dir/documents.parquet")
    val out = Learn.gmmEm(spark, dir)
      .as[(Int, Double, Double, Double)].collect().sortBy(_._1)
    val Array((_, w1, m1, _), (_, w2, m2, _)) = out
    assert(math.abs(w1 + w2 - 1.0) < 1e-6, s"weights must sum to 1: $w1 + $w2")
    assert(w1 > 0.45 && w1 < 0.55, s"balanced modes → near-equal weight, got $w1")
    assert(m1 > 100 && m1 < 130, s"component 1 near the low mode, got $m1")
    assert(m2 > 470 && m2 < 500, s"component 2 near the high mode, got $m2")
  }

  test("schemaDrift flags a late-month null flood and value shift, spares stable columns") {
    // slice a (day 1-15): props set, value ~10; slice b (day 16+):
    // props all null (null-rate drift visible in the report) and value
    // ×10 (mean_drift must fire); event_type/user_id stay stable.
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val rows = (0 until 40).map { i =>
      val day = if (i < 20) 1 + i % 10 else 16 + i % 10
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-06-$day%02d 09:00:00"),
        (i % 4).toLong, "click",
        if (i < 20) 10.0 + i % 3 else 100.0 + i % 3,
        if (i < 20) s"p$i" else null)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = operators.Audit.schemaDrift(spark, dir)
      .select($"column_name", $"null_rate_b", $"mean_drift", $"ndv_drift")
      .as[(String, Double, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(out("value")._3 == 1, s"value mean x10 must flag: ${out("value")}")
    assert(out("props")._2 == 1.0, s"props null flood: ${out("props")}")
    assert(out("event_type")._3 == 0 && out("event_type")._4 == 0,
      s"stable column must not flag: ${out("event_type")}")
  }
}
