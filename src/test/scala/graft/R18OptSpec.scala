package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 optimization internals, pinned beyond the oracle hash-gates:
  *
  * 1. The long-moment rewrite (dq_corr / st_linreg) rests on one lemma —
  *    for the nonnegative ≤4-dp-rational measures these gates quantize,
  *    `floor(x·10⁴ + 0.5) AS LONG` equals the unscaled integer of
  *    `CAST(x AS DECIMAL(17,4))` — and on the hi/lo split-sum
  *    recombination being exact. Both are asserted here on adversarial
  *    values (2-dp money, integral quantities, derived revenue products
  *    whose double representation is inexact), not just on the fixture.
  * 2. The conv() md5 bucket (pl_dsir / clfFeatures) must equal the
  *    per-hex-digit arithmetic it replaced, for any token.
  * 3. tpch_q21's window form must keep the plan properties that motivated
  *    it: ONE lineitem scan and no Expand.
  */
class R18OptSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("floor(x*1e4+0.5) long == decimal(17,4) unscaled for gate-domain values") {
    // 2-dp money, integral quantities, 2-dp rates, and revenue-style
    // products p·(1−δ) (exact 4-dp rationals stored as inexact doubles)
    val base = Seq(0.0, 0.01, 0.04, 0.99, 1.0, 7.0, 49.99, 901.00,
      104949.50, 0.1 + 0.2 /* 0.30000000000000004 */)
    val prods = for {
      p <- Seq(901.00, 88888.88, 104949.50); dsc <- Seq(0.0, 0.04, 0.1)
    } yield p * (1.0 - dsc)
    val vals = (base ++ prods).toDF("x")
    val cmp = vals.select(
      floor(col("x") * lit(10000.0d) + lit(0.5d)).cast("long").as("viaFloor"),
      (col("x").cast("decimal(17,4)") * lit(10000)).cast("long").as("viaDec"))
      .where(col("viaFloor") =!= col("viaDec"))
    assert(cmp.count() == 0, s"floor-trick mismatch: ${cmp.collect().mkString}")
  }

  test("hi/lo split sums recombine to the exact decimal product sum") {
    // products up to ~1.2e18 (price·price at 4-dp unscale) and enough
    // rows that Σlo crosses 1e9 — the regime the decimal(20,0) casts and
    // the (·10 + lo/1e8) recombination must stay exact in
    val rows = (1 to 5000).map { i =>
      val u = 1000000000L + i.toLong * 171717L // ~1e9-scale unscaled
      (u, u - 7L)
    }
    val df = rows.toDF("ua", "ub")
    val agg = df.agg(
      sum(expr("(ua * ub) div 1000000000L")).as("hi"),
      sum(expr("(ua * ub) % 1000000000L")).as("lo"))
    val got = agg.select(
      (col("hi").cast("decimal(20,0)") * expr("CAST(10 AS DECIMAL(2,0))") +
        col("lo").cast("decimal(20,0)") /
          expr("CAST(100000000 AS DECIMAL(9,0))")).cast("string"))
      .as[String].head()
    val want = rows.map { case (a, b) => BigInt(a) * BigInt(b) }.sum
    assert(BigDecimal(got) * BigDecimal(100000000L) == BigDecimal(want),
      s"recombined $got vs exact ${want}e-8")
  }

  test("conv() md5 bucket == per-hex-digit arithmetic") {
    val toks = Seq("the", "alpha", "", "Zulu9", "été", "a b").toDF("tok")
    def digits(n: Int, mod: Int) = "(" + (1 to n).map(i =>
      s"(instr('0123456789abcdef', substr(md5(tok), $i, 1)) - 1) * ${math.pow(16, n - i).toLong}L")
      .mkString(" + ") + s") % $mod"
    val bad = toks.select(
      expr(s"(CAST(conv(substr(md5(tok), 1, 6), 16, 10) AS BIGINT) % 512)").as("c6"),
      expr(digits(6, 512)).as("d6"),
      expr(s"(CAST(conv(substr(md5(tok), 1, 2), 16, 10) AS BIGINT) % 64)").as("c2"),
      expr(digits(2, 64)).as("d2"))
      .where(col("c6") =!= col("d6") || col("c2") =!= col("d2"))
    assert(bad.count() == 0, s"conv/digit bucket mismatch: ${bad.collect().mkString}")
  }

  test("t5Spans single-stream form == the dense_rank branch-and-rejoin shape") {
    // Adversarial docs: empty text (split → [""]), a one-token doc, a
    // doc whose LAST block truncates inside/before the hash-picked span
    // window, and long docs with many corrupted blocks — the cases where
    // "k = running sentinel count − 1 ≡ dense_rank(b) − 1" could break.
    import org.apache.spark.sql.expressions.Window
    val docs = Seq(
      (0L, ""), (1L, "one"), (2L, (1 to 9).map(i => s"w$i").mkString(" ")),
      (3L, (1 to 64).map(i => s"tok$i").mkString(" ")),
      (4L, (1 to 17).map(i => s"x$i").mkString(" ")),
      (5L, (1 to 200).map(i => s"v$i").mkString(" "))).toDF("doc_id", "text")
    val t = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "tok")))
      .withColumn("b", expr("CAST(floor(p / 8.0) AS BIGINT)"))
      .withColumn("h", md5(concat(lit("t5:"), col("doc_id"), lit(":"), col("b"))))
      .withColumn("off", ascii(substring(col("h"), 1, 1)) % 4)
      .withColumn("len", ascii(substring(col("h"), 2, 1)) % 3 + 1)
      .withColumn("pib", col("p") - col("b") * 8)
      .withColumn("corrupt",
        ascii(substring(col("h"), 3, 1)) % 2 === 0 &&
        col("pib") >= col("off") && col("pib") < col("off") + col("len"))
    val c = t.where(col("corrupt"))
      .withColumn("k",
        dense_rank().over(Window.partitionBy(col("doc_id")).orderBy(col("b"))) - 1)
    val pieces = t.where(!col("corrupt"))
      .select(col("doc_id"), col("p"), col("tok").as("piece"))
      .unionByName(c.where(col("pib") === col("off"))
        .select(col("doc_id"), col("p"),
          concat(lit("<extra_id_"), col("k"), lit(">")).as("piece")))
    val joined = expr(
      "array_join(transform(array_sort(collect_list(struct(p, piece))), x -> x.piece), ' ')")
    val input = pieces.groupBy(col("doc_id")).agg(joined.as("input"))
    val target = c
      .select(col("doc_id"), col("p"), col("k"),
        when(col("pib") === col("off"),
          concat(lit("<extra_id_"), col("k"), lit("> "), col("tok")))
          .otherwise(col("tok")).as("piece"))
      .groupBy(col("doc_id"))
      .agg(joined.as("target"), (max(col("k")) + 1).cast("long").as("n_spans"))
    val old = input.join(target, Seq("doc_id"), "left")
      .select(col("doc_id"), col("input"),
        coalesce(col("target"), lit("")).as("target"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
    // New shape, via the production entry point over a temp parquet dir
    val dir = java.nio.file.Files.createTempDirectory("t5eq").toFile
    try {
      docs.withColumn("source", lit("t"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val neu = operators.TextAnalysis.t5Spans(spark, dir.toString)
      val diff = neu.as("n").join(old.as("o"), Seq("doc_id"), "full")
        .where(col("n.input") =!= col("o.input") ||
          col("n.target") =!= col("o.target") ||
          col("n.n_spans") =!= col("o.n_spans"))
      assert(diff.count() == 0,
        s"t5 single-stream mismatch: ${diff.collect().mkString("\n")}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("pl_decontam: corpus gram stream reaches the broadcast join unshuffled") {
    // AQE off so the executedPlan is a plain inspectable tree
    // (PlanGuardSpec.planWithoutAqe idiom)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try operators.Pipeline.decontam(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "expected a broadcast gram join")
    // the streamed (corpus) side of the gram join must be a straight
    // scan→gram-explode line: the r18 fix moved the distinct above it
    val streamed = bhj.map(j => if (j.buildSide.toString.contains("Right")) j.left else j.right)
    streamed.foreach { s =>
      assert(s.collect { case e: ShuffleExchangeLike => e }.isEmpty,
        s"corpus side shuffles before the broadcast join:\n$s")
    }
  }

  test("brandes saturation early-exit: deep level budget == exact ball depth") {
    // A path graph 1-2-3-4 plus an isolated edge (7,8): from sources
    // {1, 7}, every frontier is empty past depth 3 — a levels budget of
    // 12 must return exactly what levels=4 returns (the early-exit padds
    // empty frames), and both must match Brandes hand-computation:
    // path P4 from source 1 gives delta(2)=2, delta(3)=1.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("a", "b")
    val srcs = Seq(1L, 7L).toDF("src")
    val lo = operators.Graph.brandes(edges, srcs, levels = 4)
      .orderBy(col("node")).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val hi = operators.Graph.brandes(edges, srcs, levels = 12)
      .orderBy(col("node")).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(lo.sameElements(hi), s"levels=12 diverged: ${hi.mkString} vs ${lo.mkString}")
    val m = lo.toMap
    assert(m(2L) == 2.0 && m(3L) == 1.0 && m(8L) == 0.0,
      s"Brandes dependencies wrong: ${lo.mkString(", ")}")
  }

  test("tpch_q21 window form: one lineitem scan, no Expand") {
    val plan = operators.Relational.tpchQ21(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    val leaves = plan.collectLeaves().map(_.toString)
    assert(leaves.count(_.contains("lineitem")) == 1,
      s"expected ONE lineitem scan:\n${leaves.mkString("\n")}")
    assert(plan.collect { case e if e.nodeName == "Expand" => e }.isEmpty,
      "q21 must not plan an Expand")
  }
}
