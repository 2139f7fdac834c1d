package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed-baseline perf gate: re-times one query per operator
  * family at sf0.1 against `bench_baseline.json` and fails on sustained
  * >2× drift (see [[BenchRegression]] for the decision rule and its own
  * unit tests below). Runs warm — one untimed pass absorbs codegen/JIT,
  * matching the Bench methodology the baselines were recorded with.
  */
class BenchRegressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val sfDir = "/root/testdata/sf0.1"

  /** One per family; cheap-to-moderate members so the spec stays ~1 min. */
  val slice: Seq[String] = Seq(
    "tpch_q6",          // TPC-H scan-aggregate
    "a1_count_by_type", // hypermap aggregation
    "q1_page",          // pagination
    "w2_running_sum",   // window
    "u1_union",         // set ops
    "u4_intersect_all", // bag set ops — r9 flagged ~2.2× drift in this class
    "w6_prefix_sum",    // two-level prefix sum — same r9 drift class
    "e1_first_per_key", // entries fold
    "dd_simhash",       // dedup
    "tx_quality",       // text analysis
    "ann_ivf_assign",   // similarity
    "sp_weighted",      // sampling
    "ev_retention",     // event analytics
    "gr_degdist",       // graph
    "sk_hll_est",       // sketches
    "sw_skew_report",   // skew
    "pl_corpus_clean",  // pipeline
    "pii_scrub",        // privacy
    "ly_zorder",        // layout
    "ix_bm25",          // retrieval
    "dq_rules",         // audit
    "ts_ewma",          // time series
    "st_ttest",         // stats
    "rc_cooccur",       // recommender
    "geo_cell_stats",   // geo
  )

  test("representative slice stays within 2x of the committed sf0.1 medians") {
    val baseline = BenchRegression.loadBaseline()
    val missing = slice.filterNot(baseline.contains)
    assert(missing.isEmpty, s"no committed baseline for: $missing")
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    slice.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm: codegen + JIT + parquet footers
      def pass(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val (ok, best) = BenchRegression.withinBudget(baseline(name), pass _)
      if (!ok) failures += f"$name: best $best%.3f s vs budget ${BenchRegression.budget(baseline(name))}%.3f s (baseline ${baseline(name)}%.3f s)"
    }
    assert(failures.isEmpty,
      "sustained perf regressions (slow on every confirm pass):\n" + failures.mkString("\n"))
  }

  test("the trip-wire flags a sustained 10x slowdown") {
    // a deliberate always-slow timer must fail even after confirm passes —
    // the 'inject Thread.sleep into one query' drill, unit-tested instead
    // of committed
    val (ok, best) = BenchRegression.withinBudget(0.5, () => 5.0)
    assert(!ok && best == 5.0)
  }

  test("the trip-wire absorbs a one-off GC pause (slow first pass, clean confirms)") {
    val times = Iterator(5.0, 0.45, 0.45)
    val (ok, _) = BenchRegression.withinBudget(0.5, () => times.next())
    assert(ok, "a single slow pass with at-baseline confirms must not flag")
  }

  test("budget keeps an absolute floor so sub-100ms queries don't trip on jitter") {
    assert(BenchRegression.budget(0.05) == 0.5)
    assert(BenchRegression.budget(2.0) == 4.4)
  }

  test("a warmup-phase failure is ledgered with the gate's name, recovery " +
       "still runs, and a clean pass stays silent") {
    // r17 verdict nit: the warmup pass swallowed every throwable, so a
    // gate wounded ONLY under warmup conditions was invisible and
    // unattributable. The deliberately-failing gate must appear in the
    // ledger by name (and be reported to the caller for the detail
    // JSON's warmup_errors field).
    val ledger = scala.collection.mutable.ArrayBuffer.empty[String]
    var recovered = false
    val err = Bench.warmupPass("geo_kaboom",
      () => throw new IllegalStateException("boom"),
      ledger += _, () => { recovered = true })
    assert(err.contains("IllegalStateException"))
    assert(recovered, "session recovery must still run on a warmup failure")
    assert(ledger.exists(l => l.contains("warmup-err") && l.contains("geo_kaboom")),
      s"failing gate name missing from the ledger: $ledger")
    val ok = Bench.warmupPass("geo_fine", () => (), ledger += _, () => fail("no recovery on success"))
    assert(ok.isEmpty && !ledger.exists(_.contains("geo_fine")))
  }
}
