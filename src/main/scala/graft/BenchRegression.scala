package graft

/** Machine-checked bench-regression gate (round-9 verdict item 1).
  *
  * `bench_baseline.json` holds committed per-query medians (sf0.1,
  * local[32], warm — the Bench methodology). `BenchRegressionSpec` re-times
  * a representative slice and fails on sustained drift past
  * [[BenchRegression.budget]]. With 200+ gate queries, hand-reading PERF.md
  * for "no regressions" stopped scaling; this turns the claim into CI.
  *
  * The decision rule lives here (not in the spec) so the TRIP-WIRE itself
  * is unit-testable: a fake timer returning 10× baseline must flag, and a
  * one-off slow first pass followed by at-baseline confirms must NOT —
  * round 5 proved a single GC/page-cache pause on one pass is
  * indistinguishable from a regression unless slow passes are re-confirmed
  * (PERF.md "regression cluster" post-mortem).
  */
object BenchRegression {

  /** Allowed wall for a query: 2× its committed median, plus a 0.4 s
    * absolute floor so a 0.05 s point lookup doesn't trip on scheduler
    * jitter (2× of 50 ms is inside local[32] noise; 2× of 2 s is not).
    */
  def budget(baselineSec: Double, factor: Double = 2.0, floorSec: Double = 0.4): Double =
    baselineSec * factor + floorSec

  /** Run `timedPass` up to 1 + `confirms` times; the query is within
    * budget if ANY pass lands under it (a genuine regression is slow on
    * every pass; a GC pause is slow on one). Returns (ok, best observed).
    */
  def withinBudget(baselineSec: Double, timedPass: () => Double,
                   confirms: Int = 2): (Boolean, Double) = {
    var best = timedPass()
    var tries = 0
    val b = budget(baselineSec)
    while (best > b && tries < confirms) {
      best = math.min(best, timedPass())
      tries += 1
    }
    (best <= b, best)
  }

  /** Minimal parser for bench_baseline.json's flat {"queries":{"k":v}}
    * shape (no JSON library on the main classpath by design).
    */
  def loadBaseline(path: String = "bench_baseline.json"): Map[String, Double] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val section = text.substring(text.indexOf("\"queries\""))
    "\"([A-Za-z0-9_]+)\"\\s*:\\s*([0-9.eE+-]+)".r
      .findAllMatchIn(section)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toMap
  }
}
