package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for materialized artifacts — decoded fixture
  * frames, CC label tables, PQ code indexes. One idiom, one place:
  * entries whose SparkContext has stopped are evicted on every access,
  * so a dead session (and its cached/checkpointed blocks) is never
  * pinned for the JVM lifetime.
  */
final class SessionCache[K](family: String = "session_cache") {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, K), DataFrame]()

  def getOrCompute(s: SparkSession, k: K)(build: => DataFrame): DataFrame = {
    m.keySet.removeIf(e => e._1.sparkContext.isStopped)
    // Artifacts live for the session; BlockJanitor.sweep must never free
    // their checkpoint blocks (it frees everything unprotected between
    // top-level query builds). Build wall-time lands in ArtifactLedger so
    // the bench can price memoized builds instead of hiding them in the
    // warmup (r18 verdict item 3).
    m.computeIfAbsent((s, k),
      _ => BlockJanitor.protect(ArtifactLedger.timed(family)(build)))
  }
}
