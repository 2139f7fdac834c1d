package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for materialized artifacts — decoded fixture
  * frames, CC label tables, PQ code indexes. One idiom, one place:
  * entries whose SparkContext has stopped are evicted on every access,
  * so a dead session (and its cached/checkpointed blocks) is never
  * pinned for the JVM lifetime.
  */
final class SessionCache[K] {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, K), DataFrame]()

  def getOrCompute(s: SparkSession, k: K)(build: => DataFrame): DataFrame = {
    m.keySet.removeIf(e => e._1.sparkContext.isStopped)
    m.computeIfAbsent((s, k), _ => build)
  }
}
