package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful Structured Streaming operators (§2.7 extensions): explicit
  * per-key state via flatMapGroupsWithState and watermarked windowed
  * aggregation — the two streaming shapes the batch surface can't express.
  *
  * The reference's stream never needs custom state (its per-chunk loop is
  * stateless + idempotent upsert, scan-events.ts:148-300), but a tail that
  * derives SESSIONS (bursts of chain activity per entity) needs a
  * per-key open-session accumulator that survives micro-batches — exactly
  * what GroupState provides. State lives in the checkpointed state store:
  * per-key, partitioned by the grouping key, recovered on restart.
  */
object StatefulOps {

  /** One event in an entity's ordered stream; `ord` is any monotone
    * position (blockNumber, event_id).
    */
  case class Ev(key: Long, ord: Long)

  /** Open-session accumulator carried across micro-batches. */
  case class OpenSession(start: Long, last: Long, n: Long)

  /** A finished session, emitted in append mode. */
  case class ClosedSession(key: Long, start: Long, end: Long, n: Long)

  /** Streaming gap-sessionization: within each key's stream, a gap of
    * more than `gap` ordinals closes the open session and emits it; the
    * open session persists in GroupState across batches. With
    * `idleTimeoutMs` > 0, idle keys flush their open session via a
    * processing-time timeout (otherwise a final-session flush happens
    * only at query teardown — standard append-mode semantics).
    *
    * Scale: state is O(active keys) × O(1) per key; the state store is
    * partitioned by key alongside the shuffle, so this distributes like
    * any keyed aggregation. Batch-side twin: Temporal.sessionize.
    */
  def sessionize(events: Dataset[Ev], gap: Long,
                 idleTimeoutMs: Long = 0L): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.key)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, timeoutConf) {
        (key: Long, evs: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(key, s.start, s.last, s.n))
          } else {
            // Batch arrival order within a group is not ordinal order.
            val sorted = evs.toIndexedSeq.sortBy(_.ord)
            val closed = Seq.newBuilder[ClosedSession]
            var open = state.getOption
            sorted.foreach { e =>
              open = open match {
                case Some(s) if e.ord - s.last > gap =>
                  closed += ClosedSession(key, s.start, s.last, s.n)
                  Some(OpenSession(e.ord, e.ord, 1L))
                case Some(s) =>
                  // A cross-batch late event (ord ≤ last) folds into the
                  // open session; boundaries only ever widen — letting
                  // `last` regress would corrupt later gap decisions.
                  Some(OpenSession(math.min(s.start, e.ord),
                    math.max(s.last, e.ord), s.n + 1L))
                case None =>
                  Some(OpenSession(e.ord, e.ord, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming deduplication with BOUNDED state: drop rows whose `idCols`
    * were already seen, keeping only ids whose event time is within
    * `watermarkDelay` of the stream's watermark — the streaming twin of
    * the batch `dropDuplicates`/anti-join dedup (S5) for sources that
    * can redeliver within a bounded horizon.
    *
    * The reference's at-least-once tail relies on the SINK to absorb
    * redelivery (idempotent upsert by event id, extract-events.ts:108-116);
    * this dedups in-flight instead, so a non-idempotent sink (append-only
    * files, a message bus) still sees each id once. Unbounded
    * `dropDuplicates` state grows O(all ids ever) and dies at 100 TB;
    * dropDuplicatesWithinWatermark evicts ids older than the watermark,
    * so state is O(ids per watermark window) — sized by the redelivery
    * horizon (a chain tail re-scans only recent blocks), not stream
    * lifetime.
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           watermarkDelay: String,
                           idCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Native gap-session aggregation via Spark's `session_window`: counts
    * (or any algebraic agg) per (key, session), where a session extends
    * while successive events arrive within `gap` of each other and
    * FINALIZES once the watermark passes its close — the declarative
    * twin of [[sessionizeStateful]] for the common count/sum case.
    * Prefer THIS when the per-session result is algebraic: Catalyst
    * plans the merging-session aggregation natively (state store holds
    * open sessions only, sessions merge on overlap, eviction rides the
    * watermark) and the query stays whole-stage-codegen around the
    * stateful operator; reach for flatMapGroupsWithState only when the
    * session carries custom non-algebraic state. Works identically on a
    * batch DataFrame (minus the watermark), which is what the spec's
    * batch-equivalence case exercises.
    */
  def sessionWindowCounts(events: DataFrame, tsCol: String, keyCol: String,
                          gap: String, watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"))

  /** Stream-stream interval join: match rows of two live streams on an
    * equi-key where the right event lands within [left ts, left ts +
    * within] — the ad-attribution / request-response correlation shape.
    * Both sides are watermarked, and the time-range condition is what
    * lets Spark BOUND the join state: a buffered left row is evictable
    * once the watermark passes its ts + within, a right row once the
    * watermark passes its ts, so state is O(events per horizon) per key
    * partition — without the range condition stream-stream join state
    * grows forever. Inner-join matches emit as soon as both sides
    * arrive (cross-batch: the earlier side waits in the state store).
    *
    * Column names must be disjoint across the two inputs (standard
    * stream-stream join requirement — alias before calling).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   watermarkDelay: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"))
  }

  /** One attribute observation in an entity's ordered change stream. */
  case class AttrEv(key: Long, ord: Long, attr: String)

  /** The entity's open (current) SCD2 version, carried across batches. */
  case class OpenVersion(version: Long, attr: String, validFrom: Long, n: Long)

  /** A closed SCD2 version: superseded by the next one at `validTo`. */
  case class ClosedVersion(key: Long, version: Long, attr: String,
                           validFrom: Long, validTo: Long, n: Long)

  /** Streaming SCD2 fold — the streaming twin of `Temporal.scd2History`:
    * each key's attribute change stream folds into versioned
    * [validFrom, validTo) intervals; a version CLOSES (and emits, append
    * mode) the moment a batch shows a different attribute value, while
    * the current version waits in GroupState. A dimension table
    * maintained from a CDC feed gets its history rows this way with
    * per-batch work O(changed keys), instead of re-running the batch
    * gaps-and-islands fold over all history every refresh.
    *
    * Ordering contract: per-key ordinals must not regress across batches
    * (in-batch arrival order is handled by sorting, same as
    * [[sessionize]]); a regressed ordinal would mean an already-emitted
    * validTo was wrong — append mode cannot retract. Feed late-capable
    * sources through a watermark/sort stage first. Attribute equality is
    * null-safe (Scala `==`), matching the batch fold's `<=>`.
    *
    * Scale: state is one OpenVersion per active key, partitioned with
    * the shuffle like any keyed aggregation; emitted rows are exactly
    * the closed versions, so downstream upsert writes O(changes).
    */
  def scd2Fold(events: Dataset[AttrEv]): Dataset[ClosedVersion] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[OpenVersion, ClosedVersion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, evs: Iterator[AttrEv], state: GroupState[OpenVersion]) =>
          val sorted = evs.toIndexedSeq.sortBy(_.ord)
          val closed = Seq.newBuilder[ClosedVersion]
          var open = state.getOption
          sorted.foreach { e =>
            open = open match {
              case Some(v) if v.attr == e.attr =>
                Some(v.copy(n = v.n + 1))
              case Some(v) =>
                closed += ClosedVersion(key, v.version, v.attr, v.validFrom, e.ord, v.n)
                Some(OpenVersion(v.version + 1, e.attr, e.ord, 1L))
              case None =>
                Some(OpenVersion(1L, e.attr, e.ord, 1L))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Watermarked tumbling-window counts per group column: append-mode
    * windowed aggregation that finalizes a window once the watermark
    * passes its end — the bounded-state form of ST4's running counts
    * (which, with only 7 keys, never needed a watermark). Late rows
    * beyond `watermarkDelay` are dropped, state is O(open windows).
    */
  def windowedCounts(events: DataFrame, tsCol: String, groupCol: String,
                     windowDur: String, watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(groupCol))
      .count()
      .select(col("window.start").as("window_start"), col(groupCol), col("count"))
}
