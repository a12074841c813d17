package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operators via
  * `KeyValueGroupedDataset.flatMapGroupsWithState` (SURVEY §1.3's
  * streaming tier; the state-shape Spark's built-in windows can't
  * express).
  *
  * Scale notes: state lives in the state store, partitioned by key —
  * the operator scales with distinct keys, not events. UNBOUNDED key
  * domains need a timeout (`ttl`) or the store grows forever; the
  * default here keeps state until the watermark-driven event-time
  * timeout fires, which is the streaming analogue of "dedup within a
  * horizon".
  */
object Stateful {

  /** Streaming first-occurrence dedup: emit the first element seen per
    * key, drop every later one. With `ttlMs > 0`, a key's memory
    * expires `ttlMs` after the FIRST occurrence's processing time —
    * the window is fixed, duplicates do not slide it, and anything
    * arriving after it is treated as fresh (bounded-state dedup).
    * Batch twin: Dedup.exactDedup keyed on the same column (arrival
    * order vs min-id representative is the one declared divergence). */
  /** The state-transition function behind [[firstSeen]], exposed so a
    * spec can drive it through `TestGroupState` deterministically
    * (processing-time timeouts are untestable through a real stream
    * without wall-clock races). */
  private[streaming] def firstSeenFunc[K, V](
      ttlMs: Long): (K, Iterator[V], GroupState[Long]) => Iterator[V] =
    (_: K, rows: Iterator[V], state: GroupState[Long]) =>
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else if (state.exists) {
        if (ttlMs > 0) {
          // The TTL is FIXED from first sight — duplicates do not
          // slide it. Spark clears a pending timeout whenever the
          // function runs for a key with new data, so re-arm with the
          // REMAINING time (first-seen + ttl - now), and if that
          // already elapsed (timeout hadn't fired yet), treat this
          // arrival as fresh.
          val now = state.getCurrentProcessingTimeMs()
          val remaining = state.get + ttlMs - now
          if (remaining <= 0) {
            state.update(now)
            state.setTimeoutDuration(ttlMs)
            rows.take(1)
          } else {
            state.setTimeoutDuration(remaining)
            Iterator.empty
          }
        } else Iterator.empty
      } else {
        state.update(if (ttlMs > 0) state.getCurrentProcessingTimeMs() else 0L)
        if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
        // rows of ONE micro-batch for a new key: keep the first
        rows.take(1)
      }

  def firstSeen[K: Encoder, V: Encoder](
      ds: Dataset[V], key: V => K,
      ttlMs: Long = 0L)(implicit tup: Encoder[(K, V)]): Dataset[V] = {
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(key)
      .flatMapGroupsWithState[Long, V](OutputMode.Append, timeout)(
        firstSeenFunc[K, V](ttlMs))
  }

  /** Event-time-bounded streaming dedup via the engine-native
    * `dropDuplicatesWithinWatermark`: a duplicate of `keys` is dropped
    * while its first occurrence is younger than the watermark `delay`;
    * once the watermark passes `first.ts + delay` the key's state is
    * EVICTED and a later duplicate passes as fresh. This is the
    * horizon-dedup shape for unbounded key domains where
    * [[firstSeen]]'s processing-time TTL is the wrong clock (late
    * replays must dedup by EVENT time, not arrival time). State per
    * partition ≈ keys arriving within one watermark window. */
  def dedupWithinWatermark(
      df: DataFrame, keys: Seq[String], tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)

  /** Streaming per-key running counter with custom state — the
    * mapGroupsWithState shape (one output row per key per batch). */
  def runningCount[K: Encoder, V: Encoder](
      ds: Dataset[V], key: V => K)(implicit tup: Encoder[(K, Long)]): Dataset[(K, Long)] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(key)
      .mapGroupsWithState[Long, (K, Long)](GroupStateTimeout.NoTimeout) {
        (k: K, rows: Iterator[V], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (k, n)
      }
  }
}
