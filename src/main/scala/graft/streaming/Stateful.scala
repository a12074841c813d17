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

  /** Input/output shapes of [[rollingZscore]] — concrete case classes
    * because the state function is imperative per-row logic, the one
    * place typed Datasets beat DataFrames (SURVEY §4.3). */
  case class ZPoint(key: String, seq: Long, value: Double)
  case class ZScore(key: String, seq: Long,
      zscore: Option[Double], isAnomaly: Option[Boolean])

  /** Streaming twin of [[graft.operators.TimeSeries.rollingZscore]]
    * (X81): each value scored against the mean/stddev of its key's `w`
    * strictly-preceding values, with the ring of those values carried
    * in the state store ACROSS micro-batches — the same semantics as
    * the batch window frame [-w, -1] with min_periods=w and the
    * zero-variance guard, scores rounded to 4 dp (Spark ROUND's
    * HALF_UP, so batch and stream agree bit-for-bit; the parity spec
    * pins it across a mid-key batch split).
    *
    * State per key is exactly `w` doubles — bounded regardless of
    * stream length; keys scale with the state store's partitioning.
    * Rows within a micro-batch are processed in `seq` order (the
    * iterator order of a shuffled group is not otherwise defined).
    */
  def rollingZscore(
      ds: Dataset[ZPoint], w: Int, threshold: Double = 2.0)
    : Dataset[ZScore] = {
    require(w >= 2, s"window must be >= 2 for a sample stddev, got $w")
    implicit val stateEnc: Encoder[List[Double]] =
      Encoders.kryo[List[Double]]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val outEnc: Encoder[ZScore] = Encoders.product[ZScore]
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[List[Double], ZScore](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[ZPoint], state: GroupState[List[Double]]) =>
          var ring = state.getOption.getOrElse(List.empty[Double])
          val out = rows.toSeq.sortBy(_.seq).map { p =>
            val z =
              if (ring.length == w) {
                val mean = ring.sum / w
                val sd = math.sqrt(
                  ring.map(x => (x - mean) * (x - mean)).sum / (w - 1))
                if (sd > 0)
                  Some(BigDecimal((p.value - mean) / sd)
                    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
                else None
              } else None
            ring = (ring :+ p.value).takeRight(w)
            ZScore(p.key, p.seq, z, z.map(v => math.abs(v) > threshold))
          }
          state.update(ring)
          out.iterator
      }
  }

  /** Input/output/state shapes of [[crostonForecast]]. */
  case class Demand(key: String, day: Int, value: Double)
  case class CrostonState(n: Long, lastDay: Int, zHat: Double, aHat: Double)
  case class CrostonOut(key: String, n_demands: Long,
      z_hat: Double, a_hat: Option[Double],
      croston: Option[Double], sba: Option[Double])

  /** Streaming twin of [[graft.operators.Forecast.crostonForecast]]:
    * the SES recursions run LITERALLY, one O(1) state update per
    * demand arrival — `s ← α·y + (1−α)·s` for sizes and for
    * inter-demand intervals — with per-key state of four numbers
    * carried across micro-batches. The batch operator evaluates the
    * SAME recursion in closed form (a weighted window sum); with the
    * default α = 0.5 every intermediate is a dyadic rational, so
    * stream and batch agree EXACTLY, not just to rounding — the
    * parity spec pins bit-equality across a mid-key batch split.
    * Output mode Update: each batch emits the latest forecast per
    * touched key. Rows within a batch apply in `day` order; a row at
    * or before the key's last seen day is ignored (late replay). */
  def crostonForecast(
      ds: Dataset[Demand], alpha: Double = 0.5): Dataset[CrostonOut] = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    implicit val stateEnc: Encoder[CrostonState] =
      Encoders.product[CrostonState]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val outEnc: Encoder[CrostonOut] = Encoders.product[CrostonOut]
    ds.groupByKey(_.key)
      .mapGroupsWithState[CrostonState, CrostonOut](
        GroupStateTimeout.NoTimeout) {
        (k: String, rows: Iterator[Demand], state: GroupState[CrostonState]) =>
          var s = state.getOption.getOrElse(CrostonState(0L, 0, 0.0, 0.0))
          rows.toSeq.sortBy(_.day).foreach { d =>
            if (s.n == 0L)
              s = CrostonState(1L, d.day, d.value, 0.0)
            else if (d.day > s.lastDay) {
              val iv = (d.day - s.lastDay).toDouble
              val a = if (s.n == 1L) iv else alpha * iv + (1 - alpha) * s.aHat
              s = CrostonState(s.n + 1, d.day,
                alpha * d.value + (1 - alpha) * s.zHat, a)
            } // else: at-or-before lastDay — late replay, ignored
          }
          state.update(s)
          val aOpt = if (s.n >= 2) Some(s.aHat) else None
          CrostonOut(k, s.n, s.zHat, aOpt,
            aOpt.map(a => s.zHat / a),
            aOpt.map(a => (1 - alpha / 2) * s.zHat / a))
      }
  }

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

  /** Input/output/state shapes of [[decayedCounts]]. */
  case class DecayEvent(key: String, tUs: Long, id: Long)
  case class DecayState(lastTUs: Long, c: Double)
  case class DecayOut(key: String, tUs: Long, id: Long,
      decayed_count: Double)

  /** X125's production path — streaming time-decayed counts: per
    * arrival, `c ← c·2^(−Δ/halfLife) + 1`, ONE O(1) state update (two
    * doubles per key carried across micro-batches) where the batch
    * twin [[graft.operators.TimeSeries.decayedCounts]] re-evaluates a
    * per-user pair join. Same recursion-vs-closed-form relationship as
    * Croston: when every inter-event gap is a multiple of the
    * half-life, all intermediates are dyadic rationals and stream ≡
    * batch EXACTLY (StatefulSpec pins it across a mid-key batch
    * split); on arbitrary gaps they agree to float precision.
    */
  def decayedCounts(ds: Dataset[DecayEvent], halfLifeSeconds: Long)
    : Dataset[DecayOut] = {
    require(halfLifeSeconds > 0, "halfLifeSeconds must be positive")
    val h = halfLifeSeconds * 1000000.0d
    implicit val stateEnc: Encoder[DecayState] = Encoders.product[DecayState]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val outEnc: Encoder[DecayOut] = Encoders.product[DecayOut]
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[DecayState, DecayOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[DecayEvent],
            state: GroupState[DecayState]) =>
          var s = state.getOption.getOrElse(DecayState(Long.MinValue, 0.0))
          val out = rows.toSeq.sortBy(r => (r.tUs, r.id)).map { ev =>
            val c =
              if (s.lastTUs == Long.MinValue) 1.0
              else s.c * math.pow(0.5, (ev.tUs - s.lastTUs) / h) + 1.0
            s = DecayState(ev.tUs, c)
            DecayOut(ev.key, ev.tUs, ev.id,
              BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP)
                .toDouble)
          }
          state.update(s)
          out.iterator
      }
  }

  /** Input/output/state shapes of [[cusumDrift]]. */
  case class CusumPoint(key: String, seq: Long, value: Double)
  case class CusumState(sp: Double, sm: Double, mp: Double, mm: Double)
  case class CusumOut(key: String, seq: Long,
      cusum_up: Double, cusum_down: Double, drift: Boolean)

  /** Streaming twin of [[graft.operators.TimeSeries.cusumDrift]]: the
    * same max-clipped recursions run LITERALLY, one O(1) state update
    * per arrival, against a FROZEN baseline (μ, σ) — the production
    * shape: the baseline comes from a reference window (or the batch
    * operator's own mean/sd output) and ships like any model
    * artifact, while the detector watches the live stream. Per-key
    * state is four doubles; each event emits its current excursions
    * and the armed flag `max(S⁺, S⁻) > hSigma·σ`.
    *
    * Parity: feeding the batch fixture in order with the batch's own
    * (μ, σ) reproduces the batch max-CUSUM exactly — same fold, same
    * doubles (spec-pinned). Rows within a batch apply in `seq` order.
    */
  def cusumDrift(
      ds: Dataset[CusumPoint], mean: Double, sd: Double,
      kSigma: Double = 0.5, hSigma: Double = 4.0): Dataset[CusumOut] = {
    require(kSigma >= 0 && hSigma > 0, s"bad CUSUM params: $kSigma, $hSigma")
    implicit val stateEnc: Encoder[CusumState] = Encoders.product[CusumState]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val outEnc: Encoder[CusumOut] = Encoders.product[CusumOut]
    val k = kSigma * sd
    val h = hSigma * sd
    // the batch operator compares BOTH sides through DECIMAL(18,8) →
    // round(…, 4) HALF_UP; mirroring that staged rounding here keeps
    // the armed flag identical at a rounding boundary (r13 ADVICE —
    // the unrounded compare could disagree with batch despite the
    // documented exact-parity claim)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val h4 = r4(h)
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[CusumPoint],
            state: GroupState[CusumState]) =>
          var s = state.getOption.getOrElse(CusumState(0.0, 0.0, 0.0, 0.0))
          val out = rows.toSeq.sortBy(_.seq).map { p =>
            val sp = math.max(0.0, s.sp + (p.value - mean - k))
            val sm = math.max(0.0, s.sm + (mean - k - p.value))
            s = CusumState(sp, sm, math.max(s.mp, sp), math.max(s.mm, sm))
            CusumOut(p.key, p.seq,
              BigDecimal(sp).setScale(4, BigDecimal.RoundingMode.HALF_UP)
                .toDouble,
              BigDecimal(sm).setScale(4, BigDecimal.RoundingMode.HALF_UP)
                .toDouble,
              r4(math.max(s.mp, s.mm)) > h4)
          }
          state.update(s)
          out.iterator
      }
  }

  /** Input/output/state shapes of [[ewmaChart]]. */
  case class EwmaPoint(key: String, seq: Long, value: Double)
  case class EwmaState(z: Double, nViol: Long, firstViol: Long, t: Long)
  case class EwmaOut(key: String, seq: Long, ewma: Double,
      violation: Boolean)

  /** Streaming twin of [[graft.operators.TimeSeries.ewmaChart]]
    * (x225): the EWMA recursion `z ← λ·y + (1−λ)·z` run LITERALLY
    * against a FROZEN (μ, σ) baseline — the SPC production shape: the
    * baseline ships from a reference window (or the batch operator's
    * own mean/sd output) and the detector flags each arrival against
    * the steady-state limits `μ ± L·σ·√(λ/(2−λ))` as it lands. Per-key
    * state is two doubles + two counters, O(1) per arrival.
    *
    * Parity: feeding the batch fixture in order with the batch's own
    * (μ, σ) reproduces the batch fold exactly — the z chain is pure
    * double arithmetic over identical operands, and the violation
    * compare is unrounded on BOTH sides (the batch fold compares raw
    * doubles; only display values round), so the flags agree bit-for-
    * bit (spec-pinned across a mid-key micro-batch split). Rows
    * within a batch apply in `seq` order.
    */
  def ewmaChart(
      ds: Dataset[EwmaPoint], mean: Double, sd: Double,
      lambda: Double = 0.2, lSigma: Double = 3.0): Dataset[EwmaOut] = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1): $lambda")
    require(lSigma > 0, s"lSigma must be positive: $lSigma")
    implicit val stateEnc: Encoder[EwmaState] = Encoders.product[EwmaState]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val outEnc: Encoder[EwmaOut] = Encoders.product[EwmaOut]
    val beta = 1.0 - lambda
    val lim = lSigma * math.sqrt(lambda / (2.0 - lambda))
    val ucl = mean + lim * sd
    val lcl = mean - lim * sd
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[EwmaPoint],
            state: GroupState[EwmaState]) =>
          var s = state.getOption.getOrElse(EwmaState(mean, 0L, 0L, 1L))
          val out = rows.toSeq.sortBy(_.seq).map { p =>
            val z = lambda * p.value + beta * s.z
            val viol = z > ucl || z < lcl
            s = EwmaState(z,
              s.nViol + (if (viol) 1L else 0L),
              if (s.firstViol > 0) s.firstViol
              else if (viol) s.t else 0L,
              s.t + 1L)
            EwmaOut(p.key, p.seq,
              BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP)
                .toDouble,
              viol)
          }
          state.update(s)
          out.iterator
      }
  }

  /** Input/output/state shapes of [[conversionLatency]]. */
  case class ConvEvent(user: String, tsMicros: Long, eventType: String)
  case class ConvState(hasFrom: Boolean, firstFrom: Long, converted: Boolean)
  case class ConvOut(user: String, from_micros: Long, to_micros: Long,
      latency_seconds: Double)

  /** Streaming twin of [[graft.operators.TimeSeries.conversionLatency]]
    * (x217): each user's conversion latency — first `toType` event at
    * or after their first `fromType` event — emitted AS IT HAPPENS,
    * one row per converting user, O(1) state per key (two longs + two
    * flags). The batch operator's p50/p90 profile is then a rollup
    * over these emissions; a live pipeline gets each latency
    * immediately instead of waiting for the batch window to close.
    *
    * Semantics mirror the batch operator: only the FIRST from-event
    * anchors (an earlier from arriving before conversion re-anchors —
    * harmless for in-order feeds, closer-to-batch for slightly late
    * ones), only the first qualifying to-event converts, and a
    * to-event before any from-event is ignored. After conversion the
    * key is frozen (state kept to suppress re-emission). The latency
    * math is the batch expression verbatim: (µs difference as one
    * double) / 10⁶.
    *
    * Parity: feeding the batch fixture in event-time order — across
    * ANY micro-batch split, including mid-key — yields exactly the
    * per-user latencies whose exact-quantile profile equals the batch
    * output (spec-pinned). Rows within a batch apply in tsMicros
    * order. Late data that would re-anchor an ALREADY-CONVERTED user
    * is the one declared divergence (a stream cannot retract an
    * emitted conversion; the batch twin re-runs and re-anchors).
    */
  def conversionLatency(
      ds: Dataset[ConvEvent], fromType: String,
      toType: String): Dataset[ConvOut] = {
    implicit val stateEnc: Encoder[ConvState] = Encoders.product[ConvState]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val outEnc: Encoder[ConvOut] = Encoders.product[ConvOut]
    ds.groupByKey(_.user)
      .flatMapGroupsWithState[ConvState, ConvOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: String, rows: Iterator[ConvEvent],
            state: GroupState[ConvState]) =>
          var s = state.getOption.getOrElse(ConvState(false, 0L, false))
          val out = scala.collection.mutable.ListBuffer.empty[ConvOut]
          rows.toSeq.sortBy(_.tsMicros).foreach { e =>
            if (!s.converted) {
              if (e.eventType == fromType &&
                  (!s.hasFrom || e.tsMicros < s.firstFrom))
                s = ConvState(hasFrom = true, e.tsMicros, converted = false)
              else if (e.eventType == toType && s.hasFrom &&
                  e.tsMicros >= s.firstFrom) {
                out += ConvOut(user, s.firstFrom, e.tsMicros,
                  (e.tsMicros - s.firstFrom).toDouble / 1000000.0)
                s = s.copy(converted = true)
              }
            }
          }
          state.update(s)
          out.iterator
      }
  }

  /** Input/output/state shapes of [[bandCountsMonitor]] /
    * [[binCountsMonitor]]. */
  case class ScoredPoint(seq: Long, score: Double, label: Long)
  case class BucketState(n: Long, nPos: Long, maxSeq: Long)
  case class BucketCount(bucket: Long, through_seq: Long, n: Long,
      n_pos: Long)

  /** Shared state machine: running (n, n_pos) per score BUCKET (a
    * gains band or an AP score bin), keyed BY the bucket so the
    * monitor scales with arrival volume — each micro-batch shuffles
    * events to at most `buckets` tasks, state is two counters + a
    * high-water seq per bucket, and only buckets that received data
    * emit (Append). A single-global-key design would fold every event
    * of every batch through ONE task — the exact shape the batch
    * operators here avoid. */
  private def bucketCounts(
      ds: Dataset[ScoredPoint],
      bucketOf: ScoredPoint => Long): Dataset[BucketCount] = {
    implicit val stateEnc: Encoder[BucketState] = Encoders.product[BucketState]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[BucketCount] = Encoders.product[BucketCount]
    ds.groupByKey(bucketOf)
      .flatMapGroupsWithState[BucketState, BucketCount](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, rows: Iterator[ScoredPoint],
            state: GroupState[BucketState]) =>
          var s = state.getOption.getOrElse(BucketState(0L, 0L, 0L))
          rows.foreach { p =>
            s = BucketState(s.n + 1L, s.nPos + (if (p.label != 0L) 1L else 0L),
              math.max(s.maxSeq, p.seq))
          }
          state.update(s)
          Iterator.single(BucketCount(bucket, s.maxSeq, s.n, s.nPos))
      }
  }

  /** Streaming twin of [[graft.operators.Evaluation.gainsTable]]
    * (x221): running per-BAND (n, n_pos) counts against FROZEN score
    * cutoffs (the ewmaChart frozen-baseline shape — the cutoffs ship
    * from the batch operator's own exact-quantile pass over a
    * reference window; a live stream cannot re-rank history anyway).
    * Band assignment is the batch expression verbatim:
    * `k − #(score > cutoffᵢ)`, band 1 = top scores.
    *
    * Each emission is one band's latest running counts; the k-row
    * cumulative capture/lift table is then
    * [[graft.operators.Evaluation.gainsFromBandCounts]] over the
    * latest emission per band — the EXACT batch code path, so stream
    * rollup ≡ batch table bit-for-bit (spec-pinned across a
    * mid-stream micro-batch split).
    */
  def bandCountsMonitor(
      ds: Dataset[ScoredPoint], cutoffs: Seq[Double]): Dataset[BucketCount] = {
    require(cutoffs.nonEmpty, "need at least one cutoff (k >= 2 bands)")
    require(cutoffs == cutoffs.sorted, s"cutoffs must ascend: $cutoffs")
    val k = cutoffs.size + 1
    bucketCounts(ds, p => k.toLong - cutoffs.count(p.score > _))
  }

  /** Streaming twin of [[graft.operators.Evaluation.averagePrecision]]
    * at `bins > 0` (x232's scale form): running per-BIN counts against
    * a FROZEN equal-width grid (lo, hi, bins — from the reference
    * window's min/max, the rocAuc `bins` contract). Bin assignment is
    * the batch `quantize` expression verbatim:
    * `min(⌊(s−lo)·bins/(hi−lo)⌋, bins−1)`, degenerate hi ≤ lo → bin 0.
    *
    * Each emission is one bin's latest running counts; the AP value is
    * [[graft.operators.Evaluation.apFromScoreCounts]] over the latest
    * emission per bin (bucket id cast back to the batch's double
    * bin key) — the EXACT batch code path (spec-pinned).
    */
  def binCountsMonitor(
      ds: Dataset[ScoredPoint], lo: Double, hi: Double,
      bins: Int): Dataset[BucketCount] = {
    require(bins >= 1, s"bins must be >= 1: $bins")
    bucketCounts(ds, p =>
      if (hi > lo)
        math.min(math.floor((p.score - lo) * bins / (hi - lo)).toLong,
          (bins - 1).toLong)
      else 0L)
  }

  /** Input/output shapes of [[armCountsMonitor]]. */
  case class ArmEvent(seq: Long, arm: String)
  case class ArmCount(arm: String, through_seq: Long, n: Long)

  /** Streaming twin of [[graft.operators.Evaluation.srmCheck]]
    * (x255): running assignment counts per arm — SRM is precisely the
    * check a platform wants LIVE (a broken splitter should page
    * within minutes, not at the fixed-horizon readout; Fabijan
    * KDD'19 §5 recommends continuous SRM monitoring). State is one
    * counter + a high-water seq per arm (k arms total); the latest
    * emission per arm rolls up through
    * [[graft.operators.Evaluation.srmFromArmCounts]] — the EXACT
    * batch chain (spec-pinned across a mid-stream split). Pair the
    * flag with [[msprtMomentsMonitor]]: metric reads are only
    * trustworthy while the live SRM stays clean.
    */
  def armCountsMonitor(ds: Dataset[ArmEvent]): Dataset[ArmCount] = {
    implicit val stateEnc: Encoder[ArmCount] = Encoders.product[ArmCount]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    ds.filter(_.arm != null)
      .groupByKey(_.arm)
      .flatMapGroupsWithState[ArmCount, ArmCount](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (arm: String, rows: Iterator[ArmEvent],
            state: GroupState[ArmCount]) =>
          var s = state.getOption.getOrElse(ArmCount(arm, 0L, 0L))
          rows.foreach(r =>
            s = ArmCount(arm, math.max(s.through_seq, r.seq), s.n + 1L))
          state.update(s)
          Iterator.single(s)
      }
  }

  /** Input/output shapes of [[benfordDigitMonitor]] (input reuses
    * [[DdPoint]] — same (seq, value) event). */
  case class DigitCount(digit: Int, through_seq: Long, n: Long)

  /** Streaming twin of [[graft.operators.Profiling.benford]] (x157):
    * live leading-digit counts — the fraud/data-quality tripwire a
    * payment or metrics stream wants continuously (a bot campaign or
    * a unit-change bug bends the first-digit curve long before any
    * volume alarm). State is NINE counters + high-water seqs, total;
    * keys come from the Scala cents/digit twin
    * ([[graft.operators.Profiling.benfordDigitOf]], pinned ≡ the
    * in-plan expression by ProfilingSpec); the latest emission per
    * digit rolls up through
    * [[graft.operators.Profiling.benfordFromDigitCounts]] — the EXACT
    * batch chain (spec-pinned across a mid-stream split). Non-positive
    * values are outside Benford's support and dropped, matching the
    * batch filter. */
  def benfordDigitMonitor(ds: Dataset[DdPoint]): Dataset[DigitCount] = {
    implicit val stateEnc: Encoder[DigitCount] = Encoders.product[DigitCount]
    implicit val keyEnc: Encoder[Int] = Encoders.scalaInt
    ds.map(p => (graft.operators.Profiling.benfordDigitOf(p.value), p.seq))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .filter((t: (Int, Long)) => t._1 > 0)
      .groupByKey((t: (Int, Long)) => t._1)
      .flatMapGroupsWithState[DigitCount, DigitCount](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (digit: Int, rows: Iterator[(Int, Long)],
            state: GroupState[DigitCount]) =>
          var s = state.getOption.getOrElse(DigitCount(digit, 0L, 0L))
          rows.foreach(r =>
            s = DigitCount(digit, math.max(s.through_seq, r._2), s.n + 1L))
          state.update(s)
          Iterator.single(s)
      }
  }

  /** Input/output shapes of [[ddBucketMonitor]]. */
  case class DdPoint(seq: Long, value: Double)
  case class DdBucket(bucket: Long, through_seq: Long, c: Long)

  /** Streaming twin of [[graft.operators.Sketch.ddsketchQuantiles]]
    * (x276): live DDSketch bucket counts — the tail-latency quantile
    * monitor with state bounded by the VALUE RANGE (≤ ln(max/min)/ln γ
    * buckets, ~1k for 9 decades at α = 0.01), never the stream. Keys
    * come from the Scala bucket twin
    * ([[graft.operators.Sketch.ddBucketOf]], pinned ≡ the in-plan
    * expression by SketchSpec); the latest emission per bucket rolls
    * up through [[graft.operators.Sketch.ddQuantilesFromBuckets]] —
    * the EXACT batch walk (spec-pinned across a mid-stream split).
    * Non-positive values are outside the sketch support and dropped,
    * matching the batch filter. */
  def ddBucketMonitor(ds: Dataset[DdPoint],
      alpha: Double = 0.01): Dataset[DdBucket] = {
    implicit val stateEnc: Encoder[DdBucket] = Encoders.product[DdBucket]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    ds.filter(_.value > 0)
      .groupByKey(p => graft.operators.Sketch.ddBucketOf(p.value, alpha))
      .flatMapGroupsWithState[DdBucket, DdBucket](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, rows: Iterator[DdPoint],
            state: GroupState[DdBucket]) =>
          var s = state.getOption.getOrElse(DdBucket(bucket, 0L, 0L))
          rows.foreach(r =>
            s = DdBucket(bucket, math.max(s.through_seq, r.seq), s.c + 1L))
          state.update(s)
          Iterator.single(s)
      }
  }

  /** Input/output shapes of [[cmhCellsMonitor]]. */
  case class StratumEvent(seq: Long, stratum: String, treat: Boolean,
      success: Boolean)
  case class CmhCell(stratum: String, through_seq: Long, n: Long,
      r1: Long, c1: Long, a: Long)

  /** Streaming twin of [[graft.operators.Evaluation.cmhTest]] (x269):
    * live per-stratum 2×2 margins — the stratified experiment read a
    * platform wants continuously, for the same reason as the live SRM
    * ([[armCountsMonitor]]): a confounded stratum drift should page
    * before the fixed-horizon readout. State is four counters + a
    * high-water seq per stratum (k strata total, bounded by design);
    * the latest emission per stratum renames straight into
    * [[graft.operators.Evaluation.cmhFromCells]] — the EXACT batch
    * finishing chain (spec-pinned across a mid-stream split).
    */
  def cmhCellsMonitor(ds: Dataset[StratumEvent]): Dataset[CmhCell] = {
    implicit val stateEnc: Encoder[CmhCell] = Encoders.product[CmhCell]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    ds.filter(_.stratum != null)
      .groupByKey(_.stratum)
      .flatMapGroupsWithState[CmhCell, CmhCell](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (stratum: String, rows: Iterator[StratumEvent],
            state: GroupState[CmhCell]) =>
          var s = state.getOption
            .getOrElse(CmhCell(stratum, 0L, 0L, 0L, 0L, 0L))
          rows.foreach { r =>
            val t = if (r.treat) 1L else 0L
            val y = if (r.success) 1L else 0L
            s = CmhCell(stratum, math.max(s.through_seq, r.seq),
              s.n + 1L, s.r1 + t, s.c1 + y, s.a + t * y)
          }
          state.update(s)
          Iterator.single(s)
      }
  }

  /** Output/state shapes of [[pageHinkleyMonitor]] (input reuses
    * [[CusumPoint]] — same (key, seq, value) event). */
  case class PhState(i: Double, s: Double, m: Double, minM: Double,
      exc: Double)
  case class PhOut(key: String, seq: Long, ph_stat: Double,
      detected: Boolean)

  /** Streaming twin of [[graft.operators.TimeSeries.pageHinkley]]
    * (x237): the self-calibrating changepoint a live pipeline wants
    * next to [[cusumDrift]] — CUSUM needs a FROZEN baseline (μ, σ)
    * shipped from a reference window, so a drift that contaminates
    * the baseline window weakens its own alarm; Page–Hinkley's
    * RUNNING mean needs no baseline at all, and it folds incrementally
    * per key: state is five doubles (i, Σy, mₜ, min mₛ, max
    * excursion), each arrival one O(1) update
    *   m' = m + (y − Σ'/i' − δ),  alarm when  max(m' − min m) > λ.
    *
    * Parity (the cusumDrift discipline): each value quantizes with
    * the batch double→DECIMAL(18,6) cast semantics, the update is the
    * batch `aggregate` fold's IEEE chain op-for-op, and the displayed
    * stat/alarm mirror the batch's staged DECIMAL(18,8)→4 dp rounding
    * — so the final emission per key equals the batch x237 row
    * exactly (spec-pinned across a mid-stream split). Rows within a
    * micro-batch apply in `seq` order.
    */
  def pageHinkleyMonitor(ds: Dataset[CusumPoint], delta: Double = 0.0,
      lambda: Double = 10.0): Dataset[PhOut] = {
    require(lambda > 0, s"alarm threshold lambda must be positive: $lambda")
    implicit val stateEnc: Encoder[PhState] = Encoders.product[PhState]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val outEnc: Encoder[PhOut] = Encoders.product[PhOut]
    def r4(x: Double): Double =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[PhState, PhOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[CusumPoint],
            state: GroupState[PhState]) =>
          var st = state.getOption.getOrElse(PhState(0.0, 0.0, 0.0, 0.0, 0.0))
          val out = rows.toSeq.sortBy(_.seq).map { p =>
            // the batch fold, step for step: quantize, then
            // i' = i+1, S' = S+y, m' = m + (y − S'/i' − δ),
            // minM' = min(minM, m'), exc' = max(exc, m' − minM')
            val y = BigDecimal(p.value)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            val i = st.i + 1.0
            val s = st.s + y
            val m = st.m + (y - s / i - delta)
            val minM = math.min(st.minM, m)
            val exc = math.max(st.exc, m - minM)
            st = PhState(i, s, m, minM, exc)
            PhOut(p.key, p.seq, r4(exc), r4(exc) > lambda)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Input/output shapes of [[msprtMomentsMonitor]]. */
  case class ArmValue(seq: Long, treat: Boolean, value: Double)
  case class ArmMoments(treat: Boolean, through_seq: Long, n: Long,
      sum6: java.math.BigDecimal, sumsq12: java.math.BigDecimal)

  /** Streaming twin of [[graft.operators.Evaluation.msprt]] (x254):
    * running per-ARM exact-decimal moments (n, Σv, Σv²) — the natural
    * home of an ALWAYS-VALID sequential test, whose whole point is
    * that the dashboard may consult it after every micro-batch
    * without inflating false positives. Each arriving value is
    * quantized with the batch cast's exact semantics
    * (`Double.toString` → HALF_UP at scale 6, Spark's double→DECIMAL
    * rule) and the square accumulates at scale 12, so the emitted
    * moments equal [[graft.operators.Evaluation.msprtMoments]]'
    * aggregate bit-for-bit; the latest emission per arm rolls up
    * through [[graft.operators.Evaluation.msprtFromMoments]] — the
    * EXACT batch code path (spec-pinned across a mid-stream split).
    * State is two decimals + two longs PER ARM: always-valid
    * monitoring of an unbounded stream in O(1) state.
    */
  def msprtMomentsMonitor(ds: Dataset[ArmValue]): Dataset[ArmMoments] = {
    implicit val stateEnc: Encoder[ArmMoments] = Encoders.product[ArmMoments]
    implicit val keyEnc: Encoder[Boolean] = Encoders.scalaBoolean
    ds.groupByKey(_.treat)
      .flatMapGroupsWithState[ArmMoments, ArmMoments](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (treat: Boolean, rows: Iterator[ArmValue],
            state: GroupState[ArmMoments]) =>
          val zero = java.math.BigDecimal.ZERO
          var s = state.getOption.getOrElse(ArmMoments(treat, 0L, 0L,
            zero.setScale(6), zero.setScale(12)))
          rows.foreach { r =>
            val v6 = java.math.BigDecimal.valueOf(r.value)
              .setScale(6, java.math.RoundingMode.HALF_UP)
            s = ArmMoments(treat, math.max(s.through_seq, r.seq), s.n + 1L,
              s.sum6.add(v6), s.sumsq12.add(v6.multiply(v6)))
          }
          state.update(s)
          Iterator.single(s)
      }
  }

  /** Input/output shapes of [[hllRegisterMonitor]] (input reuses
    * [[CmsEvent]] — same (seq, key) event). */
  case class HllRegister(bucket: Long, through_seq: Long, max_rank: Int)

  /** Streaming twin of [[graft.operators.Sketch.hllDistinct]] (x259):
    * the HLL register table maintained LIVE — each arrival MAXes its
    * register's rank, state is one (max_rank, high-water seq) pair per
    * register (bounded at m registers TOTAL, regardless of how many
    * distinct keys flow past — the cardinality monitor for an
    * unbounded key domain next to [[countMinMonitor]]'s frequencies).
    * Buckets and ranks come from [[graft.operators.Sketch.hllBucketOf]]
    * / [[graft.operators.Sketch.hllRankOf]] — the SAME portable
    * md5-hex arithmetic as the batch build, so the latest emission per
    * register equals the batch [[graft.operators.Sketch.hllRegisterTable]]
    * row-for-row (max is idempotent and order-free; spec-pinned across
    * a mid-stream split), and rolling the live table through
    * [[graft.operators.Sketch.hllEstimateFromRegisters]] — the EXACT
    * batch finishing chain — gives exactly the batch estimate. */
  def hllRegisterMonitor(
      ds: Dataset[CmsEvent], m: Int): Dataset[HllRegister] = {
    require(m >= 128 && (m & (m - 1)) == 0,
      s"m must be a power of two >= 128: $m")
    implicit val stateEnc: Encoder[HllRegister] =
      Encoders.product[HllRegister]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val rowEnc: Encoder[(Long, Int, Long)] =
      Encoders.product[(Long, Int, Long)]
    ds.filter(_.key != null)
      .map(e => (graft.operators.Sketch.hllBucketOf(e.key, m),
        graft.operators.Sketch.hllRankOf(e.key), e.seq))
      .groupByKey(_._1)
      .flatMapGroupsWithState[HllRegister, HllRegister](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, rows: Iterator[(Long, Int, Long)],
            state: GroupState[HllRegister]) =>
          var s = state.getOption.getOrElse(HllRegister(bucket, 0L, 0))
          rows.foreach(r => s = HllRegister(bucket,
            math.max(s.through_seq, r._3), math.max(s.max_rank, r._2)))
          state.update(s)
          Iterator.single(s)
      }
  }

  /** Input/output shapes of [[bootstrapMomentsMonitor]]. */
  case class KeyedValue(seq: Long, key: String, value: Double)
  case class ResampleSum(b: Int, through_seq: Long, n: Long,
      sum6: java.math.BigDecimal)

  /** Streaming twin of
    * [[graft.operators.Evaluation.poissonBootstrapCI]] (x265): the B
    * weighted resample sums maintained LIVE — each arrival adds its
    * deterministic Poisson weight (and weight × value) to every
    * resample's accumulators, state is (Σw, Σw·v) per resample (B
    * rows TOTAL — an always-on bootstrap CI in 81 counters, the
    * error-bar companion to [[msprtMomentsMonitor]]'s decision
    * boundary). Weights come from
    * [[graft.operators.Evaluation.poissonWeightOf]] — the batch
    * build's exact md5 inverse-CDF — and values quantize with the
    * batch double→DECIMAL(18,6) cast semantics, so the latest
    * emission per resample equals the batch
    * [[graft.operators.Evaluation.bootstrapMeans]] accumulators
    * row-for-row (sums are additive; spec-pinned across a mid-stream
    * split), and the exact-index quantiles over the live means give
    * exactly the batch CI. */
  def bootstrapMomentsMonitor(
      ds: Dataset[KeyedValue], b: Int): Dataset[ResampleSum] = {
    require(b >= 41 && (b - 1) % 40 == 0,
      s"b must make (b-1)*0.025 integral (41, 81, 121, ...): $b")
    implicit val stateEnc: Encoder[ResampleSum] =
      Encoders.product[ResampleSum]
    implicit val keyEnc: Encoder[Int] = Encoders.scalaInt
    implicit val rowEnc: Encoder[(Int, Long, Long, Double)] =
      Encoders.product[(Int, Long, Long, Double)]
    ds.filter(_.key != null)
      .flatMap(e => (0 until b).map(j =>
        (j, graft.operators.Evaluation.poissonWeightOf(j, e.key),
          e.seq, e.value)))
      .groupByKey(_._1)
      .flatMapGroupsWithState[ResampleSum, ResampleSum](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (j: Int, rows: Iterator[(Int, Long, Long, Double)],
            state: GroupState[ResampleSum]) =>
          val zero = java.math.BigDecimal.ZERO.setScale(6)
          var s = state.getOption.getOrElse(ResampleSum(j, 0L, 0L, zero))
          rows.foreach { r =>
            val v6 = java.math.BigDecimal.valueOf(r._4)
              .setScale(6, java.math.RoundingMode.HALF_UP)
            s = ResampleSum(j, math.max(s.through_seq, r._3),
              s.n + r._2,
              s.sum6.add(v6.multiply(
                java.math.BigDecimal.valueOf(r._2))))
          }
          state.update(s)
          Iterator.single(s)
      }
  }

  /** Output shape of [[amsSignSumMonitor]] (input reuses
    * [[CmsEvent]]). */
  case class AmsSum(j: Int, through_seq: Long, s: Long)

  /** Streaming twin of [[graft.operators.Sketch.amsF2]] /
    * [[graft.operators.Sketch.amsJoinSize]] (x262/x263): the depth
    * ±1 sign-sums maintained LIVE — each arrival adds its sign to
    * every seed's sum, state is one (sum, high-water seq) pair per
    * seed (`depth` rows TOTAL — a live self-join-size / join-size
    * monitor in a dozen counters). Signs come from
    * [[graft.operators.Sketch.amsSignOf]] — the batch build's exact
    * md5 top-bit arithmetic — so the latest emission per seed equals
    * the batch [[graft.operators.Sketch.amsSignSums]] row-for-row
    * (sums are additive; spec-pinned across a mid-stream split), and
    * median(S²) over the live table is exactly the batch estimate. */
  def amsSignSumMonitor(
      ds: Dataset[CmsEvent], depth: Int): Dataset[AmsSum] = {
    require(depth >= 1 && depth % 2 == 1 && depth <= 99,
      s"depth must be odd in [1,99]: $depth")
    implicit val stateEnc: Encoder[AmsSum] = Encoders.product[AmsSum]
    implicit val keyEnc: Encoder[Int] = Encoders.scalaInt
    implicit val rowEnc: Encoder[(Int, Long, Long)] =
      Encoders.product[(Int, Long, Long)]
    ds.filter(_.key != null)
      .flatMap(e => (0 until depth).map(j =>
        (j, graft.operators.Sketch.amsSignOf(j, e.key), e.seq)))
      .groupByKey(_._1)
      .flatMapGroupsWithState[AmsSum, AmsSum](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (j: Int, rows: Iterator[(Int, Long, Long)],
            state: GroupState[AmsSum]) =>
          var s = state.getOption.getOrElse(AmsSum(j, 0L, 0L))
          rows.foreach(r => s = AmsSum(j,
            math.max(s.through_seq, r._3), s.s + r._2))
          state.update(s)
          Iterator.single(s)
      }
  }

  /** Input/output shapes of [[countMinMonitor]]. */
  case class CmsEvent(seq: Long, key: String)
  case class CmsCell(j: Int, bucket: Long, through_seq: Long, n: Long)

  /** Streaming twin of [[graft.operators.Sketch.countMinFrequencies]]
    * (x248): the count–min counter table maintained LIVE — each
    * arrival increments its `depth` (seed, bucket) cells, state is
    * one counter + a high-water seq per cell (bounded at depth·width
    * cells TOTAL, the sketch's whole point: frequency monitoring over
    * an unbounded key domain in fixed state). Buckets come from
    * [[graft.operators.Sketch.bucketOf]] — the SAME portable md5-hex
    * arithmetic as the batch build, so the streamed table equals the
    * batch [[graft.operators.Sketch.counterTable]] cell-for-cell
    * (counts are additive; spec-pinned across a mid-stream split),
    * and a probe (MIN across seeds) over the live table gives exactly
    * the batch estimates.
    */
  def countMinMonitor(
      ds: Dataset[CmsEvent], depth: Int, width: Int): Dataset[CmsCell] = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16]: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    implicit val stateEnc: Encoder[BucketState] = Encoders.product[BucketState]
    implicit val keyEnc: Encoder[(Int, Long)] =
      Encoders.product[(Int, Long)]
    implicit val outEnc: Encoder[CmsCell] = Encoders.product[CmsCell]
    implicit val cellEnc: Encoder[(Int, Long, Long)] =
      Encoders.product[(Int, Long, Long)]
    ds.filter(_.key != null)
      .flatMap(e => (0 until depth).map(j =>
        (j, graft.operators.Sketch.bucketOf(j, e.key, width), e.seq)))
      .groupByKey(c => (c._1, c._2))
      .flatMapGroupsWithState[BucketState, CmsCell](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (cell: (Int, Long), rows: Iterator[(Int, Long, Long)],
            state: GroupState[BucketState]) =>
          var s = state.getOption.getOrElse(BucketState(0L, 0L, 0L))
          rows.foreach(r =>
            s = BucketState(s.n + 1L, 0L, math.max(s.maxSeq, r._3)))
          state.update(s)
          Iterator.single(CmsCell(cell._1, cell._2, s.maxSeq, s.n))
      }
  }

  /** One pre-binned observation (the caller quantizes upstream with
    * the batch operator's own grid). */
  case class BinEvent(seq: Long, bin: Double)

  /** Live histogram counter per bin. */
  case class BinCount(bin: Double, through_seq: Long, n: Long)

  /** Streaming histogram monitor: per-bin running counts — state
    * bounded by the bin GRID, never events. The latest row per bin,
    * stacked against a frozen base histogram, rolls up through the
    * EXACT batch chain (`Evaluation.hellingerFromCells`) to the live
    * Hellinger/Bhattacharyya distance — distribution drift scored on
    * every micro-batch against the training-time base.
    */
  def binCountsMonitor(ds: Dataset[BinEvent]): Dataset[BinCount] = {
    implicit val stateEnc: Encoder[BinCount] = Encoders.product[BinCount]
    implicit val keyEnc: Encoder[Double] = Encoders.scalaDouble
    ds.groupByKey(_.bin)
      .flatMapGroupsWithState[BinCount, BinCount](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bin: Double, rows: Iterator[BinEvent],
            state: GroupState[BinCount]) =>
          var st = state.getOption.getOrElse(BinCount(bin, 0L, 0L))
          rows.foreach(r => st = BinCount(bin,
            math.max(st.through_seq, r.seq), st.n + 1L))
          state.update(st)
          Iterator.single(st)
      }
  }

  /** One numeric observation of a named feature column. */
  case class MomentEvent(seq: Long, column: String, value: Double)

  /** Live per-column moment counters: everything
    * [[graft.operators.Profiling.smdFromMomentCells]] needs to SMD
    * the live stream against a frozen base. */
  case class MomentCell(column: String, through_seq: Long, n: Long,
      s: Double, s2: Double)

  /** Streaming feature-drift monitor: per-column running (n, Σv, Σv²)
    * — state bounded by the column LIST, never events. The latest row
    * per column, stacked against the frozen base era's moments, rolls
    * up through the EXACT batch chain
    * (`Profiling.smdFromMomentCells`) to the live SMD page — the
    * "did the data change under me" gauge running against every
    * incoming micro-batch instead of a nightly scan.
    */
  def momentsMonitor(ds: Dataset[MomentEvent]): Dataset[MomentCell] = {
    implicit val stateEnc: Encoder[MomentCell] = Encoders.product[MomentCell]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    ds.filter(_.column != null)
      .groupByKey(_.column)
      .flatMapGroupsWithState[MomentCell, MomentCell](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (c: String, rows: Iterator[MomentEvent],
            state: GroupState[MomentCell]) =>
          var st = state.getOption.getOrElse(MomentCell(c, 0L, 0L, 0.0, 0.0))
          rows.foreach { r =>
            st = MomentCell(c, math.max(st.through_seq, r.seq),
              st.n + 1L, st.s + r.value, st.s2 + r.value * r.value)
          }
          state.update(st)
          Iterator.single(st)
      }
  }

  /** One pairwise preference comparison: `a` listed first, `aWon`
    * true when the first-listed option won. */
  case class PrefEvent(seq: Long, a: String, b: String, aWon: Boolean)

  /** Live directed-pair counters: entity `e` vs opponent `o` —
    * `games`/`wins` from e's perspective, plus `first_games`/
    * `first_wins` counting only the comparisons where e was LISTED
    * first (the positional-bias margin). */
  case class PrefPairCount(e: String, o: String, through_seq: Long,
      games: Long, wins: Long, first_games: Long, first_wins: Long)

  /** Streaming preference-log monitor — the live RLHF/eval-preference
    * dashboard: each comparison updates its two directed-pair
    * counters, so state is bounded by observed entity pairs (never
    * events). The latest row per pair rolls up through the EXACT
    * batch finishing chains: per-entity sums + pair counts into
    * `Annotation.bradleyTerryFromCounts` (live strengths), and the
    * first-listed margins into `Annotation.positionalBiasFromAgg`
    * (live slot-bias Wilson interval) — both spec-pinned ≡ batch
    * across a mid-stream split.
    */
  def prefPairsMonitor(ds: Dataset[PrefEvent]): Dataset[PrefPairCount] = {
    implicit val stateEnc: Encoder[PrefPairCount] =
      Encoders.product[PrefPairCount]
    implicit val keyEnc: Encoder[(String, String)] =
      Encoders.product[(String, String)]
    implicit val dirEnc: Encoder[(Long, String, String, Boolean, Boolean)] =
      Encoders.product[(Long, String, String, Boolean, Boolean)]
    ds.filter(e => e.a != null && e.b != null && e.a != e.b)
      // two directed rows per comparison: (seq, e, o, won, listedFirst)
      .flatMap(e => Seq((e.seq, e.a, e.b, e.aWon, true),
        (e.seq, e.b, e.a, !e.aWon, false)))
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[PrefPairCount, PrefPairCount](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, String),
            rows: Iterator[(Long, String, String, Boolean, Boolean)],
            state: GroupState[PrefPairCount]) =>
          var s = state.getOption.getOrElse(
            PrefPairCount(key._1, key._2, 0L, 0L, 0L, 0L, 0L))
          rows.foreach { r =>
            s = PrefPairCount(key._1, key._2,
              math.max(s.through_seq, r._1),
              s.games + 1L, s.wins + (if (r._4) 1L else 0L),
              s.first_games + (if (r._5) 1L else 0L),
              s.first_wins + (if (r._5 && r._4) 1L else 0L))
          }
          state.update(s)
          Iterator.single(s)
      }
  }

  /** Input/output shapes of [[postingsMonitor]]: a document arrival
    * and the inverted-index rows it contributes — one row per
    * distinct term with the doc's tf for it, the doc length carried
    * on every row (`lens` = distinct (doc_id, dl)). */
  case class DocEvent(seq: Long, docId: String, text: String)
  case class PostingEmit(doc_id: String, through_seq: Long,
      term: String, tf: Long, dl: Long)

  /** Streaming maintenance of the BM25 inverted index (the live tail
    * of the retrieval tier: [[graft.operators.TextAnalysis.bm25Index]]
    * builds it batch, ensureBm25Index persists it, THIS keeps it
    * current as a crawl streams in): each NEW document emits its
    * (term, tf) postings plus its length exactly once — state is one
    * high-water seq per doc id, so a redelivered document (at-least-
    * once sources) emits NOTHING the second time, the idempotence an
    * append-only index needs. Tokenization is the batch
    * `Text.tokens` + non-empty filter verbatim (split on single
    * space), so the rolled-up postings/lens equal
    * [[graft.operators.TextAnalysis.bm25Index]] on the deduped corpus
    * row-for-row, and [[graft.operators.TextAnalysis
    * .bm25TopDocsForQueries]] over the live rollup returns the batch
    * top-k exactly (spec-pinned across a mid-stream split with a
    * redelivery). Corpus-level stats (N, Σdl, df) are intentionally
    * NOT state: they are one aggregate over the rollup at query
    * time — keeping them live would re-derive what the probe already
    * computes from its own 1-row broadcast.
    *
    * IMMUTABILITY ASSUMPTION (r18 ADVICE, explicit): this monitor is
    * first-sight-wins across batches — correct ONLY for an
    * append-only crawl where redeliveries carry identical payloads
    * (pure at-least-once). A re-crawled document whose text CHANGED
    * is treated as a redelivery and emits nothing, silently diverging
    * the live index from a batch rebuild. A corpus with document
    * revisions needs [[postingsMonitorVersioned]], which stores the
    * accepted version and emits retract+insert deltas on change.
    *
    * State: one (seq) per doc — the same V-bounded budget as the
    * exact-dedup digest monitors; emissions are bounded by NEW docs'
    * distinct terms. */
  def postingsMonitor(ds: Dataset[DocEvent]): Dataset[PostingEmit] = {
    implicit val stateEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[PostingEmit] =
      Encoders.product[PostingEmit]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    ds.filter(e => e.docId != null && e.text != null)
      .groupByKey(_.docId)
      .flatMapGroupsWithState[Long, PostingEmit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (doc: String, rows: Iterator[DocEvent], state: GroupState[Long]) =>
          if (state.exists) {
            // duplicate delivery: advance the high-water seq, emit
            // nothing (the index already holds this doc)
            var hw = state.get
            rows.foreach(r => hw = math.max(hw, r.seq))
            state.update(hw)
            Iterator.empty
          } else {
            // first sight: the batch's winning copy is the max-seq
            // event (ties to the lexically larger text, the
            // max-seq-wins convention every monitor here uses)
            var best: Option[DocEvent] = None
            rows.foreach { r =>
              best = best match {
                case Some(b) if r.seq < b.seq ||
                  (r.seq == b.seq && r.text <= b.text) => Some(b)
                case _ => Some(r)
              }
            }
            val e = best.get
            state.update(e.seq)
            // Text.tokens twin: split on single space, drop empties
            val toks = e.text.split(" ", -1).filter(_.nonEmpty)
            val dl = toks.length.toLong
            toks.groupBy(identity).toSeq.sortBy(_._1).iterator.map {
              case (t, occ) =>
                PostingEmit(doc, e.seq, t, occ.length.toLong, dl)
            }
          }
      }
  }

  /** VERSIONED streaming maintenance of the BM25 inverted index —
    * the document-REVISION path [[postingsMonitor]] declares out of
    * scope (r18 verdict #2): state is the ACCEPTED VERSION of each
    * doc (seq + text), and a later event whose text CHANGED emits
    * per-term NET DELTAS — negative tf for retracted occurrences,
    * positive for inserted ones, every row carrying the NEW doc
    * length — so the live rollup
    *
    *   postings = Σ tf per (term, doc), keep > 0
    *   lens     = per doc, the dl of its max-through_seq row
    *
    * equals a batch [[graft.operators.TextAnalysis.bm25Index]]
    * REBUILD over the latest-version corpus row-for-row at every
    * batch boundary, and the probe over it returns the batch top-k
    * exactly (spec-pinned across a mid-stream UPDATE, a stale
    * redelivery of the superseded version, and an identical-payload
    * redelivery — the first two emit nothing or retract exactly,
    * never double-count).
    *
    * Version acceptance is the max-seq-wins convention every monitor
    * here uses: the winner among {state, batch rows} is the highest
    * seq, ties to the lexically larger text. A stale event (seq
    * below the accepted version) is ignored; an equal-payload
    * redelivery advances nothing and emits nothing; an update whose
    * token multiset happens to be unchanged (pure reordering) emits
    * nothing — the index genuinely did not change. Give re-crawls
    * fresh seqs (any real source does): an equal-seq CONFLICTING
    * text resolves lexically, but the lens rollup is keyed by
    * through_seq and cannot order two generations sharing one seq.
    *
    * State: one (seq, accepted text) per doc — corpus-sized, the
    * honest cost of revision support (retracting old postings
    * requires knowing them; the alternative, probing the downstream
    * index from inside the state function, would couple the monitor
    * to its sink). An append-only crawl should keep the V-bounded
    * [[postingsMonitor]]. */
  def postingsMonitorVersioned(ds: Dataset[DocEvent])
      : Dataset[PostingEmit] = {
    implicit val stateEnc: Encoder[(Long, String)] =
      Encoders.product[(Long, String)]
    implicit val outEnc: Encoder[PostingEmit] =
      Encoders.product[PostingEmit]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    // Text.tokens twin: split on single space, drop empties
    def tf(text: String): Map[String, Long] =
      text.split(" ", -1).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, occ) => t -> occ.length.toLong }
    ds.filter(e => e.docId != null && e.text != null)
      .groupByKey(_.docId)
      .flatMapGroupsWithState[(Long, String), PostingEmit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (doc: String, rows: Iterator[DocEvent],
            state: GroupState[(Long, String)]) =>
          val prev = state.getOption
          // fold the batch INTO the accepted version: highest seq
          // wins, ties to the lexically larger text
          var best = prev
          rows.foreach { r =>
            best = best match {
              case Some((s0, t0)) if r.seq < s0 ||
                (r.seq == s0 && r.text <= t0) => Some((s0, t0))
              case _ => Some((r.seq, r.text))
            }
          }
          val (seq, text) = best.get
          if (prev.isEmpty) {
            // first sight: full insert
            state.update((seq, text))
            val m = tf(text)
            val dl = m.values.sum
            m.toSeq.sortBy(_._1).iterator.map { case (t, n) =>
              PostingEmit(doc, seq, t, n, dl)
            }
          } else if (prev.exists(_._2 == text)) {
            // same accepted text: advance the seq high-water only
            if (!prev.exists(_._1 == seq)) state.update((seq, text))
            Iterator.empty
          } else {
            // revision: per-term net deltas, new dl on every row
            state.update((seq, text))
            val oldM = tf(prev.get._2)
            val newM = tf(text)
            val dl = newM.values.sum
            (oldM.keySet ++ newM.keySet).toSeq.sorted.iterator
              .flatMap { t =>
                val d = newM.getOrElse(t, 0L) - oldM.getOrElse(t, 0L)
                if (d == 0L) None
                else Some(PostingEmit(doc, seq, t, d, dl))
              }
          }
      }
  }

  /** Input/output shapes of [[membershipDeltaMonitor]]: an assignment
    * event (a node observed in — or re-labeled into — a community)
    * and the community-size CHANGE-LOG row it produces. */
  case class MemberEvent(seq: Long, node: String, community: String)
  case class MembershipDelta(community: String, through_seq: Long,
      delta: Long)

  /** Streaming community-drift monitor (r17 verdict #8 — closes the
    * loop between the graph tier and the live monitors the way the
    * feature-drift and preference monitors already do): each batch of
    * (node, community) assignment events — e.g. the output of a
    * periodic [[graft.operators.Graph.labelPropagation]] re-run, or
    * per-entity cluster tags on a curation stream — maintains per-NODE
    * membership state and emits a community-size change-log: +1 into
    * the community a node enters, −1 out of the one it leaves, nothing
    * when the assignment is unchanged (idempotent re-emissions are
    * free). The live size histogram is the delta rollup
    * (`groupBy(community).sum(delta)`), and drifting it against a
    * FROZEN baseline histogram goes through
    * [[graft.operators.Evaluation.jensenShannonFromCells]] — the EXACT
    * batch JSD chain (x203), spec-pinned: the live JSD at any
    * mid-stream point equals the batch [[graft.operators.Evaluation
    * .jensenShannon]] over the equivalent two-slice frame. A chain of
    * re-assignments within ONE batch collapses to its net move (state
    * is the latest community by event seq; ties to the lexically
    * larger label for determinism, matching the max-seq-wins
    * convention every monitor here uses).
    *
    * State: one (community, seq) pair per node — V-bounded, the same
    * budget the batch assignment itself costs; emissions are bounded
    * by nodes that MOVED, so a converged community structure streams
    * almost nothing. */
  def membershipDeltaMonitor(ds: Dataset[MemberEvent])
      : Dataset[MembershipDelta] = {
    implicit val stateEnc: Encoder[(String, Long)] =
      Encoders.product[(String, Long)]
    implicit val outEnc: Encoder[MembershipDelta] =
      Encoders.product[MembershipDelta]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    ds.filter(e => e.node != null && e.community != null)
      .groupByKey(_.node)
      .flatMapGroupsWithState[(String, Long), MembershipDelta](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[MemberEvent],
            state: GroupState[(String, Long)]) =>
          // the batch's WINNING assignment: max seq, ties to the
          // lexically larger community (deterministic under any
          // iterator order)
          var best: Option[(String, Long)] = None
          var hw = 0L
          rows.foreach { r =>
            hw = math.max(hw, r.seq)
            best = best match {
              case Some((c, s0)) if r.seq < s0 ||
                (r.seq == s0 && r.community <= c) => Some((c, s0))
              case _ => Some((r.community, r.seq))
            }
          }
          val prev = state.getOption
          best match {
            case Some((c, s0)) if s0 >= prev.map(_._2).getOrElse(-1L) &&
                !prev.map(_._1).contains(c) =>
              state.update((c, math.max(s0, hw)))
              prev.map(p =>
                  MembershipDelta(p._1, hw, -1L)).iterator ++
                Iterator.single(MembershipDelta(c, hw, 1L))
            case Some((c, s0)) if prev.map(_._1).contains(c) =>
              state.update((c, math.max(hw, prev.map(_._2)
                .getOrElse(s0))))
              Iterator.empty
            case _ => Iterator.empty
          }
      }
  }
}
