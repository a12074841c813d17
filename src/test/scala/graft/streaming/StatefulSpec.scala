package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("firstSeen: streaming dedup emits only the first occurrence per key, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)] // (contentHash, docId)
    val out = Stateful.firstSeen[Long, (Long, String)](mem.toDS(), _._1)
    val sink = s"firstseen_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((10L, "a1"), (10L, "a2"), (20L, "b1"))
      q.processAllAvailable()
      mem.addData((10L, "a3"), (20L, "b2"), (30L, "c1"))
      q.processAllAvailable()
    } finally q.stop()
    val seen = spark.table(sink).as[(Long, String)].collect().toSet
    assert(seen == Set((10L, "a1"), (20L, "b1"), (30L, "c1")))
  }

  test("firstSeen TTL: fixed from first sight — duplicates re-arm with REMAINING time") {
    // Spark clears a key's pending timeout whenever its function runs
    // with new data, so the duplicate branch must re-arm — but with the
    // REMAINING time (first-seen + ttl − now), not a fresh ttl: the TTL
    // is measured from the FIRST occurrence and a steady duplicate
    // stream must not keep the key alive forever (r3 ADVICE).
    // TestGroupState drives the transition function deterministically —
    // a real stream + wall clock cannot pin processing-time timeouts.
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val f = Stateful.firstSeenFunc[Long, (Long, String)](ttlMs = 1000L)

    // duplicate arrival inside the TTL: suppressed, timer re-armed at
    // firstSeen + ttl (4500 + 1000), NOT now + ttl (6000)
    val dup = TestGroupState.create[Long](
      Optional.of(4500L), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 5000L,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = false)
    assert(f(10L, Iterator((10L, "dup")), dup).isEmpty)
    assert(dup.getTimeoutTimestampMs.isPresent &&
      dup.getTimeoutTimestampMs.get == 5500L,
      "duplicate must re-arm with the remaining time, keeping expiry fixed")

    // arrival AFTER the fixed TTL elapsed (timeout not yet fired):
    // treated as fresh — emitted, state restarts from now
    val stale = TestGroupState.create[Long](
      Optional.of(3000L), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 5000L,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = false)
    assert(f(10L, Iterator((10L, "late")), stale).toSeq == Seq((10L, "late")))
    assert(stale.get == 5000L && stale.getTimeoutTimestampMs.get == 6000L,
      "post-TTL arrival restarts the key's window from now")

    // first arrival: emitted and timer armed at now + ttl
    val fresh = TestGroupState.create[Long](
      Optional.empty[Long](),
      GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 5000L,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = false)
    assert(f(10L, Iterator((10L, "a1")), fresh).toSeq == Seq((10L, "a1")))
    assert(fresh.getTimeoutTimestampMs.isPresent &&
      fresh.getTimeoutTimestampMs.get == 6000L)

    // timeout firing: state removed → the key dedups afresh afterwards
    val expired = TestGroupState.create[Long](
      Optional.of(6000L), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 7000L,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = true)
    assert(f(10L, Iterator.empty, expired).isEmpty)
    assert(expired.isRemoved, "timed-out key must drop its state")
  }

  test("dedupWithinWatermark: drops dups inside the horizon, re-admits after eviction") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val mem = MemoryStream[(Long, Long)] // (docKey, eventSec)
    val df = mem.toDF().toDF("key", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = Stateful.dedupWithinWatermark(df, Seq("key"), "ts", "10 seconds")
    val sink = s"wmdedup_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, 100L), (1L, 101L)) // in-batch duplicate
      q.processAllAvailable()             // watermark → 101s − 10s = 91s
      // key 1 still in state (91 < 100+10): dup dropped; key 9 fresh
      // and pushes the watermark to 190s, past key 1's eviction point
      mem.addData((1L, 105L), (9L, 200L))
      q.processAllAvailable()
      mem.addData((1L, 300L))             // state evicted → fresh again
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(sink).selectExpr("key", "unix_seconds(ts) AS sec")
      .as[(Long, Long)].collect().toSet
    assert(rows == Set((1L, 100L), (9L, 200L), (1L, 300L)))
  }

  test("runningCount: per-key state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val out = Stateful.runningCount[String, (String, Int)](mem.toDS(), _._1)
    val sink = s"runcount_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(("u1", 1), ("u1", 2), ("u2", 3))
      q.processAllAvailable()
      mem.addData(("u1", 4))
      q.processAllAvailable()
    } finally q.stop()
    // Update-mode sink keeps the latest row per key per batch; the
    // final state for u1 must be 3 events total
    val last = spark.table(sink).as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(last == Map("u1" -> 3L, "u2" -> 1L))
  }

  test("rollingZscore stream ≡ batch twin across a mid-key micro-batch split") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      Stateful.ZPoint("A", 1, 1.0), Stateful.ZPoint("A", 2, 3.0),
      Stateful.ZPoint("A", 3, 4.0), Stateful.ZPoint("A", 4, 22.0),
      Stateful.ZPoint("B", 1, 5.0), Stateful.ZPoint("B", 2, 5.0),
      Stateful.ZPoint("B", 3, 9.0))
    val mem = MemoryStream[Stateful.ZPoint]
    val out = Stateful.rollingZscore(mem.toDS(), w = 2)
    val sink = s"zscore_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      // split MID-KEY: A's baseline for seq 3/4 must come from state
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(sink).as[Stateful.ZScore].collect()
      .map(z => (z.key, z.seq, z.zscore, z.isAnomaly)).toSet
    val batch = graft.operators.TimeSeries.rollingZscore(
        rows.toDF(), "key", Seq(col("seq")), "value", w = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Int] == 1)))
      .toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
    // the hand values from TimeSeriesSpec hold through the state carry
    assert(streamed.contains(("A", 4L, Some(26.163), Some(true))))
  }

  test("crostonForecast stream: final state EXACTLY equals the batch closed form across a mid-key split") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      Stateful.Demand("A", 1, 4.0), Stateful.Demand("A", 3, 8.0),
      Stateful.Demand("A", 6, 6.0),
      Stateful.Demand("B", 2, 9.0))
    val mem = MemoryStream[Stateful.Demand]
    val out = Stateful.crostonForecast(mem.toDS())
    val sink = s"croston_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Update).start()
    try {
      // split A's series mid-recursion; batch 2 carries the state on
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    // Update-mode memory sink appends each batch's rows: keep the
    // latest per key (max n_demands)
    val streamed = spark.table(sink).as[Stateful.CrostonOut].collect()
      .groupBy(_.key).map { case (k, vs) => vs.maxBy(_.n_demands) }
      .map(o => (o.key, o.n_demands, o.z_hat, o.a_hat, o.croston, o.sba))
      .toSet
    // TimeSeriesSpec's hand recursion: z 4,8,6 -> 6.0; iv 2,3 -> 2.5
    assert(streamed == Set(
      ("A", 3L, 6.0, Some(2.5), Some(2.4), Some(1.8)),
      ("B", 1L, 9.0, None, None, None)), s"got $streamed")
    // exact parity with the batch closed form (alpha=0.5 -> dyadic)
    val daily = rows.map(d => (d.key,
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d.day)),
      d.value)).toDF("k", "day", "v")
    val batch = graft.operators.Forecast.crostonForecast(daily, "k", "day", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    val streamZA = streamed.map(t => (t._1, t._2, t._3, t._4))
    assert(streamZA == batch, s"stream $streamZA != batch $batch")
  }

  test("decayedCounts stream ≡ batch pair-sum EXACTLY on dyadic gaps, across a mid-key split") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L // half-life seconds
    val hu = h * 1000000L
    // gaps are exact half-life multiples -> every 2^(−Δ/h) is a dyadic
    // rational -> the O(1) recursion and the pair sum agree EXACTLY:
    // A at 0,1h,2h,4h -> 1, 1.5, 1.75, 1.4375; B re-seeds after a
    // single event
    val rows = Seq(
      Stateful.DecayEvent("A", 0L, 1L),
      Stateful.DecayEvent("A", hu, 2L),
      Stateful.DecayEvent("A", 2 * hu, 3L),
      Stateful.DecayEvent("A", 4 * hu, 4L),
      Stateful.DecayEvent("B", 0L, 5L),
      Stateful.DecayEvent("B", 3 * hu, 6L))
    val mem = MemoryStream[Stateful.DecayEvent]
    val out = Stateful.decayedCounts(mem.toDS(), h)
    val sink = s"decay_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      // split MID-KEY: A's count at 2h/4h must come from carried state
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(sink).as[Stateful.DecayOut].collect()
      .map(o => (o.key, o.tUs, o.id, o.decayed_count)).toSet
    assert(streamed.contains(("A", 4 * hu, 4L, 1.4375)), s"got $streamed")
    val batchIn = rows.map(e => (e.key, e.tUs, e.id))
      .toDF("user", "t", "id")
      .select(col("user"), timestamp_micros(col("t")).as("ts"), col("id"))
    val batch = graft.operators.TimeSeries.decayedCounts(
        batchIn, "user", "ts", "id", h)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
  }

  test("cusumDrift stream: max excursions EXACTLY equal the batch fold across a mid-key split") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // the TimeSeriesSpec asymmetric-step fixture, as a stream
    val vals = (1 to 15).map(_ => 10.0) ++ (16 to 20).map(_ => 18.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      Stateful.CusumPoint("d", i + 1L, v)
    }
    // baseline = the batch operator's own (mean, sd) output — the
    // frozen model artifact the streaming detector consumes
    val batchOut = graft.operators.TimeSeries.cusumDrift(
        rows.map(p => (p.key, p.seq, p.value)).toDF("k", "o", "v"),
        "k", "o", "v")
      .select("mean", "sd", "max_cusum_up", "max_cusum_down", "drift")
      .head()
    val (mu, sd) = (batchOut.getDouble(0), batchOut.getDouble(1))
    val mem = MemoryStream[Stateful.CusumPoint]
    val out = Stateful.cusumDrift(mem.toDS(), mean = mu, sd = sd)
    val sink = s"cusum_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      // split MID-KEY right at the level shift: excursion state must
      // carry across the micro-batch boundary
      mem.addData(rows.take(16): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(16): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(sink).as[Stateful.CusumOut].collect()
      .sortBy(_.seq)
    // running max over the emitted per-event excursions == the batch
    // fold's maxima (same doubles, same rounding)
    assert(streamed.map(_.cusum_up).max == batchOut.getDouble(2),
      s"S+ max: stream ${streamed.map(_.cusum_up).max} vs batch $batchOut")
    assert(streamed.map(_.cusum_down).max == batchOut.getDouble(3))
    // the detector arms exactly when the batch says it drifted
    assert(streamed.exists(_.drift) == (batchOut.getLong(4) == 1L))
    // and arming happens DURING the shifted tail, not before it
    assert(!streamed.take(15).exists(_.drift),
      "detector must not arm before the level shift")
  }

  test("ewmaChart stream: recursion and flags EXACTLY equal the batch fold across a mid-key split") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // the TimeSeriesSpec fixture: 10,10,10,10,20 -> mu 12, sd 4.472136;
    // L=1 narrows the band so only the post-jump z violates
    val vals = Seq.fill(4)(10.0) :+ 20.0
    val rows = vals.zipWithIndex.map { case (v, i) =>
      Stateful.EwmaPoint("k", i + 1L, v)
    }
    val batch = graft.operators.TimeSeries.ewmaChart(
        rows.map(p => (p.key, p.seq, p.value)).toDF("k", "o", "v"),
        "k", "o", "v", lambda = 0.5, lSigma = 1.0)
      .head()
    val (mu, sd) = (batch.getDouble(2), batch.getDouble(3))
    val mem = MemoryStream[Stateful.EwmaPoint]
    val out = Stateful.ewmaChart(mem.toDS(), mean = mu, sd = sd,
      lambda = 0.5, lSigma = 1.0)
    val sink = s"ewma_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      // split MID-KEY right before the jump: z state must carry
      mem.addData(rows.take(4): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(4): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(sink).as[Stateful.EwmaOut].collect()
      .sortBy(_.seq)
    // final smoothed value == batch ewma_final (both 4dp of the same
    // double chain); violation count and first index == batch
    assert(streamed.last.ewma == batch.getDouble(4),
      s"final z: stream ${streamed.last.ewma} vs batch $batch")
    assert(streamed.count(_.violation) == batch.getLong(5),
      s"violations: $streamed vs $batch")
    assert(streamed.filter(_.violation).map(_.seq).headOption
      .contains(batch.getLong(6)),
      s"first violation: $streamed vs $batch")
    // hand walk: z = 11, 10.5, 10.25, 10.125, 15.0625
    assert(streamed.map(_.ewma).toSeq ==
      Seq(11.0, 10.5, 10.25, 10.125, 15.0625), s"got ${streamed.toSeq}")
  }

  test("conversionLatency stream: per-user latencies across a mid-key split, profile == batch x217 operator") {
    import org.apache.spark.sql.functions.{col, count, lit, timestamp_micros}
    implicit val sqlCtx = spark.sqlContext
    val M = 1000000L // µs per second
    // u1: click@10s -> purchase@25s (15s); a later purchase@40s must NOT
    //     re-emit; a click@5s arriving BEFORE conversion... stays in order
    // u2: purchase@3s before any click is ignored; click@8s ->
    //     purchase@8s converts at latency 0 (boundary: to >= from)
    // u3: click@1s, never converts -> no row
    // u4: clicks@20s,30s (first anchors) -> purchase@50s (30s)
    val events = Seq(
      Stateful.ConvEvent("u1", 10 * M, "click"),
      Stateful.ConvEvent("u2", 3 * M, "purchase"),
      Stateful.ConvEvent("u2", 8 * M, "click"),
      Stateful.ConvEvent("u3", 1 * M, "click"),
      Stateful.ConvEvent("u4", 20 * M, "click"),
      // ---- micro-batch split lands HERE: u1/u2/u4 state must carry
      Stateful.ConvEvent("u2", 8 * M, "purchase"),
      Stateful.ConvEvent("u1", 25 * M, "purchase"),
      Stateful.ConvEvent("u4", 30 * M, "click"),
      Stateful.ConvEvent("u1", 40 * M, "purchase"),
      Stateful.ConvEvent("u4", 50 * M, "purchase"))
    val mem = MemoryStream[Stateful.ConvEvent]
    val out = Stateful.conversionLatency(mem.toDS(), "click", "purchase")
    val sink = s"conv_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(events.take(5): _*)
      q.processAllAvailable()
      mem.addData(events.drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(sink).as[Stateful.ConvOut].collect()
      .sortBy(_.user)
    assert(streamed.map(o => (o.user, o.latency_seconds)).toSeq ==
      Seq(("u1", 15.0), ("u2", 0.0), ("u4", 30.0)),
      s"got ${streamed.toSeq}")
    // the batch x217 profile over the same events == the exact-quantile
    // rollup of the streamed per-user latencies
    val batchIn = events.map(e => (e.user, e.tsMicros, e.eventType))
      .toDF("user", "t", "et")
      .select(col("user"), timestamp_micros(col("t")).as("ts"), col("et"))
    val batch = graft.operators.TimeSeries.conversionLatency(
        batchIn, "user", "ts", "et", "click", "purchase")
      .head()
    val lat = streamed.map(_.latency_seconds).toSeq.toDF("__lat")
    val profile = graft.operators.Profiling.groupedExactQuantiles(
        lat, Seq(), col("__lat"),
        Seq("p50" -> 0.5, "p90" -> 0.9))
      .crossJoin(lat.agg(count(lit(1)).as("n")))
      .select(col("n"), col("p50").cast("double"), col("p90").cast("double"))
      .head()
    assert(profile.getLong(0) == batch.getLong(0) &&
      profile.getDouble(1) == batch.getDouble(1) &&
      profile.getDouble(2) == batch.getDouble(2),
      s"stream rollup $profile != batch operator $batch")
  }

  test("bandCountsMonitor rollup ≡ batch gainsTable EXACTLY across a mid-stream split") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val pts = (1 to 40).map(i => Stateful.ScoredPoint(
      i.toLong, (i * 7 % 40).toDouble, if (i % 5 == 0) 1L else 0L))
    val df = pts.toDF()
    val batch = graft.operators.Evaluation.gainsTable(
        df, col("score"), col("label"), k = 4)
      .orderBy("band").collect().toSeq
    // frozen cutoffs = the same exact-quantile pass gainsTable runs
    val cutRow = graft.operators.Profiling.groupedExactQuantiles(
      df.select(col("score").cast("double").as("__s")), Seq(), col("__s"),
      (1 until 4).map(i => s"q$i" -> i / 4.0)).head()
    val cuts = (1 until 4).map(i => cutRow.getDecimal(i - 1).doubleValue)
    val mem = MemoryStream[Stateful.ScoredPoint]
    val out = Stateful.bandCountsMonitor(mem.toDS(), cuts)
    val sink = s"gainsmon_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(pts.take(17): _*) // mid-stream split: bands straddle
      q.processAllAvailable()
      mem.addData(pts.drop(17): _*)
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table(sink).as[Stateful.BucketCount].collect()
      .groupBy(_.bucket).map(_._2.maxBy(_.through_seq)).toSeq
    val rolled = graft.operators.Evaluation.gainsFromBandCounts(
        latest.map(r => (r.bucket, r.n, r.n_pos))
          .toDF("band", "n", "n_pos"), 6)
      .orderBy("band").collect().toSeq
    assert(rolled == batch, s"stream rollup $rolled != batch $batch")
  }

  test("binCountsMonitor rollup ≡ batch averagePrecision(bins) EXACTLY across a split") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // continuous scores (every value distinct) — AP's primary shape
    val pts = (0 until 60).map(i => Stateful.ScoredPoint(
      i.toLong, i * 0.37 + 1.0 / (i + 1), if (i % 7 == 0) 1L else 0L))
    val df = pts.toDF()
    val batch = graft.operators.Evaluation.averagePrecision(
      df, col("label") === 1L, col("score"), bins = 8).collect().toSeq
    val lo = pts.map(_.score).min; val hi = pts.map(_.score).max
    val mem = MemoryStream[Stateful.ScoredPoint]
    val out = Stateful.binCountsMonitor(mem.toDS(), lo, hi, bins = 8)
    val sink = s"apmon_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(pts.take(23): _*)
      q.processAllAvailable()
      mem.addData(pts.drop(23): _*)
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table(sink).as[Stateful.BucketCount].collect()
      .groupBy(_.bucket).map(_._2.maxBy(_.through_seq)).toSeq
    // bucket id back to the batch quantize key (bin id as double)
    val rolled = graft.operators.Evaluation.apFromScoreCounts(
      latest.map(r => (r.bucket.toDouble, r.n, r.n_pos))
        .toDF("__s", "__n", "__p"), 6).collect().toSeq
    assert(rolled == batch, s"stream rollup $rolled != batch $batch")
  }

  test("armCountsMonitor rollup ≡ batch srmCheck EXACTLY across a mid-stream split") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // 60/40 against a 50/50 design — the hand chi = 4.0 > 3.841 case,
    // interleaved so both arms straddle the split; plus an
    // out-of-design arm value the monitor must carry and the rollup
    // must ignore (batch parity includes the ignore rule)
    val arms = (0 until 100).map(i => if (i % 5 < 3) "A" else "B") :+ "junk"
    val events = arms.zipWithIndex.map { case (a, i) =>
      Stateful.ArmEvent(i.toLong, a) }
    val batch = graft.operators.Evaluation.srmCheck(
      arms.toDF("arm"), col("arm"), Seq(("A", 0.5), ("B", 0.5)))
      .collect().toSeq
    val mem = MemoryStream[Stateful.ArmEvent]
    val out = Stateful.armCountsMonitor(mem.toDS())
    val sink = s"srm_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(events.take(41): _*)
      q.processAllAvailable()
      mem.addData(events.drop(41): _*)
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table(sink).as[Stateful.ArmCount].collect()
      .groupBy(_.arm).map(_._2.maxBy(_.through_seq)).toSeq
    val rolled = graft.operators.Evaluation.srmFromArmCounts(
      latest.map(c => (c.arm, c.n)).toDF("__arm", "__n"),
      Seq(("A", 0.5), ("B", 0.5))).collect().toSeq
    assert(rolled == batch, s"stream rollup $rolled != batch $batch")
    assert(rolled.head.getInt(3) == 1, s"the 60/40 split must flag: $rolled")
  }

  test("cmhCellsMonitor rollup ≡ batch cmhTest EXACTLY across a mid-stream split") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // EvaluationSpec's hand fixture (chi2 = 1/0.7, OR = 7) plus a
    // single-subject stratum (E contributes, variance doesn't),
    // interleaved so every stratum straddles the split
    val rows = Seq(
      ("A", true, true), ("B", true, true), ("A", true, true),
      ("B", true, false), ("A", true, false), ("B", false, false),
      ("A", false, true), ("B", false, false), ("A", false, false),
      ("C", true, true), ("A", false, false))
    val batch = graft.operators.Evaluation.cmhTest(
      rows.toDF("s", "t", "y"), col("s"), col("t"), col("y"))
      .collect().toSeq
    val events = rows.zipWithIndex.map { case ((s, t, y), i) =>
      Stateful.StratumEvent(i.toLong, s, t, y) }
    val mem = MemoryStream[Stateful.StratumEvent]
    val out = Stateful.cmhCellsMonitor(mem.toDS())
    val sink = s"cmh_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(events.take(5): _*)
      q.processAllAvailable()
      mem.addData(events.drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table(sink).as[Stateful.CmhCell].collect()
      .groupBy(_.stratum).map(_._2.maxBy(_.through_seq)).toSeq
    val rolled = graft.operators.Evaluation.cmhFromCells(
      latest.map(c => (c.stratum, c.n, c.r1, c.c1, c.a))
        .toDF("__s", "__n", "__r1", "__c1", "__a")).collect().toSeq
    assert(rolled == batch, s"stream rollup $rolled != batch $batch")
  }

  test("benfordDigitMonitor rollup ≡ batch benford EXACTLY across a mid-stream split") {
    implicit val sqlCtx = spark.sqlContext
    // geometric-ish spread hits every leading digit; junk rows pin the
    // support filter's batch parity; 0.005 pins the cent-rounding edge
    val vals = (1 to 300).map(i => (i * i).toDouble * 0.137) ++
      Seq(0.005, 0.004, 0.0, -7.5)
    val batch = graft.operators.Profiling.benford(vals.toDF("v"), "v")
      .orderBy("digit").collect().toSeq
    val events = vals.zipWithIndex.map { case (v, i) =>
      Stateful.DdPoint(i.toLong, v) }
    val mem = MemoryStream[Stateful.DdPoint]
    val out = Stateful.benfordDigitMonitor(mem.toDS())
    val sink = s"bf_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(events.take(120): _*)
      q.processAllAvailable()
      mem.addData(events.drop(120): _*)
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table(sink).as[Stateful.DigitCount].collect()
      .groupBy(_.digit).map(_._2.maxBy(_.through_seq)).toSeq
    val rolled = graft.operators.Profiling.benfordFromDigitCounts(
      latest.map(c => (c.digit, c.n)).toDF("digit", "n"))
      .orderBy("digit").collect().toSeq
    assert(rolled == batch, s"stream rollup $rolled != batch $batch")
  }

  test("ddBucketMonitor rollup ≡ batch ddsketchQuantiles EXACTLY across a mid-stream split") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // wrapping residues spread values over ~2 decades; junk rows pin
    // the support filter's batch parity
    val vals = (1 to 400).map(i => (i % 97 + 1).toDouble * 1.37) ++
      Seq(-3.0, 0.0)
    val batch = graft.operators.Sketch.ddsketchQuantiles(
      vals.toDF("v"), col("v"), alpha = 0.02, qs = Seq(0.5, 0.9))
      .collect().toSeq
    val events = vals.zipWithIndex.map { case (v, i) =>
      Stateful.DdPoint(i.toLong, v) }
    val mem = MemoryStream[Stateful.DdPoint]
    val out = Stateful.ddBucketMonitor(mem.toDS(), alpha = 0.02)
    val sink = s"dd_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(events.take(150): _*)
      q.processAllAvailable()
      mem.addData(events.drop(150): _*)
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table(sink).as[Stateful.DdBucket].collect()
      .groupBy(_.bucket).map(_._2.maxBy(_.through_seq)).toSeq
    val rolled = graft.operators.Sketch.ddQuantilesFromBuckets(
      latest.map(b => (b.bucket, b.c)).toDF("__i", "__c"),
      alpha = 0.02, qs = Seq(0.5, 0.9)).collect().toSeq
    assert(rolled == batch, s"stream rollup $rolled != batch $batch")
  }

  test("pageHinkleyMonitor final emission ≡ batch pageHinkley EXACTLY across a mid-stream split") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // key "a": planted upward mean shift at t = 20 (0-level noise then
    // +1.5 level) — must alarm; key "b": stationary noise — must not.
    // Fractional values exercise the scale-6 quantization.
    def noise(i: Int): Double = (i % 5 - 2) * 0.137
    val rows =
      (0 until 40).map(i => ("a", i.toLong,
        noise(i) + (if (i >= 20) 1.5 else 0.0))) ++
      (0 until 40).map(i => ("b", i.toLong, noise(i)))
    val batch = graft.operators.TimeSeries.pageHinkley(
        rows.toDF("key", "ord", "value"), "key", "ord", "value",
        delta = 0.05, lambda = 2.0)
      .orderBy("key")
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(batch.map(_._3) == Seq(1L, 0L),
      s"fixture must alarm on a and not b: $batch")
    val pts = rows.map { case (k, i, v) => Stateful.CusumPoint(k, i, v) }
    val mem = MemoryStream[Stateful.CusumPoint]
    val out = Stateful.pageHinkleyMonitor(mem.toDS(), delta = 0.05,
      lambda = 2.0)
    val sink = s"phmon_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      // split INSIDE a's pre-shift segment and b's series: the running
      // mean must fold seamlessly across the state boundary
      mem.addData(pts.take(33): _*)
      q.processAllAvailable()
      mem.addData(pts.drop(33): _*)
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table(sink).as[Stateful.PhOut].collect()
      .groupBy(_.key).map(_._2.maxBy(_.seq)).toSeq.sortBy(_.key)
      .map(o => (o.key, o.ph_stat, if (o.detected) 1L else 0L))
    assert(latest == batch, s"stream final $latest != batch $batch")
  }

  test("msprtMomentsMonitor rollup ≡ batch msprt EXACTLY across a mid-stream split") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // planted small effect + fractional values that exercise the
    // scale-6 quantization (i*0.013 has no finite binary expansion)
    val rows = (0 until 80).map { i =>
      Stateful.ArmValue(i.toLong, i % 2 == 0,
        (if (i % 2 == 0) 0.25 else 0.0) + i * 0.013 % 1.7)
    }
    val batch = graft.operators.Evaluation.msprt(
      rows.toDF("seq", "treat", "value"),
      col("treat"), !col("treat"), col("value"),
      tau = 0.5, alpha = 0.05).collect().toSeq
    val mem = MemoryStream[Stateful.ArmValue]
    val out = Stateful.msprtMomentsMonitor(mem.toDS())
    val sink = s"msprt_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(rows.take(33): _*) // split mid-arm: both arms straddle
      q.processAllAvailable()
      mem.addData(rows.drop(33): _*)
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table(sink).as[Stateful.ArmMoments].collect()
      .groupBy(_.treat).map(_._2.maxBy(_.through_seq)).toSeq
    val t = latest.find(_.treat).get
    val c = latest.find(!_.treat).get
    // latest per-arm emissions onto msprtMoments' schema -> the EXACT
    // batch statistic chain
    val m = Seq((t.n, c.n, t.sum6, c.sum6, t.sumsq12, c.sumsq12))
      .toDF("__na", "__nb", "__sa", "__sb", "__saa", "__sbb")
    val rolled = graft.operators.Evaluation.msprtFromMoments(
      m, tau = 0.5, alpha = 0.05).collect().toSeq
    assert(rolled == batch, s"stream rollup $rolled != batch $batch")
  }

  test("msprt live monitor crosses the α boundary MID-STREAM at the " +
      "exact micro-batch the batch replay decides (the always-valid " +
      "decision-time contract)") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // planted RAMP-IN effect: no treatment lift for the first 60
    // rows, +0.8 afterwards — early micro-batches must NOT reject,
    // later ones must, so the boundary crossing happens strictly
    // mid-stream. Values are deterministic fractions that exercise
    // the scale-6 quantization.
    val rows = (0 until 200).map { i =>
      val base = (i * 0.013) % 0.9
      val lift = if (i % 2 == 0 && i >= 60) 0.8 else 0.0
      Stateful.ArmValue(i.toLong, i % 2 == 0, base + lift)
    }
    val batchSize = 20
    val batches = rows.grouped(batchSize).toSeq
    def rollup(moments: Seq[Stateful.ArmMoments]): (Double, Int) = {
      val t = moments.find(_.treat).get
      val c = moments.find(!_.treat).get
      val m = Seq((t.n, c.n, t.sum6, c.sum6, t.sumsq12, c.sumsq12))
        .toDF("__na", "__nb", "__sa", "__sb", "__saa", "__sbb")
      val r = graft.operators.Evaluation
        .msprtFromMoments(m, tau = 0.5, alpha = 0.05).collect().head
      (r.getAs[Double]("p_always_valid"), r.getAs[Int]("reject"))
    }
    val mem = MemoryStream[Stateful.ArmValue]
    val out = Stateful.msprtMomentsMonitor(mem.toDS())
    val sink = s"msprt_cross_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    val streamDecisions =
      try {
        batches.map { b =>
          mem.addData(b: _*)
          q.processAllAvailable()
          val latest = spark.table(sink).as[Stateful.ArmMoments]
            .collect().groupBy(_.treat)
            .map(_._2.maxBy(_.through_seq)).toSeq
          rollup(latest)
        }
      } finally q.stop()
    // batch replay: the SAME statistic on each prefix the dashboard
    // would have seen
    val batchDecisions = batches.indices.map { k =>
      val prefix = rows.take((k + 1) * batchSize)
      val r = graft.operators.Evaluation.msprt(
        prefix.toDF("seq", "treat", "value"),
        col("treat"), !col("treat"), col("value"),
        tau = 0.5, alpha = 0.05).collect().head
      (r.getAs[Double]("p_always_valid"), r.getAs[Int]("reject"))
    }
    assert(streamDecisions == batchDecisions,
      s"stream $streamDecisions != batch replay $batchDecisions")
    val firstCross = streamDecisions.indexWhere(_._2 == 1)
    // strictly mid-stream: not the first batch, not never
    assert(firstCross > 0, s"crossed on the first batch: $streamDecisions")
    assert(firstCross < batches.size - 1,
      s"never crossed mid-stream: $streamDecisions")
    // before the crossing the always-valid p sits above α, after it
    // the decision HOLDS (always-valid tests never un-reject here:
    // lnΛ keeps growing with the planted effect)
    assert(streamDecisions.take(firstCross).forall(_._1 > 0.05))
    assert(streamDecisions.drop(firstCross).forall(_._2 == 1),
      s"decision did not hold: $streamDecisions")
  }

  test("hllRegisterMonitor: live registers ≡ batch table, rollup ≡ batch estimate") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val keys = (1 to 500).map(i => s"doc_${i % 320}")
    val events = keys.zipWithIndex.map { case (k, i) =>
      Stateful.CmsEvent(i.toLong, k) }
    val mem = MemoryStream[Stateful.CmsEvent]
    val out = Stateful.hllRegisterMonitor(mem.toDS(), m = 128)
    val sink = s"hll_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(events.take(180): _*)
      q.processAllAvailable()
      mem.addData(events.drop(180): _*)
      q.processAllAvailable()
    } finally q.stop()
    // latest emission per register == the batch register table
    val latest = spark.table(sink).as[Stateful.HllRegister].collect()
      .groupBy(_.bucket).map(_._2.maxBy(_.through_seq))
      .map(r => (r.bucket, r.max_rank)).toSet
    val batch = graft.operators.Sketch.hllRegisterTable(
        keys.toDF("key"), col("key"), m = 128)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(latest == batch, s"streamed registers != batch:\n$latest\nvs\n$batch")
    // rolling the LIVE table through the exact batch finishing chain
    // reproduces the batch estimate bit-for-bit
    val live = latest.toSeq.toDF("__b", "__r")
    val streamEst = graft.operators.Sketch
      .hllEstimateFromRegisters(live, m = 128)
      .collect().head.getAs[Double]("estimate")
    val batchEst = graft.operators.Sketch.hllDistinct(
        keys.toDF("key"), col("key"), m = 128)
      .collect().head.getAs[Double]("estimate")
    assert(streamEst == batchEst,
      s"stream rollup $streamEst != batch $batchEst")
  }

  test("bootstrapMomentsMonitor: live resample sums ≡ batch accumulators") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val rows = (1 to 200).map(i => (s"r$i", (i % 13).toDouble))
    val events = rows.zipWithIndex.map { case ((k, v), i) =>
      Stateful.KeyedValue(i.toLong, k, v) }
    val mem = MemoryStream[Stateful.KeyedValue]
    val out = Stateful.bootstrapMomentsMonitor(mem.toDS(), b = 41)
    val sink = s"boot_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(events.take(90): _*)
      q.processAllAvailable()
      mem.addData(events.drop(90): _*)
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table(sink).as[Stateful.ResampleSum].collect()
      .groupBy(_.b).map(_._2.maxBy(_.through_seq))
      .map(r => (r.b, r.n,
        r.sum6.setScale(6).stripTrailingZeros)).toSet
    // batch accumulators: re-derive (Σw, Σw·v) per resample from the
    // same weights and the mean frame's inputs
    val batch = graft.operators.Evaluation.bootstrapMeans(
        rows.toDF("k", "v"), col("k"), col("v"), b = 41)
    // means agree ⇒ sums agree; also check the raw fold directly
    val direct = (0 until 41).map { j =>
      val ws = rows.map { case (k, v) =>
        (graft.operators.Evaluation.poissonWeightOf(j, k), v) }
      (j, ws.map(_._1).sum,
        ws.map { case (w, v) => java.math.BigDecimal.valueOf(v)
          .setScale(6, java.math.RoundingMode.HALF_UP)
          .multiply(java.math.BigDecimal.valueOf(w)) }
          .foldLeft(java.math.BigDecimal.ZERO.setScale(6))(_.add(_))
          .stripTrailingZeros)
    }.toSet
    assert(latest == direct, s"streamed sums != direct fold")
    val batchMeans = batch.collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    latest.foreach { case (j, n, s) =>
      assert(s.doubleValue() / n == batchMeans(j),
        s"resample $j: live mean != batch mean") }
  }

  test("amsSignSumMonitor: live sign-sums ≡ batch, median(S²) ≡ batch estimate") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val keys = (1 to 120).map(i => s"k${i % 37}")
    val events = keys.zipWithIndex.map { case (k, i) =>
      Stateful.CmsEvent(i.toLong, k) }
    val mem = MemoryStream[Stateful.CmsEvent]
    val out = Stateful.amsSignSumMonitor(mem.toDS(), depth = 5)
    val sink = s"ams_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(events.take(50): _*)
      q.processAllAvailable()
      mem.addData(events.drop(50): _*)
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table(sink).as[Stateful.AmsSum].collect()
      .groupBy(_.j).map(_._2.maxBy(_.through_seq))
      .map(r => (r.j, r.s)).toSet
    val batch = graft.operators.Sketch.amsSignSums(
        keys.toDF("key"), col("key"), depth = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(latest == batch, s"streamed sums != batch:\n$latest\nvs\n$batch")
    // median of S² over the live sums == the batch F2 estimate
    val liveEst = latest.map(t => t._2 * t._2).toSeq.sorted.apply(2).toDouble
    val batchEst = graft.operators.Sketch.amsF2(
        keys.toDF("key"), col("key"), depth = 5)
      .collect().head.getAs[Double]("f2_estimate")
    assert(liveEst == batchEst, s"live median $liveEst != batch $batchEst")
  }

  test("countMinMonitor: live counter table ≡ batch counterTable, probe ≡ batch estimates") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val keys = (1 to 60).map(i => s"k${i % 9}")
    val events = keys.zipWithIndex.map { case (k, i) =>
      Stateful.CmsEvent(i.toLong, k) }
    val mem = MemoryStream[Stateful.CmsEvent]
    val out = Stateful.countMinMonitor(mem.toDS(), depth = 3, width = 16)
    val sink = s"cms_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(events.take(25): _*)
      q.processAllAvailable()
      mem.addData(events.drop(25): _*)
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table(sink).as[Stateful.CmsCell].collect()
      .groupBy(c => (c.j, c.bucket)).map(_._2.maxBy(_.through_seq))
      .map(c => (c.j, c.bucket, c.n)).toSet
    val batch = graft.operators.Sketch.counterTable(
        keys.toDF("key"), col("key"), depth = 3, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(latest == batch, s"streamed cells != batch counters:\n$latest\nvs\n$batch")
    // probe: MIN across seeds over the LIVE table == batch estimates
    val batchEst = graft.operators.Sketch.countMinFrequencies(
        keys.toDF("key"), col("key"), Seq("k0", "k4"), depth = 3, width = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def probeLive(key: String): Long =
      (0 until 3).map { j =>
        val b = graft.operators.Sketch.bucketOf(j, key, 16)
        latest.find(c => c._1 == j && c._2 == b).map(_._3).getOrElse(0L)
      }.min
    assert(probeLive("k0") == batchEst("k0") &&
      probeLive("k4") == batchEst("k4"),
      s"live probe != batch estimate")
  }

  test("binCountsMonitor rollup ≡ batch hellingerDrift EXACTLY " +
      "across a mid-stream split") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val base = Seq(1.0, 1.0, 2.0, 3.0)
    val cur = Seq(1.0, 2.0, 2.0, 3.0, 3.0)
    // batch: bins = 0 -> cells keyed by the raw values, so the live
    // per-value counters ARE the batch cells
    val batchDf = (base.map((_, true)) ++ cur.map((_, false)))
      .toDF("v", "a")
    val batch = graft.operators.Evaluation.hellingerDrift(batchDf,
      col("v"), col("a"), bins = 0).collect().toSeq
    val events = cur.zipWithIndex.map { case (v, i) =>
      Stateful.BinEvent(i.toLong, v) }
    val mem = MemoryStream[Stateful.BinEvent]
    val out = Stateful.binCountsMonitor(mem.toDS())
    val sink = s"bins_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(events.take(2): _*)
      q.processAllAvailable()
      mem.addData(events.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val live = spark.table(sink).as[Stateful.BinCount].collect()
      .groupBy(_.bin).map { case (b, cs) => b -> cs.maxBy(_.through_seq) }
      .toMap
    val baseCounts = base.groupBy(identity).map { case (v, vs) =>
      v -> vs.size.toLong }
    val cells = (baseCounts.keySet ++ live.keySet).toSeq.map { b =>
      (b, baseCounts.getOrElse(b, 0L), live.get(b).map(_.n).getOrElse(0L))
    }.toDF("__b", "__na", "__nb")
    val rolled = graft.operators.Evaluation.hellingerFromCells(cells)
      .collect().toSeq
    assert(rolled == batch, s"stream rollup $rolled != batch $batch")
  }

  test("momentsMonitor rollup ≡ batch featureDriftReport EXACTLY " +
      "across a mid-stream split") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val base = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 7.0))
    val cur = Seq((3.0, 5.0), (4.0, 7.0), (5.0, 7.0))
    val batchDf = (base.map { case (a, b) => (true, a, b) } ++
      cur.map { case (a, b) => (false, a, b) }).toDF("inBase", "a", "b")
    val batch = graft.operators.Profiling.featureDriftReport(
      batchDf, Seq("a", "b"), col("inBase")).collect().toSeq
    // live side: only the current era streams; base is frozen moments
    val events = cur.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(Stateful.MomentEvent(i.toLong * 2, "a", a),
        Stateful.MomentEvent(i.toLong * 2 + 1, "b", b)) }
    val mem = MemoryStream[Stateful.MomentEvent]
    val out = Stateful.momentsMonitor(mem.toDS())
    val sink = s"mom_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(events.take(3): _*)
      q.processAllAvailable()
      mem.addData(events.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    val live = spark.table(sink).as[Stateful.MomentCell].collect()
      .groupBy(_.column).map(_._2.maxBy(_.through_seq)).toSeq
    val baseCells = base.map { case (a, b) => ("a", a) -> ("b", b) }
      .flatMap { case (x, y) => Seq(x, y) }
      .groupBy(_._1).map { case (c, vs) =>
        (c, true, vs.size.toLong, vs.map(_._2).sum,
          vs.map(v => v._2 * v._2).sum) }.toSeq
    val cells = (baseCells ++ live.map(m =>
        (m.column, false, m.n, m.s, m.s2)))
      .toDF("__c", "__b", "__n", "__s", "__s2")
    val rolled = graft.operators.Profiling.smdFromMomentCells(cells)
      .collect().toSeq
    assert(rolled == batch, s"stream rollup $rolled != batch $batch")
  }

  test("prefPairsMonitor rollup ≡ batch bradleyTerry AND " +
      "positionalBias EXACTLY across a mid-stream split") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // AnnotationSpec's MM fixture, interleaved so every pair
    // straddles the split
    val comps = Seq(("A", "B", true), ("A", "C", true), ("B", "C", true),
      ("A", "B", true), ("B", "C", false), ("A", "B", true),
      ("A", "C", true), ("B", "C", true), ("A", "B", false),
      ("B", "C", false))
    val batchBt = graft.operators.Annotation.bradleyTerry(
      comps.toDF("a", "b", "w"), col("a"), col("b"), col("w"),
      iters = 8).orderBy("rank").collect().toSeq
    val batchPb = graft.operators.Annotation.positionalBias(
      comps.toDF("a", "b", "w").select(col("w").as("fw")), col("fw"))
      .collect().toSeq
    val events = comps.zipWithIndex.map { case ((a, b, w), i) =>
      Stateful.PrefEvent(i.toLong, a, b, w) }
    val mem = MemoryStream[Stateful.PrefEvent]
    val out = Stateful.prefPairsMonitor(mem.toDS())
    val sink = s"pref_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(events.take(4): _*)
      q.processAllAvailable()
      mem.addData(events.drop(4): _*)
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table(sink).as[Stateful.PrefPairCount].collect()
      .groupBy(c => (c.e, c.o)).map(_._2.maxBy(_.through_seq)).toSeq
    val ents = latest.groupBy(_.e).map { case (e, cs) =>
      (e, cs.map(_.wins).sum, cs.map(_.games).sum) }.toSeq
      .toDF("__e", "__wins", "__games")
    val pairs = latest.map(c => (c.e, c.o, c.games))
      .toDF("__e", "__o", "__n")
    val rolledBt = graft.operators.Annotation.bradleyTerryFromCounts(
      ents, pairs, iters = 8, quantDigits = 9, roundDigits = 6,
      scope = graft.util.CacheScope.unmanaged)
      .orderBy("rank").collect().toSeq
    assert(rolledBt == batchBt, s"stream BT $rolledBt != batch $batchBt")
    val rolledPb = graft.operators.Annotation.positionalBiasFromAgg(
      Seq((latest.map(_.first_games).sum, latest.map(_.first_wins).sum))
        .toDF("trials", "first_wins")).collect().toSeq
    assert(rolledPb == batchPb, s"stream PB $rolledPb != batch $batchPb")
  }

  test("postingsMonitor: live rollup ≡ batch bm25Index on the deduped " +
      "corpus, and the query-table probe over it returns the batch " +
      "top-k exactly (redelivery emits nothing; r18)") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "d1", "cat sat on the mat cat"),
      (2L, "d2", "dog sat on a log"),
      (3L, "d3", "a cat and a dog"),
      (4L, "d4", "the mat the log the cat"))
      .map { case (s, id, t) => Stateful.DocEvent(s, id, t) }
    val mem = MemoryStream[Stateful.DocEvent]
    val out = Stateful.postingsMonitor(mem.toDS())
    val sink = s"postings_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(docs.take(2): _*)
      q.processAllAvailable()
      // second batch REDELIVERS d1 (must emit nothing) + two new docs
      mem.addData(Stateful.DocEvent(9L, "d1", "cat sat on the mat cat"))
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val emits = spark.table(sink).as[Stateful.PostingEmit].collect()
    assert(!emits.exists(e => e.doc_id == "d1" && e.through_seq == 9L),
      s"the redelivered d1 must not re-emit: ${emits.toSeq}")
    val livePostings = emits.map(e => (e.term, e.doc_id, e.tf))
      .sortBy(x => (x._1, x._2)).toSeq
    val liveLens = emits.map(e => (e.doc_id, e.dl)).distinct
      .sortBy(_._1).toSeq
    val (bp, bl) = graft.operators.TextAnalysis.bm25Index(
      docs.map(d => (d.docId, d.text)).toDF("doc_id", "text"),
      "doc_id", "text")
    val batchPostings = bp.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    val batchLens = bl.collect()
      .map(r => (r.getString(0), r.getInt(1).toLong)).sortBy(_._1).toSeq
    assert(livePostings == batchPostings,
      s"live $livePostings != batch $batchPostings")
    assert(liveLens == batchLens, s"live $liveLens != batch $batchLens")
    // the probe over the live rollup = the probe over the batch index
    val queries = Seq((1L, "cat mat"), (2L, "dog log")).toDF("qid", "qt")
    def topk(p: org.apache.spark.sql.DataFrame,
        l: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.bm25TopDocsForQueries(p, l,
          queries, "qid", "qt", topK = 5)
        .orderBy(col("query_id"), col("bm25").desc, col("doc_id"))
        .collect().toSeq
    val liveP = livePostings.toDF("term", "doc_id", "tf")
    val liveL = liveLens.toDF("doc_id", "dl")
    assert(topk(liveP, liveL) == topk(bp, bl),
      "the live index must score identically to the batch index")
  }

  test("postingsMonitorVersioned: a mid-stream document REVISION " +
      "retracts old postings and inserts new ones — rollup ≡ batch " +
      "bm25Index REBUILD on the latest-version corpus, probe ≡ batch; " +
      "stale and identical redeliveries emit nothing (r18 #2)") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Stateful.DocEvent]
    val out = Stateful.postingsMonitorVersioned(mem.toDS())
    val sink = s"postings_v_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Stateful.DocEvent(1L, "d1", "cat sat on the mat cat"),
        Stateful.DocEvent(2L, "d2", "dog sat on a log"))
      q.processAllAvailable()
      // batch 2: d1 is RE-CRAWLED with changed text (seq 10), d2 is
      // redelivered identically (must emit nothing), d3 is new
      mem.addData(Stateful.DocEvent(10L, "d1", "cat naps on a rug"),
        Stateful.DocEvent(2L, "d2", "dog sat on a log"),
        Stateful.DocEvent(3L, "d3", "a cat and a dog"))
      q.processAllAvailable()
      // batch 3: STALE redelivery of d1's superseded version (seq 1 <
      // accepted 10 — ignored), plus a new d4
      mem.addData(Stateful.DocEvent(1L, "d1", "cat sat on the mat cat"),
        Stateful.DocEvent(4L, "d4", "the mat the log the cat"))
      q.processAllAvailable()
    } finally q.stop()
    val emits = spark.table(sink).as[Stateful.PostingEmit].collect()
    // the revision really retracts: "mat" leaves d1 with a negative
    // delta at the revision's seq
    assert(emits.exists(e => e.doc_id == "d1" && e.term == "mat" &&
      e.tf < 0 && e.through_seq == 10L),
      s"expected a retraction row for d1/mat: ${emits.toSeq}")
    // the stale redelivery emitted nothing (no row can carry the old
    // text's terms at through_seq 1 beyond the first batch's inserts)
    assert(emits.count(e => e.doc_id == "d1" && e.through_seq == 1L &&
      e.term == "mat") == 1,
      s"the stale redelivery must not re-emit: ${emits.toSeq}")
    // identical redelivery of d2: exactly one generation of d2 rows
    assert(emits.filter(_.doc_id == "d2").map(_.through_seq).distinct
      .length == 1, s"d2 must emit once: ${emits.toSeq}")
    // live rollup = sum of deltas (keep > 0); lens = dl of the
    // max-through_seq row per doc
    val livePostings = emits.groupBy(e => (e.term, e.doc_id))
      .map { case ((t, d), rs) => (t, d, rs.map(_.tf).sum) }
      .filter(_._3 > 0L).toSeq.sortBy(x => (x._1, x._2))
    val liveLens = emits.groupBy(_.doc_id)
      .map { case (d, rs) => (d, rs.maxBy(_.through_seq).dl) }
      .toSeq.sortBy(_._1)
    // batch rebuild over the LATEST-version corpus
    val latest = Seq(("d1", "cat naps on a rug"),
      ("d2", "dog sat on a log"), ("d3", "a cat and a dog"),
      ("d4", "the mat the log the cat"))
    val (bp, bl) = graft.operators.TextAnalysis.bm25Index(
      latest.toDF("doc_id", "text"), "doc_id", "text")
    val batchPostings = bp.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    val batchLens = bl.collect()
      .map(r => (r.getString(0), r.getInt(1).toLong)).sortBy(_._1).toSeq
    assert(livePostings == batchPostings,
      s"live $livePostings != batch $batchPostings")
    assert(liveLens == batchLens, s"live $liveLens != batch $batchLens")
    // probe over the live rollup = probe over the batch rebuild
    val queries = Seq((1L, "cat mat"), (2L, "dog rug")).toDF("qid", "qt")
    def topk(p: org.apache.spark.sql.DataFrame,
        l: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.bm25TopDocsForQueries(p, l,
          queries, "qid", "qt", topK = 5)
        .orderBy(col("query_id"), col("bm25").desc, col("doc_id"))
        .collect().toSeq
    val liveP = livePostings.toDF("term", "doc_id", "tf")
    val liveL = liveLens.toDF("doc_id", "dl")
    assert(topk(liveP, liveL) == topk(bp, bl),
      "the live index must score identically to the batch rebuild")
  }

  test("membershipDeltaMonitor: delta rollup ≡ batch community sizes, " +
      "live JSD vs the frozen baseline ≡ batch jensenShannon EXACTLY " +
      "across a mid-stream split (r17 verdict #8)") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // frozen baseline histogram: the sizes at freeze time
    val baseline = Seq("A" -> 3L, "B" -> 3L, "C" -> 2L)
    val init = Seq(("n1", "A"), ("n2", "A"), ("n3", "A"), ("n4", "B"),
      ("n5", "B"), ("n6", "B"), ("n7", "C"), ("n8", "C"))
      .zipWithIndex.map { case ((n, c), i) =>
        Stateful.MemberEvent(i + 1L, n, c) }
    // drift batch: n7 C→A; n8 chains C→B→A inside ONE batch (must
    // collapse to the net C→A move); n1 re-asserts A (no delta)
    val drift = Seq(
      Stateful.MemberEvent(20L, "n7", "A"),
      Stateful.MemberEvent(21L, "n8", "B"),
      Stateful.MemberEvent(22L, "n8", "A"),
      Stateful.MemberEvent(23L, "n1", "A"))
    val mem = MemoryStream[Stateful.MemberEvent]
    val out = Stateful.membershipDeltaMonitor(mem.toDS())
    val sink = s"commdrift_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(init: _*)
      q.processAllAvailable()
      mem.addData(drift: _*)
      q.processAllAvailable()
    } finally q.stop()
    val deltas = spark.table(sink).as[Stateful.MembershipDelta].collect()
    // init: 8 enters; drift: (C,−1)(A,+1) for n7 + the COLLAPSED
    // (C,−1)(A,+1) for n8; n1's idempotent re-assert emits NOTHING
    assert(deltas.length === 12, s"change-log rows: ${deltas.toSeq}")
    val live = deltas.groupBy(_.community).view
      .mapValues(_.map(_.delta).sum).toMap
    // batch twin: latest assignment per node, counted
    val finalAssign = (init ++ drift).groupBy(_.node).values
      .map(_.maxBy(e => (e.seq, e.community)).community).toSeq
    val batchSizes = finalAssign.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    assert(live.filter(_._2 != 0L) === batchSizes,
      s"live $live != batch $batchSizes")
    assert(live("C") === 0L, "the emptied community nets to zero")
    // live JSD through the EXACT batch from-cells chain...
    val cats = (baseline.map(_._1) ++ live.keys).distinct
    val cells = cats.map(c => (c, baseline.toMap.getOrElse(c, 0L),
      live.getOrElse(c, 0L))).toDF("__v", "__na", "__nb")
    val streamJsd = graft.operators.Evaluation
      .jensenShannonFromCells(cells).collect().toSeq
    // ...must equal the two-slice batch jensenShannon verbatim
    val twoSlice =
      baseline.flatMap { case (c, n) =>
        Seq.fill(n.toInt)((true, false, c)) } ++
      finalAssign.map(c => (false, true, c))
    val batchJsd = graft.operators.Evaluation.jensenShannon(
        twoSlice.toDF("a", "b", "comm"),
        col("a"), col("b"), col("comm")).collect().toSeq
    assert(streamJsd == batchJsd,
      s"stream JSD $streamJsd != batch $batchJsd")
    // the drift is real: C emptied into A
    assert(streamJsd.head.getAs[Double]("jsd") > 0.0)
  }
}
