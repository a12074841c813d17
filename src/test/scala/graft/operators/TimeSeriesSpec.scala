package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pandas-parity unit tests for the window/time-series semantic traps
  * (FIXTURES.md §3, SURVEY §5.2.3): rolling min_periods, lag/lead null
  * fill on short groups, weekday convention, ISO-week edges.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("rollingMeanMinPeriods: null until all w prior rows exist; short group all null") {
    // group a: 10 values; group b: 3 values (shorter than window 7)
    val df = ((1 to 10).map(i => ("a", i, i.toDouble)) ++
      (1 to 3).map(i => ("b", i, i.toDouble))).toDF("id", "t", "v")
    val out = TimeSeries.rollingMeanMinPeriods(df, Seq(col("id")), Seq(col("t")), "v", Seq(7))
      .select("id", "t", "rmean_v_7").as[(String, Int, Option[Double])].collect()
      .map { case (id, t, r) => (id, t) -> r }.toMap
    // pandas: shift(1).rolling(7).mean() → first non-null at row index 7
    // (t=8): mean(v[1..7]) = 4.0; t=9 → 5.0; t=10 → 6.0
    (1 to 7).foreach(t => assert(out(("a", t)).isEmpty, s"a t=$t must be null"))
    assert(out(("a", 8)).contains(4.0))
    assert(out(("a", 9)).contains(5.0))
    assert(out(("a", 10)).contains(6.0))
    (1 to 3).foreach(t => assert(out(("b", t)).isEmpty, s"b t=$t must be null"))
  }

  test("groupedLag/groupedLead: null fill at group edges, lag∘lead identity inside") {
    val df = (1 to 9).map(i => ("g", i, s"v$i")).toDF("id", "t", "v")
    val out = TimeSeries.groupedLead(
        TimeSeries.groupedLag(df, Seq(col("id")), Seq(col("t")), "v", Seq(2)),
        Seq(col("id")), Seq(col("t")), "v", Seq(2))
      .select("t", "lag_v_2", "lead_v_2").as[(Int, Option[String], Option[String])]
      .collect().map { case (t, la, le) => t -> (la, le) }.toMap
    assert(out(1) == (None, Some("v3")))
    assert(out(2) == (None, Some("v4")))
    assert(out(3) == (Some("v1"), Some("v5")))
    assert(out(8) == (Some("v6"), None))
    assert(out(9) == (Some("v7"), None))
  }

  test("timeFeatures: pandas weekday convention (Mon=0) and weekend flag") {
    // 2024-01-01 is a Monday
    val df = (0 to 6).map(i => Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)))
      .toDF("d")
    val out = TimeSeries.timeFeatures(df, "d")
      .select("d", "dayofweek", "is_weekend")
      .collect().map(r => r.getDate(0).toString -> (r.getInt(1), r.getInt(2))).toMap
    assert(out("2024-01-01") == (0, 0)) // Mon
    assert(out("2024-01-05") == (4, 0)) // Fri
    assert(out("2024-01-06") == (5, 1)) // Sat
    assert(out("2024-01-07") == (6, 1)) // Sun
  }

  test("timeFeatures: ISO week edges (Jan 1 / Dec 31)") {
    val df = Seq("2021-01-01", "2020-12-31", "2016-01-01", "2015-12-31")
      .map(Date.valueOf).toDF("d")
    val out = TimeSeries.timeFeatures(df, "d")
      .select("d", "week", "quarter", "day")
      .collect().map(r => r.getDate(0).toString -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    // ISO 8601 (pandas dt.week): 2021-01-01 is week 53 of 2020;
    // 2016-01-01 is week 53 of 2015; 2015-12-31 is week 53.
    assert(out("2021-01-01") == (53, 1, 1))
    assert(out("2020-12-31") == (53, 4, 31))
    assert(out("2016-01-01") == (53, 1, 1))
    assert(out("2015-12-31") == (53, 4, 31))
  }

  test("sequenceFunnel: greedy earliest chain, gap break, order matters") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val events = Seq(
      // u1 completes A(10) -> B(20) -> C(25); B at 5 is BEFORE A, ignored
      (1L, ts(5), "B"), (1L, ts(10), "A"), (1L, ts(20), "B"), (1L, ts(25), "C"),
      // u2: B arrives outside the 100s gap after A -> chain stops at A;
      // the C inside the gap of A does NOT count (it needs B first)
      (2L, ts(10), "A"), (2L, ts(200), "B"), (2L, ts(50), "C"),
      // u3 never does A -> no row at all
      (3L, ts(10), "B"), (3L, ts(20), "C"))
      .toDF("user_id", "ts", "event_type")
    val got = TimeSeries.sequenceFunnel(events, "user_id", "ts",
        "event_type", Seq("A", "B", "C"), maxGapSeconds = 100)
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))
      .toSeq
    assert(got == Seq(
      (1L, Some(10L), Some(20L), Some(25L), 3L),
      (2L, Some(10L), None, None, 1L)), s"got $got")
  }

  test("retentionCohorts: first week defines the cohort, offsets count distinct users") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // week of 2024-01-01 is Mon Jan 1; next week starts Jan 8
    val events = Seq(
      (1L, ts(2)), (1L, ts(3)), (1L, ts(9)),  // cohort w0, active w0+w1
      (2L, ts(4)),                            // cohort w0, only w0
      (3L, ts(10)), (3L, ts(16)))             // cohort w1, active w1+w2
      .toDF("user_id", "ts")
    val got = TimeSeries.retentionCohorts(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)), s"got $got")
  }

  test("rollingZscore: min_periods head nulls, hand-computed score, zero-variance guard") {
    import spark.implicits._
    // key A: baseline 1,3 (mean 2, sd_samp sqrt(2)), then 4:
    //   z = (4-2)/sqrt(2) = 1.4142 — not an anomaly at 2.0
    // then 22: baseline 3,4 -> mean 3.5, sd sqrt(0.5) -> z = 26.163 -> anomaly
    // key B: constant baseline -> sd 0 -> null score even with a full window
    val df = Seq(
      ("A", 1L, 1.0), ("A", 2L, 3.0), ("A", 3L, 4.0), ("A", 4L, 22.0),
      ("B", 1L, 5.0), ("B", 2L, 5.0), ("B", 3L, 9.0))
      .toDF("k", "seq", "v")
    val got = TimeSeries.rollingZscore(df, "k", Seq(col("seq")), "v", w = 2)
      .orderBy("k", "seq")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)), Option(r.get(4))))
      .toSeq
    assert(got == Seq(
      ("A", 1L, None, None),           // 0 preceding
      ("A", 2L, None, None),           // 1 preceding < w
      ("A", 3L, Some(1.4142), Some(0)),
      ("A", 4L, Some(26.163), Some(1)),
      ("B", 1L, None, None),
      ("B", 2L, None, None),
      ("B", 3L, None, None)), s"got $got") // sd=0 guard
  }

  test("hampelFilter: catches the anomaly a spiked baseline hides from the z-score") {
    import spark.implicits._
    // baseline: nine 5s and one 100-spike, then the probe value 20.
    // median/MAD: med=5, MAD=0 -> 20 flagged. mean/stddev: the spike
    // drags mean to 14.5 and stddev to ~30 -> z(20) ~ 0.18, missed.
    val rows = ((1 to 4).map(i => ("A", i.toLong, 5.0)) ++
      Seq(("A", 5L, 100.0)) ++
      (6 to 10).map(i => ("A", i.toLong, 5.0)) :+
      ("A", 11L, 20.0)).toDF("k", "seq", "v")
    val h = TimeSeries.hampelFilter(rows, "k", Seq(col("seq")), "v", w = 10)
      .filter(col("seq") === 11).head()
    assert(h.getDouble(3) == 15.0 && h.getInt(4) == 1,
      s"hampel must flag the 20: $h")
    val z = TimeSeries.rollingZscore(rows, "k", Seq(col("seq")), "v", w = 10)
      .filter(col("seq") === 11).head()
    assert(z.getInt(4) == 0,
      s"the spiked baseline should mask the 20 from the z-score: $z")
  }

  test("hampelFilter: min_periods head nulls and even-window median averaging") {
    import spark.implicits._
    // values 1..10 then 11: med = (5+6)/2 = 5.5, deviations from 5.5
    // sorted = [.5,.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,4.5] -> MAD = 2.5;
    // |11-5.5| = 5.5 <= 3*1.4826*2.5 = 11.12 -> not an outlier
    val rows = (1 to 11).map(i => ("B", i.toLong, i.toDouble))
      .toDF("k", "seq", "v")
    val out = TimeSeries.hampelFilter(rows, "k", Seq(col("seq")), "v", w = 10)
      .orderBy("seq").collect()
    assert((1 to 10).forall(i => out(i - 1).isNullAt(3)),
      "first w rows must be null (min_periods)")
    val last = out(10)
    assert(last.getDouble(3) == 5.5 && last.getInt(4) == 0, s"got $last")
  }

  test("kaplanMeier: hand product-limit with censoring; everyone-churns duration zeroes the curve") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // gmax = day 10; censor horizon 3 days -> last event on day 8+ is
    // censored. u1: dur 2 churn; u2: dur 4 churn; u3: dur 7 censored;
    // u4: dur 9 censored. S: 0.75 after t=2, 0.5 after t=4, flat after.
    val df = Seq(
      (1L, ts(1)), (1L, ts(3)),
      (2L, ts(1)), (2L, ts(5)),
      (3L, ts(2)), (3L, ts(9)),
      (4L, ts(1)), (4L, ts(10)))
      .toDF("user_id", "ts")
    val got = TimeSeries.kaplanMeier(df, "user_id", "ts", censorLastDays = 3)
      .orderBy("duration_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      (2L, 4L, 1L, 0.75),
      (4L, 3L, 1L, 0.5),
      (7L, 2L, 0L, 0.5),
      (9L, 1L, 0L, 0.5)), s"got $got")
    // all remaining users churn at the same duration -> factor 0 ->
    // survival exactly 0 (the Spark-null/DuckDB-inf ln(0) trap)
    val all = Seq((1L, ts(1)), (1L, ts(3)), (2L, ts(2)), (2L, ts(4)))
      .toDF("user_id", "ts")
    val z = TimeSeries.kaplanMeier(all, "user_id", "ts", censorLastDays = 0)
      .orderBy("duration_days").collect()
    assert(z.length == 1 && z(0).getDouble(3) == 0.0, s"got ${z.toSeq}")
  }

  test("lastTouchAttribution: in-window touch, expired touch, no touch, and post-filter recompute regression") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // u1: view 10:00, purchase 10:20 -> attributed to view, 1200s
      (1L, 10L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 11L, ts("2024-01-01 10:20:00"), "purchase"),
      // u1: next purchase 12:00 -> last touch 10:00 view is >1h -> null
      (1L, 12L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2: purchase with no preceding touch at all -> null
      (2L, 20L, ts("2024-01-01 09:00:00"), "purchase"),
      // u2: click AFTER the purchase must not attribute backwards
      (2L, 21L, ts("2024-01-01 09:30:00"), "click"),
      // u3: click then view -> the LATEST touch (view) wins
      (3L, 30L, ts("2024-01-01 08:00:00"), "click"),
      (3L, 31L, ts("2024-01-01 08:10:00"), "view"),
      (3L, 32L, ts("2024-01-01 08:15:00"), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = TimeSeries.lastTouchAttribution(df, "user_id", "ts",
        "event_id", "event_type", "purchase", Seq("click", "view"), 3600L)
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(2)), Option(r.get(3))))
      .toSeq
    assert(got == Seq(
      (11L, Some("view"), Some(1200000000L)),
      (12L, None, None),
      (20L, None, None),
      (32L, Some("view"), Some(300000000L))), s"got $got")
  }

  test("sessionize: gap strictly over the threshold splits, exact-gap stays") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // u1: 10:00, 10:30 (exactly the 1800s gap -> SAME session),
      //     11:01 (1860s gap -> new session)
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 10:30:00")),
      (1L, 3L, ts("2024-01-01 11:01:00")),
      // u2: single event -> one session of one event, zero duration
      (2L, 4L, ts("2024-01-01 09:00:00")))
      .toDF("user_id", "event_id", "ts")
    val got = TimeSeries.sessionize(df, "user_id", "ts", "event_id", 1800)
      .orderBy("user_id", "session_seq")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    def us(s: String) = java.sql.Timestamp.valueOf(s).getTime * 1000L
    assert(got == Seq(
      (1L, 1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:30:00"), 2L,
        1800000000L),
      (1L, 2L, us("2024-01-01 11:01:00"), us("2024-01-01 11:01:00"), 1L, 0L),
      (2L, 1L, us("2024-01-01 09:00:00"), us("2024-01-01 09:00:00"), 1L, 0L)),
      s"got $got")
  }

  test("markovTransitions: row-normalized counts over per-user adjacency") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: a->b->a->c; user 2: a->b. From a: b twice, c once.
    val df = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "a"),
      (1L, 4L, ts("2024-01-01 10:03:00"), "c"),
      (2L, 5L, ts("2024-01-01 09:00:00"), "a"),
      (2L, 6L, ts("2024-01-01 09:05:00"), "b"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = TimeSeries.markovTransitions(df, "user_id", "ts",
        "event_id", "event_type")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 2L, 0.666667),
      ("a", "c", 1L, 0.333333),
      ("b", "a", 1L, 1.0)), s"got $got")
  }

  test("markovEntropyRate: deterministic chain scores 0, uniform flips score ln 2") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:${i}%02d:00")
    // a->b->a->b...: every transition is forced -> H = 0
    val det = (0 until 8).map(i =>
      (1L, i.toLong, ts(i), if (i % 2 == 0) "a" else "b"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val h0 = TimeSeries.markovEntropyRate(det, "user_id", "ts",
      "event_id", "event_type").collect()(0)
    assert(h0.getLong(0) == 7L && h0.getDouble(2) == 0.0, s"got $h0")
    // from a: half to a, half to b (and same from b) -> H = ln 2
    val coin = Seq("a", "a", "b", "b", "a", "b", "a", "a", "b")
      .zipWithIndex.map { case (t, i) => (1L, i.toLong, ts(i), t) }
      .toDF("user_id", "event_id", "ts", "event_type")
    // transitions: aa, ab, bb, ba, ab, ba, aa, ab -> from a: {a:2,b:3},
    // from b: {b:1,a:2}; H = -(2/8)ln(2/5)-(3/8)ln(3/5)-(1/8)ln(1/3)
    //   -(2/8)ln(2/3)
    val expected = BigDecimal(
      -(2.0 / 8) * math.log(2.0 / 5) - (3.0 / 8) * math.log(3.0 / 5)
        - (1.0 / 8) * math.log(1.0 / 3) - (2.0 / 8) * math.log(2.0 / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val h1 = TimeSeries.markovEntropyRate(coin, "user_id", "ts",
      "event_id", "event_type").collect()(0)
    assert(h1.getLong(0) == 8L && h1.getLong(1) == 2L &&
      math.abs(h1.getDouble(2) - expected) < 2e-6, s"got $h1 want $expected")
  }

  test("stickiness: daily user shows 1.0, once-a-week user dilutes toward 1/7") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 09:00:00")
    // week of 2024-01-01: u1 active all 7 days, u2 active once ->
    // active (user, day) pairs = 8, avg_dau = 8/7, wau = 2,
    // stickiness = 8/14; duplicate same-day events must not inflate
    val df = ((1 to 7).map(d => (1L, ts(f"2024-01-0$d"))) ++
      Seq((2L, ts("2024-01-03")), (2L, ts("2024-01-03"))))
      .toDF("user_id", "ts")
    val got = TimeSeries.stickiness(df, "user_id", "ts")
      .as[(java.sql.Date, Long, Double, Double)].head()
    def r4(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ((java.sql.Date.valueOf("2024-01-01"), 2L,
      r4(8.0 / 7), r4(8.0 / 7 / 2))), s"got $got")
  }

  test("growthAccounting: ledger identity holds; interior churn-only weeks appear, the trailing boundary week does not") {
    import java.sql.Date
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 10:00:00")
    // weeks W1 = 2024-01-01, W2 = -08, W3 = -15, W4 = -22 (Mondays)
    // u1 W1+W2; u2 W1; u3 W2; u4 W1+W4 — so W3 has NO activity but is
    // interior (W4 exists) -> churn-only zero-WAU row must appear;
    // W5 = max+7 must NOT (observation-boundary artifact, r12 ADVICE)
    val df = Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-09")),
      (2L, ts("2024-01-02")),
      (3L, ts("2024-01-10")),
      (4L, ts("2024-01-03")), (4L, ts("2024-01-23")))
      .toDF("user_id", "ts")
    val got = TimeSeries.growthAccounting(df, "user_id", "ts")
      .orderBy("week")
      .as[(Date, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      // W1: u1, u2, u4 new
      (Date.valueOf("2024-01-01"), 3L, 0L, 0L, 0L, 3L),
      // W2: u1 retained, u3 new; u2 + u4 churned
      (Date.valueOf("2024-01-08"), 1L, 1L, 0L, 2L, 2L),
      // W3: nobody active; u1 and u3 churn -> interior zero-WAU row
      (Date.valueOf("2024-01-15"), 0L, 0L, 0L, 2L, 0L),
      // W4: u4 resurrected; no W5 row even though u4 goes quiet after
      (Date.valueOf("2024-01-22"), 0L, 0L, 1L, 0L, 1L)), s"got $got")
    // resurrection: active W1, gap W2, back W3 — and no trailing W4
    val res = Seq((9L, ts("2024-01-01")), (9L, ts("2024-01-16")))
      .toDF("user_id", "ts")
    val g2 = TimeSeries.growthAccounting(res, "user_id", "ts")
      .orderBy("week")
      .as[(Date, Long, Long, Long, Long, Long)].collect().toSeq
    assert(g2.map(r => (r._2, r._3, r._4, r._5)) ==
      Seq((1L, 0L, 0L, 0L), (0L, 0L, 0L, 1L), (0L, 0L, 1L, 0L)),
      s"got $g2")
  }

  test("sequenceLikelihood: the common loop scores low, the rare hop scores high") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:${i}%02d:00")
    // global transitions: a->b x3, a->c x1. P(b|a)=3/4, P(c|a)=1/4.
    // u1..u3 do a->b (nll = -ln 3/4); u4 does a->c (nll = -ln 1/4)
    val df = (1L to 3L).flatMap(u => Seq((u, u * 10, ts(u.toInt), "a"),
      (u, u * 10 + 1, ts(u.toInt + 10), "b"))) ++
      Seq((4L, 40L, ts(1), "a"), (4L, 41L, ts(2), "c"))
    val got = TimeSeries.sequenceLikelihood(
        df.toDF("user_id", "event_id", "ts", "event_type"),
        "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id")
      .as[(Long, Long, Double)].collect().toSeq
    def r6(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val low = r6(-math.log(3.0 / 4)); val high = r6(-math.log(1.0 / 4))
    assert(got == Seq((1L, 1L, low), (2L, 1L, low), (3L, 1L, low),
      (4L, 1L, high)), s"got $got")
    assert(high > low)
  }

  test("timeToConvert: first-from to first-at-or-after-to; non-converters null; pre-from ignored") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // u1: purchase BEFORE signup must not count; next one does (2h)
      (1L, ts("2024-01-01 08:00:00"), "purchase"),
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2: signup only -> null latency
      (2L, ts("2024-01-01 09:00:00"), "signup"),
      // u3: no signup -> absent entirely
      (3L, ts("2024-01-01 09:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = TimeSeries.timeToConvert(df, "user_id", "ts",
        "event_type", "signup", "purchase")
      .orderBy("user_id")
      .as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq((1L, Some(7200L)), (2L, None)), s"got $got")
  }

  test("nelsonAalen: hand d/n increments accumulate; censored tail adds nothing") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 12:00:00")
    // u1: dur 0, churned; u2: dur 2, churned; u3: dur 9, last event at
    // gmax -> censored. H: 1/3 at dur 0; +1/2 at dur 2; flat at dur 9
    val df = Seq(
      (1L, ts("2024-01-01")),
      (2L, ts("2024-01-01")), (2L, ts("2024-01-03")),
      (3L, ts("2024-01-01")), (3L, ts("2024-01-10")))
      .toDF("user_id", "ts")
    val got = TimeSeries.nelsonAalen(df, "user_id", "ts")
      .orderBy("duration_days")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 3L, 1L, 0.333333),
      (2L, 2L, 1L, 0.833333),
      (9L, 1L, 0L, 0.833333)), s"got $got")
  }

  test("twoProportionZ: hand pooled z; degenerate splits null out") {
    val df = (Seq.fill(8)(("a", 1)) ++ Seq.fill(2)(("a", 0)) ++
      Seq.fill(4)(("b", 1)) ++ Seq.fill(6)(("b", 0)))
      .toDF("g", "conv")
    val got = TimeSeries.twoProportionZ(df,
        inA = col("g") === "a", inB = col("g") === "b",
        success = col("conv") === 1)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].head()
    val (p1, p2, pp) = (0.8, 0.4, 0.6)
    val z = (p1 - p2) / math.sqrt(pp * (1.0 - pp) * (1.0 / 10 + 1.0 / 10))
    def r4(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ((10L, 8L, 10L, 4L, Some(0.8), Some(0.4), Some(r4(z)))),
      s"got $got")
    // all-converted pool: zero pooled variance -> null z, not an error
    val flat = Seq(("a", 1), ("b", 1)).toDF("g", "conv")
    val g2 = TimeSeries.twoProportionZ(flat, col("g") === "a",
        col("g") === "b", col("conv") === 1)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].head()
    assert(g2._7.isEmpty, s"got $g2")
  }

  test("rollingCorrelation: full-window-only, sign tracks the co-movement, flat window nulls") {
    import java.sql.Date
    val df = Seq(
      ("a", Date.valueOf("2024-01-01"), 1.0, 1.0),
      ("a", Date.valueOf("2024-01-02"), 2.0, 2.0),
      ("a", Date.valueOf("2024-01-03"), 3.0, 1.0),
      ("b", Date.valueOf("2024-01-01"), 5.0, 1.0),
      ("b", Date.valueOf("2024-01-02"), 5.0, 9.0))
      .toDF("k", "day", "x", "y")
    val got = TimeSeries.rollingCorrelation(df, "k", "day", "x", "y",
        window = 2)
      .orderBy("k", "day")
      .select("k", "rolling_corr")
      .as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(
      // first row: window not full yet
      ("a", None), ("a", Some(1.0)), ("a", Some(-1.0)),
      // x is flat in b's window -> zero variance -> null
      ("b", None), ("b", None)), s"got $got")
  }

  test("linearAttribution: equal credit shares inside the window, expired touches excluded") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1 conversion at 12:00 with touches click(11:00), view(11:30)
    // -> 1/2 each; click at 10:00 the day BEFORE the window is out;
    // user 2 conversion with a single signup touch -> 1.0; a touch
    // AFTER the conversion never counts
    val df = Seq(
      (1L, 1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, 2L, ts("2024-01-01 11:30:00"), "view"),
      (1L, 3L, ts("2023-12-20 10:00:00"), "click"),
      (1L, 4L, ts("2024-01-01 12:00:00"), "purchase"),
      (1L, 5L, ts("2024-01-01 13:00:00"), "view"),
      (2L, 6L, ts("2024-01-02 09:00:00"), "signup"),
      (2L, 7L, ts("2024-01-02 10:00:00"), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = TimeSeries.linearAttribution(df, "user_id", "ts",
        "event_id", "event_type", Seq("click", "view", "signup"),
        "purchase", windowSeconds = 7L * 24 * 3600)
      .orderBy("channel")
      .as[(String, Double, Long)].collect().toSeq
    assert(got == Seq(("click", 0.5, 1L), ("signup", 1.0, 1L),
      ("view", 0.5, 1L)), s"got $got")
  }

  test("interArrivalStats: hand moments; metronome hits burstiness -1; degenerates null out") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: gaps 10s, 20s; user 2: metronome 5s,5s,5s; user 3: one
    // gap (no variance); user 4: single event (no row)
    val df = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 10:00:10")),
      (1L, 3L, ts("2024-01-01 10:00:30")),
      (2L, 4L, ts("2024-01-01 09:00:00")),
      (2L, 5L, ts("2024-01-01 09:00:05")),
      (2L, 6L, ts("2024-01-01 09:00:10")),
      (2L, 7L, ts("2024-01-01 09:00:15")),
      (3L, 8L, ts("2024-01-01 08:00:00")),
      (3L, 9L, ts("2024-01-01 08:00:07")),
      (4L, 10L, ts("2024-01-01 07:00:00")))
      .toDF("user_id", "event_id", "ts")
    val got = TimeSeries.interArrivalStats(df, "user_id", "ts", "event_id")
      .orderBy("user_id")
      .as[(Long, Long, Double, Option[Double], Option[Double])]
      .collect().toSeq
    // user 1 by the exact formula on micro gaps (1e7, 2e7)
    val (sg, sgg, n) = (3e7, 1e14 + 4e14, 2.0)
    val mean = sg / n
    val sd = math.sqrt((n * sgg - sg * sg) / (n * (n - 1)))
    def r4(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (1L, 2L, 15.0, Some(r4(sd / mean)),
        Some(r4((sd - mean) / (sd + mean)))),
      (2L, 3L, 5.0, Some(0.0), Some(-1.0)),
      (3L, 1L, 7.0, None, None)), s"got $got")
  }

  test("sesForecast: hand-computed fold with dyadic alpha; single point returns itself") {
    import spark.implicits._
    // alpha 0.5: S1=1, S2=0.5*2+0.5*1=1.5, S3=0.5*3+0.5*1.5=2.25
    val df = Seq((1L, 1, 1.0), (1L, 2, 2.0), (1L, 3, 3.0), (2L, 1, 7.0))
      .toDF("k", "o", "y")
    val got = TimeSeries.sesForecast(df, "k", "o", "y", alpha = 0.5)
      .orderBy("k").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 2.25), (2L, 1L, 7.0)), s"got $got")
    // order matters: the same values in reverse give a different S
    val rev = Seq((1L, 1, 3.0), (1L, 2, 2.0), (1L, 3, 1.0)).toDF("k", "o", "y")
    val g2 = TimeSeries.sesForecast(rev, "k", "o", "y", alpha = 0.5)
      .select("ses_forecast").as[Double].collect()(0)
    assert(g2 == 1.75, s"got $g2")
  }

  test("holtForecast: hand two-state fold; degenerate lengths") {
    import spark.implicits._
    // [1,2,3] a=0.5 g=0.5: init l=2,b=1; x=3: l'=0.5*3+0.5*3=3,
    // b'=0.5*(3-2)+0.5*1=1 -> forecast 4
    val df = Seq((1L, 1, 1.0), (1L, 2, 2.0), (1L, 3, 3.0),
      (2L, 1, 7.0), (3L, 1, 2.0), (3L, 2, 5.0))
      .toDF("k", "o", "y")
    val got = TimeSeries.holtForecast(df, "k", "o", "y",
        alpha = 0.5, gamma = 0.5)
      .orderBy("k").as[(Long, Long, Double)].collect().toSeq
    // n=1 forecasts itself; n=2 extrapolates the line: 2*y2 - y1 = 8
    assert(got == Seq((1L, 3L, 4.0), (2L, 1L, 7.0), (3L, 2L, 8.0)),
      s"got $got")
  }

  test("maxDrawdown: drop from the running peak, first realization day") {
    import spark.implicits._
    val d = (s: String) => Date.valueOf(s)
    val df = Seq(
      (1L, d("2024-01-01"), 1.0), (1L, d("2024-01-02"), 3.0),
      (1L, d("2024-01-03"), 2.0), (1L, d("2024-01-04"), 5.0),
      (1L, d("2024-01-05"), 1.0),
      (2L, d("2024-01-01"), 4.0)) // monotone/singleton: zero drawdown
      .toDF("k", "day", "y")
    val got = TimeSeries.maxDrawdown(df, "k", "day", "y")
      .orderBy("k").as[(Long, Long, Double, Double, Date)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 5.0, 4.0, d("2024-01-05")),
      (2L, 1L, 4.0, 0.0, d("2024-01-01"))), s"got $got")
  }

  test("rollingExactMedian: null until full, odd pick and even decimal interpolation") {
    import spark.implicits._
    val df = Seq((1L, 1, 1.0), (1L, 2, 2.0), (1L, 3, 10.0), (1L, 4, 4.0))
      .toDF("k", "o", "y")
    val odd = TimeSeries.rollingExactMedian(df, "k", "o", "y", window = 3)
      .orderBy("o").select("rolling_median")
      .as[Option[Double]].collect().toSeq
    assert(odd == Seq(None, None, Some(2.0), Some(4.0)), s"got $odd")
    val even = TimeSeries.rollingExactMedian(df, "k", "o", "y", window = 2)
      .orderBy("o").select("rolling_median")
      .as[Option[Double]].collect().toSeq
    assert(even == Seq(None, Some(1.5), Some(6.0), Some(7.0)), s"got $even")
  }

  test("retentionTriangle: cohorts age week by week") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 10:00:00")
    // W1 cohort {u1,u2}; u1 returns W2; W2 cohort {u3}
    val df = Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-09")),
      (2L, ts("2024-01-02")),
      (3L, ts("2024-01-10")))
      .toDF("user_id", "ts")
    val got = TimeSeries.retentionTriangle(df, "user_id", "ts")
      .orderBy("cohort_week", "age_weeks")
      .as[(Date, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (Date.valueOf("2024-01-01"), 0L, 2L, 2L, 1.0),
      (Date.valueOf("2024-01-01"), 1L, 1L, 2L, 0.5),
      (Date.valueOf("2024-01-08"), 0L, 1L, 1L, 1.0)), s"got $got")
  }

  test("sessionStats: bounce share and exact median duration") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // burst of 3 (10 s span), then a single event an hour later
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:00:05"), 2L),
      (1L, ts("2024-01-01 10:00:10"), 3L),
      (1L, ts("2024-01-01 12:00:00"), 4L))
      .toDF("user_id", "ts", "event_id")
    val got = TimeSeries.sessionStats(df, "user_id", "ts", "event_id",
        gapSeconds = 1800)
      .as[(Long, Long, Double, Double, Double)].collect()(0)
    // sessions: (3 events, 10 s) and (1 event, 0 s) -> median 5 s
    assert(got == ((2L, 1L, 0.5, 2.0, 5.0)), s"got $got")
  }

  test("reachCurve: new users per day and cumulative distinct reach") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("a", ts("2024-01-01 09:00:00")), ("b", ts("2024-01-01 10:00:00")),
      ("a", ts("2024-01-02 09:00:00")), ("c", ts("2024-01-02 10:00:00")),
      ("a", ts("2024-01-04 09:00:00"))) // returning user adds nothing
      .toDF("user_id", "ts")
    val got = TimeSeries.reachCurve(df, "user_id", "ts")
      .orderBy("day").as[(Date, Long, Long)].collect().toSeq
    assert(got == Seq(
      (Date.valueOf("2024-01-01"), 2L, 2L),
      (Date.valueOf("2024-01-02"), 1L, 3L)), s"got $got")
  }

  test("conversionLatency: first-click-to-first-purchase, exact interpolated quantiles") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val rows = Seq(
      ("u1", ts(0), "click"), ("u1", ts(10), "purchase"),
      ("u1", ts(99), "purchase"),              // later purchase ignored
      ("u2", ts(0), "click"), ("u2", ts(30), "purchase"),
      ("u3", ts(5), "purchase"), ("u3", ts(9), "click"), // pre-click only -> excluded
      ("u4", ts(0), "click")                   // never converts
    ).toDF("user_id", "ts", "event_type")
    val got = TimeSeries.conversionLatency(rows, "user_id", "ts",
        "event_type", "click", "purchase")
      .as[(Long, Double, Double)].collect()(0)
    // latencies {10, 30}: p50 interpolates to 20, p90 to 28
    assert(got == ((2L, 20.0, 28.0)), s"got $got")
  }

  test("leadLagCorrelation: a shifted copy peaks exactly at its lag") {
    import spark.implicits._
    val d0 = Date.valueOf("2024-01-01")
    def day(i: Int) = new Date(d0.getTime + i * 86400000L)
    // y is x delayed by 2 days: corr peaks (exactly 1) at lag 2 —
    // x_t vs y_{t-2}... y lags x by 2, x LEADS
    val xs = Seq(1.0, 7.0, 2.0, 9.0, 4.0, 8.0, 3.0, 6.0, 5.0, 2.5,
      7.5, 1.5, 8.5, 4.5)
    val rows = xs.indices.flatMap { i =>
      Seq(("a", day(i), xs(i))) ++
        (if (i >= 2) Seq(("b", day(i), xs(i - 2))) else Nil)
    }
    val got = TimeSeries.leadLagCorrelation(rows.toDF("k", "d", "v"),
        "k", "d", "v", "a", "b", maxLag = 3)
      .orderBy("lag")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got.map(_._1) == (-3L to 3L).toSeq)
    val at2 = got.find(_._1 == 2L).get
    assert(at2._3.contains(1.0), s"delayed copy must peak at lag 2: $got")
    // every other lag correlates strictly less
    got.filter(_._1 != 2L).foreach(r =>
      assert(r._3.forall(_ < 1.0), s"only lag 2 is perfect: $r"))
  }

  test("leadLagCorrelation: lags are CALENDAR days, not shared-observation positions") {
    import spark.implicits._
    val d0 = Date.valueOf("2024-01-01")
    def day(i: Int) = new Date(d0.getTime + i * 86400000L)
    // y is x delayed by exactly 1 CALENDAR day, but BOTH series have
    // gaps (x misses day 2, y misses day 6): a positional shift over
    // the shared days would smear "lag 1" across the gaps (r13
    // ADVICE); day-join semantics still recover the perfect lag-1 copy
    val xDays = Seq(0, 1, 3, 4, 5, 7, 8)
    val xs = Seq(1.0, 7.0, 9.0, 4.0, 8.0, 6.0, 2.0)
    val rows = xDays.zip(xs).flatMap { case (d, v) =>
      val yd = d + 1
      Seq(("a", day(d), v)) ++
        (if (yd != 6) Seq(("b", day(yd), v)) else Nil)
    }
    val got = TimeSeries.leadLagCorrelation(rows.toDF("k", "d", "v"),
        "k", "d", "v", "a", "b", maxLag = 2)
      .orderBy("lag")
      .as[(Long, Long, Option[Double])].collect().toSeq
    val at1 = got.find(_._1 == 1L).get
    assert(at1._2 == 6L && at1._3.contains(1.0),
      s"calendar-day lag 1 must pair the 6 surviving days perfectly: $got")
    got.filter(_._1 != 1L).foreach(r =>
      assert(r._3.forall(_ < 1.0), s"only lag 1 is perfect: $r"))
  }

  test("holtWintersForecast: a perfectly periodic series forecasts its next value exactly") {
    import spark.implicits._
    // pattern [1, 3] repeated: init l0 = 2, b0 = 0, S = [-1, +1]; every
    // fold step is a fixed point (x - S_head = 2 = l), so the one-step
    // forecast equals the true next value — the invariance that pins
    // the rotation and init algebra at once
    val periodic = (1 to 8).map(i => ("p", i, if (i % 2 == 1) 1.0 else 3.0))
    // trending: y = t on season 2 — forecast must land near 11
    val trend = (1 to 10).map(i => ("t", i, i.toDouble))
    // too short for 2 seasons -> no row
    val short = Seq(("s", 1, 5.0), ("s", 2, 6.0), ("s", 3, 7.0))
    val df = (periodic ++ trend ++ short).toDF("k", "o", "v")
    val got = TimeSeries.holtWintersForecast(df, "k", "o", "v",
        alpha = 0.3, gamma = 0.1, delta = 0.2, season = 2)
      .orderBy("k")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("p", "t"), s"short key must drop: $got")
    val p = got(0)
    assert(p._3 == 2.0 && p._4 == 0.0 && p._5 == 1.0,
      s"periodic fixed point: level 2, trend 0, next value 1 — got $p")
    val t = got(1)
    assert(math.abs(t._5 - 11.0) < 0.8, s"trend forecast ≈ 11, got $t")
  }

  test("cusumDrift: a level shift accumulates past h·σ, a stable series never arms") {
    import spark.implicits._
    // stable: alternating 9/11 around mean 10 — every fold step's
    // |x − μ| (1.0) is below k = 0.5σ·... σ≈1.026, so drift never arms
    val stable = (1 to 20).map(i => ("s", i, if (i % 2 == 0) 9.0 else 11.0))
    // shifted: 15 points at 10, then 5 at 18 — an ASYMMETRIC step
    // (mean 12, σ≈3.55): the late high run accumulates ≈4.22/step
    // into S+ (≈21 > h = 4σ ≈ 14.2) while the long low run only
    // drips ≈0.22/step into S-
    val shifted = (1 to 15).map(i => ("d", i, 10.0)) ++
      (16 to 20).map(i => ("d", i, 18.0))
    val df = (stable ++ shifted).toDF("k", "o", "v")
    val got = TimeSeries.cusumDrift(df, "k", "o", "v")
      .orderBy("k")
      .select("k", "n_obs", "max_cusum_up", "max_cusum_down", "drift")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    val d = got.find(_._1 == "d").get
    val s = got.find(_._1 == "s").get
    assert(d._5 == 1L, s"level shift must arm the detector: $d")
    assert(d._3 > d._4, s"shift is UPWARD — S+ must dominate: $d")
    assert(s._5 == 0L, s"stable series must not arm: $s")
    // constant series: σ = 0, k = 0, x = μ every step -> all zeros
    val const = (1 to 5).map(i => ("c", i, 3.0)).toDF("k", "o", "v")
    val c = TimeSeries.cusumDrift(const, "k", "o", "v")
      .select("max_cusum_up", "max_cusum_down", "drift")
      .as[(Double, Double, Long)].collect()(0)
    assert(c == ((0.0, 0.0, 0L)), s"got $c")
  }

  test("turningPoints: strict extrema counted, ties are not turns, monotone scores negative z") {
    import spark.implicits._
    val df = (Seq(("a", 1, 1.0), ("a", 2, 3.0), ("a", 3, 2.0),
      ("a", 4, 4.0)) ++                       // peak at 3, valley at 2
      (1 to 5).map(i => ("m", i, i.toDouble)) ++ // monotone: no turns
      Seq(("t", 1, 1.0), ("t", 2, 2.0), ("t", 3, 2.0), ("t", 4, 1.0)))
      .toDF("k", "o", "v")
    val got = TimeSeries.turningPoints(df, "k", "o", "v")
      .orderBy("k")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    // a: T=2, E=4/3, z=(2-4/3)/sqrt(35/90)=1.069
    assert(got(0)._3 == 2L && got(0)._4.contains(1.3333) &&
      got(0)._5.contains(1.069), s"got ${got(0)}")
    // m: monotone -> 0 turns, z negative
    assert(got(1)._3 == 0L && got(1)._5.exists(_ < 0), s"got ${got(1)}")
    // t: the tied plateau is NOT a strict extremum
    assert(got(2)._3 == 0L, s"got ${got(2)}")
  }

  test("ewmaChart: hand recursion, violation index, and the quiet no-shift case") {
    import spark.implicits._
    // 10,10,10,10,20: mu = 12, sd = sqrt(20) -> 4.472136 (6dp)
    // lambda=.5, L=1: lim = sqrt(.5/1.5); z walks 11, 10.5, 10.25,
    // 10.125, then 15.0625 on the jump
    val df = (Seq.fill(4)(10.0) :+ 20.0).zipWithIndex
      .map { case (v, i) => ("k", i + 1L, v) }.toDF("k", "o", "v")
    val quiet = TimeSeries.ewmaChart(df, "k", "o", "v",
        lambda = 0.5, lSigma = 3.0).head()
    assert(quiet.getLong(1) == 5L && quiet.getDouble(2) == 12.0 &&
      quiet.getDouble(3) == 4.472136, s"got $quiet")
    assert(quiet.getDouble(4) == 15.0625 && quiet.getLong(5) == 0L &&
      quiet.isNullAt(6), s"wide limits must stay quiet: $quiet")
    // L=1 narrows the band: ucl = 12 + sqrt(.5/1.5)·4.472136 ≈ 14.58 —
    // only the post-jump z (15.0625, the 5th fold step) violates
    val tight = TimeSeries.ewmaChart(df, "k", "o", "v",
        lambda = 0.5, lSigma = 1.0).head()
    assert(tight.getLong(5) == 1L && tight.getLong(6) == 5L,
      s"got $tight")
  }

  test("pageHinkley: step shift detected with hand fold, constant series scores 0") {
    // series 0,0,0,10,10,10: running-mean deviations accumulate
    // m = 0,0,0,7.5,13.5,18.5; min stays 0 -> stat 18.5 > lambda 5
    val df = (1 to 6).map(i => ("u", i.toLong, if (i <= 3) 0.0 else 10.0))
      .toDF("k", "t", "v")
    val r = TimeSeries.pageHinkley(df, "k", "t", "v",
      delta = 0.0, lambda = 5.0).head()
    assert(r.getLong(1) == 6L && r.getDouble(2) == 18.5 &&
      r.getLong(3) == 1L, s"got $r")
    val const = (1 to 5).map(i => ("u", i.toLong, 7.0)).toDF("k", "t", "v")
    val c = TimeSeries.pageHinkley(const, "k", "t", "v", lambda = 5.0).head()
    assert(c.getDouble(2) == 0.0 && c.getLong(3) == 0L, s"got $c")
  }

  test("hurstExponent: trend reads persistent, alternation reads " +
      "anti-persistent, partial blocks drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // pure linear trend: R/S grows ~ w, H -> 1
    val trend = (1 to 128).map(i => (i.toLong, i.toDouble)).toDF("t", "v")
    val ht = TimeSeries.hurstExponent(trend, col("t"), col("v"))
      .collect()
    assert(ht.head.getAs[Double]("hurst") > 0.9)
    assert(ht.map(_.getAs[Long]("w")).toSeq === Seq(8L, 16L, 32L, 64L))
    assert(ht.head.getAs[Long]("blocks") === 16L)
    // strict alternation: every block has R/S = 1 -> slope exactly 0
    val alt = (1 to 64).map(i => (i.toLong, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("t", "v")
    val ha = TimeSeries.hurstExponent(alt, col("t"), col("v"),
      windows = Seq(8, 16, 32)).collect()
    assert(ha.forall(_.getAs[Double]("mean_rs") === 1.0))
    assert(ha.head.getAs[Double]("hurst") === 0.0)
    // length 44 at w=8: the 4-row tail block is dropped
    val short = (1 to 44).map(i => (i.toLong, math.sin(i.toDouble)))
      .toDF("t", "v")
    val hs = TimeSeries.hurstExponent(short, col("t"), col("v"),
      windows = Seq(8)).head()
    assert(hs.getAs[Long]("blocks") === 5L)
  }
}
