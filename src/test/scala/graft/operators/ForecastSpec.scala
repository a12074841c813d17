package graft.operators

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Forecasting tier (X74–X78): gap-fill semantics, Syntetos–Boylan
  * quadrants, RMSSE against hand-computed values, and the linear-trend
  * degenerate cases. */
class ForecastSpec extends SparkSpec {

  private def d(s: String): Date = Date.valueOf(s)

  private def daily(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.map { case (k, day, v) => (k, d(day), v) }
      .toDF("user_id", "day", "demand")
  }

  test("gapFillForwardFill: gaps carry the last value, is_gap marks imputed rows") {
    val in = daily(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-04", 20.0),
      (2L, "2024-01-02", 5.0))
    val out = Forecast.gapFillForwardFill(in, "user_id", "day", "demand")
      .orderBy("user_id", "day")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01", 10.0, 0),
      (1L, "2024-01-02", 10.0, 1),
      (1L, "2024-01-03", 10.0, 1),
      (1L, "2024-01-04", 20.0, 0),
      (2L, "2024-01-02", 5.0, 0)))
  }

  test("gapFillForwardFill: contiguous series passes through unchanged") {
    val in = daily((7L, "2024-02-01", 1.0), (7L, "2024-02-02", 2.0))
    val out = Forecast.gapFillForwardFill(in, "user_id", "day", "demand")
    assert(out.filter(col("is_gap") === 1).count() == 0)
    assert(out.count() == 2)
  }

  test("demandClasses: hand-computed quadrants and the single-day n/a") {
    // key 1: 3 demand days over a 6-day span -> ADI 2.0; sizes 10,10,40
    //   mean 20, var_samp 300 -> CV2 = 300/400 = 0.75 -> ADI>=1.32,
    //   CV2>=0.49 -> lumpy
    // key 2: 4 demand days over 4-day span -> ADI 1.0; sizes all 5 ->
    //   CV2 0.0 -> smooth
    // key 3: one day -> var_samp null -> n/a
    val in = daily(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-03", 10.0), (1L, "2024-01-06", 40.0),
      (2L, "2024-01-01", 5.0), (2L, "2024-01-02", 5.0),
      (2L, "2024-01-03", 5.0), (2L, "2024-01-04", 5.0),
      (3L, "2024-01-05", 9.0))
    val out = Forecast.demandClasses(in, "user_id", "day", "demand")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), r.getString(5)))
    assert(out.toSeq == Seq(
      (1L, 3L, 6L, Some(2.0), Some(0.75), "lumpy"),
      (2L, 4L, 4L, Some(1.0), Some(0.0), "smooth"),
      (3L, 1L, 1L, Some(1.0), None, "n/a")))
  }

  test("demandClasses: intermittent and erratic quadrants") {
    // intermittent: sparse but stable sizes — 3 days over 9-day span
    // (ADI 3.0), sizes 10,10,10 -> CV2 0
    // erratic: dense but variable — days 1..4 (ADI 1.0), sizes
    // 1,1,1,10: mean 3.25, var_samp 20.25 -> CV2 1.917
    val in = daily(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-05", 10.0), (1L, "2024-01-09", 10.0),
      (2L, "2024-01-01", 1.0), (2L, "2024-01-02", 1.0),
      (2L, "2024-01-03", 1.0), (2L, "2024-01-04", 10.0))
    val cls = Forecast.demandClasses(in, "user_id", "day", "demand")
      .orderBy("user_id").collect().map(_.getString(5))
    assert(cls.toSeq == Seq("intermittent", "erratic"))
  }

  test("scaledError: hand-computed RMSSE on a two-key series") {
    // global max = 01-10, horizon 3 -> split = 01-07.
    // key 1 observed 01-01..01-10 constant 10 except eval dip:
    //   train y: 10,10,10,10,10,10,10 -> diffs all 0 -> scale 0 -> null
    // key 2: y=2 on 01-01 and 01-03 only; zero-fill to 01-10.
    //   train days 01-01..01-07: y = 2,0,2,0,0,0,0
    //     diffs from t=2: (-2)^2,(2)^2,(-2)^2,0,0,0 -> mean 12/6 = 2
    //   fc = y at split (01-07) = 0
    //   eval days 01-08..01-10: y=0 -> mse 0 -> rmsse 0
    val k1 = (1 to 10).map(i => (1L, f"2024-01-$i%02d", 10.0))
    val k2 = Seq((2L, "2024-01-01", 2.0), (2L, "2024-01-03", 2.0))
    val in = daily(k1 ++ k2: _*)
    val out = Forecast.scaledError(in, "user_id", "day", "demand",
        horizon = 3, weightDays = 28)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    // weights: train totals key1 = 70, key2 = 4 -> 70/74, 4/74
    assert(out(0) == ((1L, None, Some(0.945946))))
    assert(out(1) == ((2L, Some(0.0), Some(0.054054))))
  }

  test("scaledError: a key absent from the eval window still scores (zero-filled eval)") {
    // key only active days 1-2; global max from key 9 reaches day 10.
    // Its eval days are all zero-filled; fc = carry of split-day zero.
    val in = daily(
      (1L, "2024-01-01", 4.0), (1L, "2024-01-02", 6.0),
      (9L, "2024-01-10", 1.0))
    val out = Forecast.scaledError(in, "user_id", "day", "demand",
        horizon = 3, weightDays = 28)
      .orderBy("user_id").collect()
    // key 1 train: 4,6,0,0,0,0,0 -> diffs 4,36,0,0,0,0 mean 40/6;
    // eval 0 vs fc 0 -> rmsse 0
    assert(out(0).getLong(0) == 1L && out(0).getDouble(1) == 0.0)
    // key 9 has no train days (first day > split) -> null rmsse
    assert(out(1).getLong(0) == 9L && out(1).isNullAt(1))
  }

  test("wrmsse: hand-computed metric against caller forecasts, zero-filled both sides") {
    // key 1: train [2,4,2,4,2] days 1-5 -> scale = mean(4,4,4,4) = 4
    //   eval actuals (4, 2) vs forecasts (3, 3) -> mse 1 -> rmsse 0.5
    // key 2: train [1,1,1] days 1-3, zero-filled to day 5 ->
    //   diffs (0,0,-1,0) -> scale 0.25; eval actuals absent (0,0) vs
    //   forecasts (1, missing->0) -> mse 0.5 -> rmsse sqrt(2)
    // weights: 14/17 and 3/17
    val train = daily(
      (1L, "2024-01-01", 2.0), (1L, "2024-01-02", 4.0), (1L, "2024-01-03", 2.0),
      (1L, "2024-01-04", 4.0), (1L, "2024-01-05", 2.0),
      (2L, "2024-01-01", 1.0), (2L, "2024-01-02", 1.0), (2L, "2024-01-03", 1.0))
    val actuals = daily((1L, "2024-01-06", 4.0), (1L, "2024-01-07", 2.0))
    val fcs = daily((1L, "2024-01-06", 3.0), (1L, "2024-01-07", 3.0),
      (2L, "2024-01-06", 1.0))
      .withColumnRenamed("demand", "fc")
    val per = Forecast.wrmsse(train, actuals, fcs,
      "user_id", "day", "demand", "fc", horizon = 2)
    val rows = per.orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, 0.5, 0.823529), (2L, 1.4142, 0.176471)),
      s"got $rows")
    val tot = Forecast.wrmsseTotal(per).head()
    assert(tot.getDouble(0) == 0.6613 && tot.getLong(1) == 2L, s"got $tot")
  }

  test("crostonForecast: closed form matches the hand-run SES recursion; single demand degenerates") {
    // key 1: z = 4, 8, 6 on days 1, 3, 6 (alpha 0.5)
    //   sizes:     s1=4, s2=.5*8+.5*4=6, s3=.5*6+.5*6=6      -> z_hat 6
    //   intervals: 2, 3: s1=2, s2=.5*3+.5*2=2.5              -> a_hat 2.5
    //   croston 6/2.5 = 2.4; sba 0.75*6/2.5 = 1.8
    val in = daily(
      (1L, "2024-01-01", 4.0), (1L, "2024-01-03", 8.0), (1L, "2024-01-06", 6.0),
      (2L, "2024-01-04", 9.0))
    val out = Forecast.crostonForecast(in, "user_id", "day", "demand")
      .orderBy("user_id").collect()
    val r1 = out(0)
    assert((r1.getLong(1), r1.getDouble(2), r1.getDouble(3),
      r1.getDouble(4), r1.getDouble(5)) == ((3L, 6.0, 2.5, 2.4, 1.8)))
    // single demand day: z_hat = the value, no interval series
    val r2 = out(1)
    assert(r2.getLong(1) == 1L && r2.getDouble(2) == 9.0 &&
      r2.isNullAt(3) && r2.isNullAt(4) && r2.isNullAt(5))
  }

  test("backtestSelect: seasonal series picks snaive7, constant series ties to naive") {
    // global span 01-01..01-14, horizon 7 -> split 01-07
    val k1 = (1 to 14).map(i => (1L, f"2024-01-$i%02d", 5.0))
    val k2 = Seq((2L, "2024-01-01", 10.0), (2L, "2024-01-08", 10.0))
    val out = Forecast.backtestSelect(daily(k1 ++ k2: _*),
        "user_id", "day", "demand", horizon = 7)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getString(4)))
    // constant: every forecaster is perfect; tie breaks to naive
    assert(out(0) == ((1L, 0.0, 0.0, 0.0, "naive")))
    // weekly spike: naive (0) misses the 10; snaive7 nails it;
    // mean 10/7 misses everywhere
    assert(out(1) == ((2L, 1.4286, 0.0, 2.449, "snaive7")), s"got ${out(1)}")
  }

  test("autocorrelation: alternating series hits acf_1 = -1, weekly spikes hit acf_7 = 1") {
    // key 1: strictly alternating 8-day series -> lag-1 corr exactly -1
    val alt = (1 to 8).map(i =>
      (1L, f"2024-01-$i%02d", if (i % 2 == 0) 1.0 else 0.0))
    // key 2: spike every 7th day over 21 days (observed rows only;
    // the zero days come from the densification)
    val weekly = Seq((2L, "2024-01-01", 5.0), (2L, "2024-01-08", 5.0),
      (2L, "2024-01-15", 5.0), (2L, "2024-01-21", 0.0))
    // key 3: constant -> zero variance -> null acf
    val const = Seq((3L, "2024-01-01", 2.0), (3L, "2024-01-02", 2.0))
    val out = Forecast.autocorrelation(daily(alt ++ weekly ++ const: _*),
        "user_id", "day", "demand", lags = Seq(1, 7))
      .orderBy("user_id").collect()
    assert(out(0).getDouble(2) == -1.0)
    assert(out(1).getDouble(3) == 1.0, s"acf_7 = ${out(1)}")
    assert(out(2).isNullAt(2) && out(2).isNullAt(3))
  }

  test("linearTrend: exact fit on a perfect line; single point degenerates to null") {
    val in = daily(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-02", 12.0), (1L, "2024-01-03", 14.0),
      (2L, "2024-01-02", 99.0))
    val out = Forecast.linearTrend(in, "user_id", "day", "demand")
      .orderBy("user_id").collect()
    val r1 = out(0)
    assert(r1.getLong(1) == 3L && r1.getDouble(2) == 2.0 &&
      r1.getDouble(3) == 10.0 && r1.getDouble(4) == 1.0)
    // intercept is at the CORPUS min day (2024-01-01), so key 2's
    // single point at x=1 has null slope/r2 (no x variance)
    assert(out(1).isNullAt(2) && out(1).isNullAt(4))
  }

  test("seasonalDecompose: pure weekly pattern decomposes to zero residual") {
    import spark.implicits._
    // Mon 2024-01-01 .. Sun 2024-01-14: y = 17 on Mondays, 10 else.
    // Full 7-day trend windows exist for days 4..11, trend = 77/7 = 11
    // there; seasonal(Mon) = 6, seasonal(other) = -1; resid = 0 inside
    // the full-trend region, null at the edges (pandas-style).
    val in = daily((1 to 14).map { i =>
      val day = f"2024-01-$i%02d"
      (1L, day, if ((i - 1) % 7 == 0) 17.0 else 10.0)
    }: _*)
    val out = Forecast.seasonalDecompose(in, "user_id", "day", "demand")
      .orderBy("day")
      .select("day", "trend", "seasonal", "resid")
      .as[(Date, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(out.size == 14)
    val byDay = out.map(r => (r._1.toString, r)).toMap
    assert(byDay("2024-01-08")._2.exists(_ == 11.0))
    assert(byDay("2024-01-08")._3.exists(_ == 6.0), s"Mon seasonal: $out")
    assert(byDay("2024-01-09")._3.exists(_ == -1.0))
    (4 to 11).foreach { i =>
      val r = byDay(f"2024-01-$i%02d")
      assert(r._4.exists(_ == 0.0), s"resid at day $i: $r")
    }
    Seq(1, 2, 3, 12, 13, 14).foreach { i =>
      val r = byDay(f"2024-01-$i%02d")
      assert(r._2.isEmpty && r._4.isEmpty, s"edge day $i must be null: $r")
    }
  }

  test("changepointScan: finds the level shift, short series yield no row") {
    import spark.implicits._
    // 10 days at 1.0 then 10 days at 5.0: best split after day 10,
    // stat = |1-5| * sqrt(10*10/20) = 4*sqrt(5) = 8.9443
    val shift = (1 to 20).map { i =>
      (1L, f"2024-01-$i%02d", if (i <= 10) 1.0 else 5.0)
    }
    // key 2: only 10 days < 2*minSeg -> excluded entirely
    val short = (1 to 10).map(i => (2L, f"2024-02-$i%02d", 3.0))
    val out = Forecast.changepointScan(daily(shift ++ short: _*),
        "user_id", "day", "demand", minSeg = 7)
      .as[(Long, Date, Double, Double, Double)].collect().toSeq
    assert(out == Seq((1L, d("2024-01-10"), 1.0, 5.0, 8.9443)), s"got $out")
  }

  test("reconcileTopDown: bottom-up reads last week, top-down allocates the aggregate by share") {
    import spark.implicits._
    // equal historical shares but a flipped final-week mix: bottom-up
    // keeps the flip (30/10), top-down splits the 40 total 20/20
    val in = daily(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-08", 30.0),
      (2L, "2024-01-01", 30.0), (2L, "2024-01-08", 10.0))
    val got = Forecast.reconcileTopDown(in, "user_id", "day", "demand")
      .filter(col("h_day") === 7)
      .orderBy("user_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 7L, 30.0, 20.0), (2L, 7L, 10.0, 20.0)),
      s"got $got")
    // horizon days with no lag-7 observation forecast zero both ways
    val h1 = Forecast.reconcileTopDown(in, "user_id", "day", "demand")
      .filter(col("h_day") === 1)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(h1.forall(r => r._3 == 0.0 && r._4 == 0.0), s"got $h1")
  }

  test("longestZeroRun: gaps densify as zeros, runs merge across explicit and implicit zeros") {
    import spark.implicits._
    // key 1: obs on d1 (5), d2 (0), d6 (3): days 3-5 are gap zeros,
    // so the zero run is d2..d5 = 4 days; key 2 never zero
    val in = daily(
      (1L, "2024-01-01", 5.0), (1L, "2024-01-02", 0.0),
      (1L, "2024-01-06", 3.0),
      (2L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0))
    val got = Forecast.longestZeroRun(in, "user_id", "day", "demand")
      .orderBy("user_id")
      .as[(Long, Long, Long, Long, Option[Date])].collect().toSeq
    assert(got == Seq(
      (1L, 6L, 4L, 4L, Some(d("2024-01-02"))),
      (2L, 2L, 0L, 0L, None)), s"got $got")
  }

  test("olsTrendWeekend: an exact linear+weekend model is recovered; no-weekend key is singular") {
    import spark.implicits._
    // 2024-01-01 is a Monday; y = 2 + 0.5*day + 3*weekend over 14 days
    val days = (0 until 14).map { i =>
      val d = java.sql.Date.valueOf(java.time.LocalDate
        .of(2024, 1, 1).plusDays(i))
      val wknd = if (i % 7 == 5 || i % 7 == 6) 3.0 else 0.0
      (1L, d, 2.0 + 0.5 * i + wknd)
    }
    // key 2: weekdays only -> the weekend column is all zero ->
    // singular normal equations -> null coefficients
    val flat = (0 until 5).map { i =>
      (2L, java.sql.Date.valueOf(java.time.LocalDate
        .of(2024, 1, 1).plusDays(i)), 10.0)
    }
    val df = (days ++ flat).toDF("user_id", "day", "demand")
    val got = Forecast.olsTrendWeekend(df, "user_id", "day", "demand")
      .orderBy("user_id")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      (1L, 14L, Some(2.0), Some(0.5), Some(3.0)),
      (2L, 5L, None, None, None)), s"got $got")
  }

  test("theilSenSlope: the median slope shrugs off the outlier least-squares can't") {
    import spark.implicits._
    // days 1..5 values 0,1,2,3,100: 6 of 10 pairwise slopes are 1;
    // sorted slopes [1,1,1,1,1,1,25,33,49,97] -> median 1.0 (the
    // regr_slope on the same series is ~19)
    val in = daily(
      (1L, "2024-01-01", 0.0), (1L, "2024-01-02", 1.0),
      (1L, "2024-01-03", 2.0), (1L, "2024-01-04", 3.0),
      (1L, "2024-01-05", 100.0),
      // singleton series: no pairs, no row
      (2L, "2024-01-01", 7.0))
    val got = Forecast.theilSenSlope(in, "user_id", "day", "demand")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 5L, 10L, 1.0)), s"got $got")
  }

  test("newsvendorOrderPoint: exact 0.8 quantile, mean, safety stock") {
    import spark.implicits._
    // demands 1..5: p=0.8 -> pos 3.2 -> 4 + 0.2*(5-4) = 4.2; mean 3
    val df = (1 to 5).map(v => (1L, v.toDouble)).toDF("k", "demand")
    val got = Forecast.newsvendorOrderPoint(df, "k", "demand", 0.8)
      .as[(Long, Long, Double, Double, Double)].collect()(0)
    assert(got == ((1L, 5L, 3.0, 4.2, 1.2)), s"got $got")
  }

  test("seasonalStrength: pure weekly pattern maxes seasonal strength, pure ramp maxes trend strength") {
    import spark.implicits._
    val d0 = Date.valueOf("2024-01-01")
    def day(i: Int) = new Date(d0.getTime + i * 86400000L)
    // seasonal key: exact weekly pattern over 4 weeks -> residual 0
    // inside the trended region -> strength_seasonal = 1
    val pattern = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0)
    val seasonal = (0 until 28).map(i => ("s", day(i), pattern(i % 7)))
    // trend key: a clean ramp -> detrended is ~0 -> strength_trend = 1
    val ramp = (0 until 28).map(i => ("t", day(i), 10.0 + i))
    val got = Forecast.seasonalStrength(
        (seasonal ++ ramp).toDF("k", "d", "v"), "k", "d", "v")
      .orderBy("k")
      .as[(String, Long, Option[Double], Option[Double])].collect().toSeq
    val s = got(0); val t = got(1)
    assert(s._1 == "s" && s._3.contains(1.0),
      s"weekly pattern must be fully seasonal: $s")
    assert(t._1 == "t" && t._4.contains(1.0),
      s"ramp must be fully trending: $t")
    // and the cross readings stay LOW: the ramp has no seasonality
    assert(t._3.forall(_ < 0.5), s"ramp is not seasonal: $t")
  }

  test("mannKendallTrend: monotone S = C(n,2) and tau = 1; ties contribute 0; reversal flips sign") {
    import spark.implicits._
    // key a: strictly rising 5 points -> S = 10, tau = 1
    // key b: 1,2,2,1 -> pairs: (1,2)+ (1,2)+ (1,1)0 (2,2)0 (2,1)- (2,1)-
    //        S = 0, tau = 0
    // key c: strictly falling 3 points -> S = -3, tau = -1
    // key d: single point -> no pairs, no row
    val df = (
      (1 to 5).map(i => ("a", i, i.toDouble)) ++
      Seq(("b", 1, 1.0), ("b", 2, 2.0), ("b", 3, 2.0), ("b", 4, 1.0)) ++
      (1 to 3).map(i => ("c", i, (10 - i).toDouble)) ++
      Seq(("d", 1, 7.0))
    ).toDF("k", "o", "v")
    val got = Forecast.mannKendallTrend(df, "k", "o", "v")
      .orderBy("k")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 5L, 10L, 1.0),
      ("b", 4L, 0L, 0.0),
      ("c", 3L, -3L, -1.0)), s"got $got")
  }

  test("periodicityScan: a pure period-2 alternation scores R2 = 1 at p = 2, 0 at p = 3") {
    import java.sql.Date
    import spark.implicits._
    val d0 = Date.valueOf("2024-01-01")
    def day(i: Int) = new Date(d0.getTime + i * 86400000L)
    val df = (0 until 6).map(i =>
      ("k", day(i), if (i % 2 == 0) 1.0 else 3.0)).toDF("k", "d", "v")
    val got = Forecast.periodicityScan(df, "k", "d", "v", maxPeriod = 4)
      .orderBy("period")
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(got.map(_._2) == Seq(2L, 3L, 4L))
    assert(got(0)._4.contains(1.0), s"perfect period 2: $got")
    assert(got(1)._4.contains(0.0), s"period 3 folds flat: $got")
    // p = 4 is a harmonic-free fold of a period-2 signal: positions
    // (1,3,1,3) -> still perfectly separated, R2 = 1
    assert(got(2)._4.contains(1.0), s"period 4 inherits period 2: $got")
    // constant series: SS_total = 0 -> null score
    val const = (0 until 5).map(i => ("c", day(i), 2.0)).toDF("k", "d", "v")
    assert(Forecast.periodicityScan(const, "k", "d", "v", maxPeriod = 3)
      .as[(String, Long, Long, Option[Double])].collect()
      .forall(_._4.isEmpty))
  }

  test("holtWinters: constant series is flat (level = c, trend 0, next week 7c); hand fold on a trend") {
    import spark.implicits._
    def day(i: Int) = java.sql.Date.valueOf(s"2020-01-${"%02d".format(i + 1)}")
    val const = (0 until 14).map(i => ("u", day(i), 5.0)).toDF("k", "d", "v")
    val c = Forecast.holtWinters(const, "k", "d", "v").head()
    assert(c.getLong(1) == 14L && c.getDouble(2) == 5.0 &&
      c.getDouble(3) == 0.0 && c.getDouble(4) == 35.0, s"got $c")

    // reference fold in plain Scala doubles — the executable spec of
    // the engine's aggregate() expression (the cusum precedent)
    val ys = (0 until 10).map(i => 2.0 + i * 1.5)
    val (alpha, beta, gamma, m) = (0.3, 0.1, 0.2, 7)
    var (l, b) = (0.0, 0.0); val sArr = Array.fill(m)(0.0); var i2 = 0
    ys.foreach { y =>
      if (i2 == 0) { l = y; b = 0.0 }
      else {
        val idx = i2 % m
        val lN = alpha * (y - sArr(idx)) + (1.0 - alpha) * (l + b)
        val bN = beta * (lN - l) + (1.0 - beta) * b
        sArr(idx) = gamma * (y - lN) + (1.0 - gamma) * sArr(idx)
        l = lN; b = bN
      }
      i2 += 1
    }
    val next = l * m + b * (1 to m).sum + sArr.sum
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = ys.zipWithIndex.map { case (y, j) => ("u", day(j), y) }
      .toDF("k", "d", "v")
    val got = Forecast.holtWinters(df, "k", "d", "v").head()
    assert(got.getDouble(2) == r4(l) && got.getDouble(3) == r4(b) &&
      got.getDouble(4) == r4(next), s"got $got vs ($l, $b, $next)")
  }

  test("negBinomialFit: hand moments, regime gating, degenerate keys") {
    import spark.implicits._
    val rows =
      Seq(0, 1, 2, 3, 10).map(("a", _)) ++ // overdispersed
        Seq(2, 2, 2, 3).map(("b", _)) ++   // underdispersed
        Seq(("c", 7)) ++                   // single row: no variance
        Seq(("d", 0), ("d", 0))            // all-zero: mean 0
    val got = Forecast.negBinomialFit(rows.toDF("k", "v"), Seq("k"), "v")
      .orderBy("k").collect()
    val a = got(0)
    // mean 3.2, var (114 - 5*10.24)/4 = 15.7
    assert(a.getAs[Double]("mean") == 3.2 &&
      a.getAs[Double]("variance") == 15.7, s"got $a")
    assert(a.getAs[Double]("dispersion") == 4.90625)
    assert(a.getAs[Int]("overdispersed") == 1)
    assert(a.getAs[Double]("nb_r") == 0.8192, s"got ${a.getAs[Double]("nb_r")}")
    assert(math.abs(a.getAs[Double]("nb_p") - 3.2 / 15.7) < 1e-6)
    val b = got(1)
    assert(b.getAs[Int]("overdispersed") == 0 &&
      b.isNullAt(b.fieldIndex("nb_r")) && b.isNullAt(b.fieldIndex("nb_p")),
      s"underdispersed key must emit moments but no fit: $b")
    val c = got(2)
    assert(c.isNullAt(c.fieldIndex("variance")) &&
      c.isNullAt(c.fieldIndex("overdispersed")), s"single row: $c")
    val d = got(3)
    assert(d.getAs[Double]("mean") == 0.0 &&
      d.isNullAt(d.fieldIndex("dispersion")) &&
      d.isNullAt(d.fieldIndex("overdispersed")), s"zero mean: $d")
  }
}
