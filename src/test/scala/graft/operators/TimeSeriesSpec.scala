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
}
