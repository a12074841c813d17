package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int, min: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:$min%02d:00")

  private lazy val events = Seq(
    (ts(1, 3), "click", 1.0), (ts(1, 9), "click", 2.5), (ts(1, 12), "view", 4.0),
    (ts(2, 1), "click", 3.0), (ts(2, 5), "view", 1.5))
    .toDF("ts", "event_type", "value")

  test("tumbling (batch) == date_trunc groupBy form") {
    val viaWindow = Windows.tumbling(events, "ts", "1 day",
        Seq(col("event_type")), Seq(count(lit(1)).as("cnt"), sum(col("value")).as("total")))
      .select(to_date(col("window_start")).as("day"), col("event_type"), col("cnt"), col("total"))
    val viaTrunc = events
      .groupBy(to_date(date_trunc("DAY", col("ts"))).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"))
    assert(viaWindow.exceptAll(viaTrunc).isEmpty && viaTrunc.exceptAll(viaWindow).isEmpty)
  }

  test("sliding: each row lands in length/slide windows") {
    val out = Windows.sliding(events, "ts", "2 days", "1 day",
      Seq(col("event_type")), Seq(count(lit(1)).as("cnt")))
    // each of the 5 rows appears in exactly 2 windows
    assert(out.agg(sum(col("cnt"))).head().getLong(0) == 10L)
  }

  test("sessionized: gap merge per key") {
    val df = Seq(
      ("u1", ts(1, 10, 0)), ("u1", ts(1, 10, 20)), // one session (gap 30m)
      ("u1", ts(1, 12, 0)),                        // new session
      ("u2", ts(1, 10, 5))).toDF("user", "ts")
    val out = Windows.sessionized(df, "ts", "30 minutes",
      Seq(col("user")), Seq(count(lit(1)).as("cnt")))
    val sessions = out.orderBy("user", "session_start")
      .select("user", "cnt").as[(String, Long)].collect().toSeq
    assert(sessions == Seq(("u1", 2L), ("u1", 1L), ("u2", 1L)))
  }
}
