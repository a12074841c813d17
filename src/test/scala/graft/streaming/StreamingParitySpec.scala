package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X11 streaming parity (SURVEY §5.2.6): the tumbling-window
  * aggregation of T31 run through Structured Streaming (`window` +
  * watermark, append mode) equals the batch `date_trunc` form on the
  * same events; late data beyond the watermark is dropped.
  */
class StreamingParitySpec extends SparkSpec {
  import spark.implicits._
  import StreamingParitySpec.Ev

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private val events = Seq(
    Ev(ts(1, 3), "click", 1.0), Ev(ts(1, 9), "click", 2.5), Ev(ts(1, 12), "view", 4.0),
    Ev(ts(2, 1), "click", 3.0), Ev(ts(2, 5), "view", 1.5), Ev(ts(2, 23), "view", 2.0),
    Ev(ts(3, 8), "purchase", 9.0))

  private def runStream(batches: Seq[Seq[Ev]]): Map[(String, String), (Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // the SAME operator body as the batch form — only the watermark
    // (required for append output) differs
    val agg = Windows.tumbling(mem.toDF(), "ts", "1 day",
        Seq(col("event_type")),
        Seq(count(lit(1)).as("cnt"), sum(col("value")).as("total")),
        watermark = Some("1 day"))
      .select(to_date(col("window_start")).as("day"), col("event_type"),
        col("cnt"), col("total"))
    val sinkName = s"paritysink_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      // a far-future sentinel pushes the watermark past every real
      // window so append mode emits all of them
      mem.addData(Ev(Timestamp.valueOf("2024-02-01 00:00:00"), "__sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(sinkName).filter(col("event_type") =!= "__sentinel")
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
  }

  private def runBatch(evs: Seq[Ev]): Map[(String, String), (Long, Double)] =
    evs.toDF()
      .groupBy(to_date(date_trunc("DAY", col("ts"))).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

  test("streaming tumbling window == batch date_trunc on in-order replay") {
    val streamed = runStream(Seq(events.sortBy(_.ts.getTime)))
    assert(streamed == runBatch(events))
  }

  test("streaming session window == batch session window on in-order replay") {
    implicit val sqlCtx = spark.sqlContext
    // u1: two sessions (40m gap splits), u2: one session
    val sess = Seq(
      Ev(Timestamp.valueOf("2024-01-01 10:00:00"), "u1", 1.0),
      Ev(Timestamp.valueOf("2024-01-01 10:20:00"), "u1", 1.0),
      Ev(Timestamp.valueOf("2024-01-01 11:00:00"), "u1", 1.0),
      Ev(Timestamp.valueOf("2024-01-01 10:05:00"), "u2", 1.0))
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type").as("user"),
        unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val batch = shape(Windows.sessionized(sess.toDF(), "ts", "30 minutes",
      Seq(col("event_type")), Seq(count(lit(1)).as("n"))))

    val mem = MemoryStream[Ev]
    val agg = Windows.sessionized(mem.toDF(), "ts", "30 minutes",
      Seq(col("event_type")), Seq(count(lit(1)).as("n")),
      watermark = Some("1 day"))
    val sinkName = s"sessionsink_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start()
    val streamed = try {
      mem.addData(sess.sortBy(_.ts.getTime))
      q.processAllAvailable()
      mem.addData(Ev(Timestamp.valueOf("2024-02-01 00:00:00"), "__sentinel", 0.0))
      q.processAllAvailable()
      shape(spark.table(sinkName).filter(col("event_type") =!= "__sentinel"))
    } finally q.stop()
    assert(streamed == batch)
  }

  test("stream-stream interval join == batch interval join on in-order replay") {
    implicit val sqlCtx = spark.sqlContext
    // "purchase within 2h after a click, same user" — u1 has one match
    // in range, one out of range; u2's purchase precedes its click
    val clicks = Seq(
      Ev(Timestamp.valueOf("2024-01-01 10:00:00"), "u1", 1.0),
      Ev(Timestamp.valueOf("2024-01-01 18:00:00"), "u1", 2.0),
      Ev(Timestamp.valueOf("2024-01-01 09:00:00"), "u2", 3.0))
    val buys = Seq(
      Ev(Timestamp.valueOf("2024-01-01 11:30:00"), "u1", 10.0),
      Ev(Timestamp.valueOf("2024-01-01 08:00:00"), "u2", 30.0))

    def shape(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    def joined(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
        wm: Option[String]) =
      Windows.intervalJoin(
          l.select(col("event_type").as("user"), col("ts").as("click_ts")),
          r.select(col("event_type").as("user2"), col("ts").as("buy_ts"))
            .withColumnRenamed("user2", "user"),
          Seq("user"), "click_ts", "buy_ts", before = "0 hours", after = "2 hours",
          watermark = wm)
        .select(col("user"), col("click_ts"), col("buy_ts"))

    val batch = shape(joined(clicks.toDF(), buys.toDF(), None))
    assert(batch == Set(("u1",
      Timestamp.valueOf("2024-01-01 10:00:00"),
      Timestamp.valueOf("2024-01-01 11:30:00"))))

    val memL = MemoryStream[Ev]
    val memR = MemoryStream[Ev]
    val sinkName = s"intervalsink_${System.nanoTime()}"
    val q = joined(memL.toDF(), memR.toDF(), Some("1 hour"))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start()
    val streamed = try {
      memL.addData(clicks.sortBy(_.ts.getTime))
      memR.addData(buys.sortBy(_.ts.getTime))
      q.processAllAvailable()
      // push both watermarks far past the data so all matches emit
      memL.addData(Ev(Timestamp.valueOf("2024-02-01 00:00:00"), "__s", 0.0))
      memR.addData(Ev(Timestamp.valueOf("2024-02-01 00:00:00"), "__s", 0.0))
      q.processAllAvailable()
      shape(spark.table(sinkName).filter(col("user") =!= "__s"))
    } finally q.stop()
    assert(streamed == batch)
  }

  test("late data beyond the watermark is dropped; batch counts it") {
    // first batch advances the event-time clock to Jan 5; the Jan 1
    // straggler then arrives 4 days late against a 1-day watermark
    val head = events :+ Ev(ts(5, 1), "click", 1.0)
    val straggler = Ev(ts(1, 22), "click", 100.0)
    val streamed = runStream(Seq(head, Seq(straggler)))
    val withoutStraggler = runBatch(head)
    val withStraggler = runBatch(head :+ straggler)
    assert(streamed == withoutStraggler, "stream must drop the late row")
    assert(streamed != withStraggler, "batch WOULD count it — that's the declared divergence")
  }
}

object StreamingParitySpec {
  // top-level so Spark can derive an Encoder without an outer scope
  case class Ev(ts: Timestamp, event_type: String, value: Double)
}
