package graft.operators

import java.sql.Date

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private lazy val trades = Seq(
    ("A", d("2024-01-05"), 100.0),
    ("A", d("2024-01-10"), 101.0),
    ("A", d("2024-01-20"), 102.0),
    ("B", d("2024-01-07"), 200.0),
    ("C", d("2024-01-07"), 300.0)) // key with no quotes at all
    .toDF("sym", "trade_date", "trade_px")

  private lazy val quotes = Seq(
    ("A", d("2024-01-04"), 99.5),
    ("A", d("2024-01-10"), 100.5), // exact-ts match for the 01-10 trade
    ("A", d("2024-01-12"), 101.5),
    ("B", d("2024-01-01"), 199.0))
    .toDF("sym", "quote_date", "quote_px")

  test("asofJoin: most recent right value at or before each left ts, per key") {
    val out = TimeSeries.asofJoin(trades, quotes, Seq("sym"),
        "trade_date", "quote_date", Seq("quote_px"))
      .orderBy("sym", "trade_date")
      .select("sym", "trade_date", "quote_px")
      .as[(String, Date, Option[Double])].collect().toSeq
    assert(out == Seq(
      ("A", d("2024-01-05"), Some(99.5)),
      ("A", d("2024-01-10"), Some(100.5)), // ties take the exact match
      ("A", d("2024-01-20"), Some(101.5)),
      ("B", d("2024-01-07"), Some(199.0)),
      ("C", d("2024-01-07"), None)))       // no right rows → null
  }

  test("asofJoin with tolerance: stale right rows null out") {
    val out = TimeSeries.asofJoin(trades, quotes, Seq("sym"),
        "trade_date", "quote_date", Seq("quote_px"), toleranceDays = Some(3))
      .orderBy("sym", "trade_date")
      .select("sym", "trade_date", "quote_px")
      .as[(String, Date, Option[Double])].collect().toSeq
    assert(out == Seq(
      ("A", d("2024-01-05"), Some(99.5)),   // 1 day old — within 3
      ("A", d("2024-01-10"), Some(100.5)),  // exact
      ("A", d("2024-01-20"), None),         // 8 days stale
      ("B", d("2024-01-07"), None),         // 6 days stale
      ("C", d("2024-01-07"), None)))
  }

  test("asofJoin: value and tolerance timestamp come from the SAME right row") {
    // The most recent quote for A before 01-10 carries a NULL px. The
    // whole last row must win (pandas merge_asof semantics): the output
    // is NULL, never the older row's 99.5 paired with the newer row's
    // timestamp passing the tolerance check.
    val sparseQuotes = Seq(
      ("A", d("2024-01-04"), Option(99.5)),
      ("A", d("2024-01-09"), Option.empty[Double]))
      .toDF("sym", "quote_date", "quote_px")
    val out = TimeSeries.asofJoin(
        trades.filter($"sym" === "A" && $"trade_date" === d("2024-01-10")),
        sparseQuotes, Seq("sym"), "trade_date", "quote_date", Seq("quote_px"),
        toleranceDays = Some(3))
      .select("quote_px").as[Option[Double]].collect().toSeq
    assert(out == Seq(None),
      "must not pair the newest row's ts with an older row's value")
  }

  test("asofJoin preserves left row count and columns") {
    val out = TimeSeries.asofJoin(trades, quotes, Seq("sym"),
      "trade_date", "quote_date", Seq("quote_px"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == trades.columns.toSeq :+ "quote_px")
  }
}
