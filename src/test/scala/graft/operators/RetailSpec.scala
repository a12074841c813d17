package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Retail tier (X86–X87): association-rule math against hand counts,
  * duplicate-line dedup, and the RFM quintile/segment contract. */
class RetailSpec extends SparkSpec {
  import spark.implicits._

  test("marketBasket: hand-computed support/confidence/lift; duplicate lines dedup") {
    // baskets: 1:{A,B,C} 2:{A,B} 3:{A}; line for A in order 1 repeated
    val items = Seq(
      (1L, "A"), (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (3L, "A"))
      .toDF("oid", "item")
    val got = Retail.marketBasket(items, "oid", "item", topK = 10)
      .orderBy("item_a", "item_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toSeq
    assert(got == Seq(
      // (A,B) in 2 of 3 baskets; A in 3, B in 2 -> lift 2*3/(3*2)=1
      ("A", "B", 2L, 0.666667, 0.666667, 1.0),
      ("A", "C", 1L, 0.333333, 0.333333, 1.0),
      // (B,C): lift 1*3/(2*1) = 1.5 — C only rides with B
      ("B", "C", 1L, 0.333333, 0.5, 1.5)), s"got $got")
  }

  test("marketBasket: topK truncates by co-occurrence with deterministic ties") {
    val items = Seq((1L, "A"), (1L, "B"), (1L, "C"), (2L, "A"), (2L, "B"))
      .toDF("oid", "item")
    val got = Retail.marketBasket(items, "oid", "item", topK = 1).collect()
    assert(got.length == 1 &&
      got(0).getString(0) == "A" && got(0).getString(1) == "B")
  }

  test("rfmSegments: clean quintiles score 1-5 and land the standard segments") {
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    // customer i places i orders of 100 on days 1..i: f=i, m=100i,
    // recency = 5-i (gmax = day 5)
    val orders = (1 to 5).flatMap(i => (1 to i).map(d => (i.toLong, ts(d), 100.0)))
      .toDF("cust", "odate", "amount")
    val got = Retail.rfmSegments(orders, "cust", "odate", "amount")
      .orderBy("cust")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
      .toSeq
    assert(got == Seq(
      (1L, 4L, 1L, 100.0, 1L, 1L, 1L, "at_risk"),
      (2L, 3L, 2L, 200.0, 2L, 2L, 2L, "at_risk"),
      (3L, 2L, 3L, 300.0, 3L, 3L, 3L, "loyal"),
      (4L, 1L, 4L, 400.0, 4L, 4L, 4L, "champion"),
      (5L, 0L, 5L, 500.0, 5L, 5L, 5L, "champion")), s"got $got")
  }

  test("rfmSegments: empty input returns an empty frame, not a collect crash") {
    val empty = Seq.empty[(Long, Timestamp, Double)]
      .toDF("cust", "odate", "amount")
    val got = Retail.rfmSegments(empty, "cust", "odate", "amount")
    assert(got.count() == 0)
    assert(got.columns.toSeq == Seq("cust", "r", "f", "m",
      "r_score", "f_score", "m_score", "segment"), got.columns.toSeq)
  }

  test("abcClassification: hand-computed cumulative shares and class boundaries") {
    // revenues 50, 30, 15, 5 -> cum shares .50 .80 .95 1.00; the .80
    // and .95 keys sit EXACTLY on the cuts and must land A and B
    val items = Seq(("k1", 50.0), ("k2", 30.0), ("k3", 15.0), ("k4", 5.0))
      .toDF("key", "amt")
    val got = Retail.abcClassification(items, "key", "amt")
      .orderBy("key")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getString(3)))
      .toSeq
    assert(got == Seq(
      ("k1", 50.0, 0.5, "A"), ("k2", 30.0, 0.8, "A"),
      ("k3", 15.0, 0.95, "B"), ("k4", 5.0, 1.0, "C")), s"got $got")
  }

  test("abcClassification: revenue ties order by key so shares are a total order") {
    val items = Seq(("b", 10.0), ("a", 10.0)).toDF("key", "amt")
    val got = Retail.abcClassification(items, "key", "amt")
      .orderBy("key")
      .collect()
      .map(r => (r.getString(0), r.getDouble(2)))
      .toSeq
    assert(got == Seq(("a", 0.5), ("b", 1.0)), s"got $got")
    // r13 verdict #2 plan pin: no empty-partitionBy cumulative window
    // over the item-cardinality ranked frame — every Window is the
    // bounded chunk machinery
    val plan = Retail.abcClassification(items, "key", "amt")
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(_.contains("__pfx_c")),
      s"no item-cardinality cumulative Window expected in:\n$plan")
  }

  test("cohortLtv: month offsets, active counts, and per-customer cumulative LTV") {
    def ts(m: Int, d: Int) = Timestamp.valueOf(f"2024-$m%02d-$d%02d 00:00:00")
    // cohort 2024-01: c1 (jan 100, feb 50), c2 (jan 200);
    // cohort 2024-02: c3 (feb 80)
    val orders = Seq(
      (1L, ts(1, 5), 100.0), (1L, ts(2, 9), 50.0),
      (2L, ts(1, 20), 200.0), (3L, ts(2, 1), 80.0))
      .toDF("cust", "odate", "amount")
    val got = Retail.cohortLtv(orders, "cust", "odate", "amount")
      .orderBy("cohort_month", "month_offset")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
      .toSeq
    assert(got == Seq(
      // jan cohort: offset 0 rev 300 over 2 customers -> 150; offset 1
      // adds 50 -> cum 350/2 = 175, only c1 active
      ("2024-01", 0L, 2L, 2L, 300.0, 150.0),
      ("2024-01", 1L, 2L, 1L, 50.0, 175.0),
      ("2024-02", 0L, 1L, 1L, 80.0, 80.0)), s"got $got")
  }

  test("priceElasticity: an exact constant-elasticity curve recovers its own exponent") {
    // q = 1000 / price^2 at unit prices 1, 2, 4 (revenue = q*price):
    // elasticity must come back exactly -2; a constant-price item is
    // singular and nulls out
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val rows = Seq((1.0, 1000.0), (2.0, 250.0), (4.0, 62.5)).zipWithIndex
      .map { case ((p, q), i) => (10L, ts(i + 1), p * q, q) } ++
      Seq((20L, ts(1), 50.0, 5.0), (20L, ts(2), 100.0, 10.0),
        (20L, ts(3), 70.0, 7.0)) // unit price always 10 -> no variation
    val df = rows.toDF("item", "sdate", "revenue", "qty")
    val got = Retail.priceElasticity(df, "item", "sdate", "revenue",
        "qty")
      .orderBy("item")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toSeq
    assert(got == Seq((10L, 3L, Some(-2.0)), (20L, 3L, None)),
      s"got $got")
  }

  test("itemCosine: hand-computed cosine, minCount floor, deterministic topK") {
    // baskets: {A,B} {A,B} {A,C}: n_A=3 n_B=2 n_C=1;
    // (A,B) n=2 cos = 2/sqrt(6); (A,C) n=1 drops below minCount=2
    val items = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C")).toDF("oid", "item")
    val got = Retail.itemCosine(items, "oid", "item", topK = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
      .toSeq
    val expected = BigDecimal(2.0 / math.sqrt(6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(("A", "B", 2L, expected)), s"got $got")
  }

  test("repurchaseStats: repeat share, orders per customer, exact median gap") {
    import spark.implicits._
    val d = (s: String) => java.sql.Date.valueOf(s)
    val df = Seq(
      (1L, d("2024-01-01")), (1L, d("2024-01-03")),
      (2L, d("2024-01-05")))
      .toDF("c", "dt")
    val got = Retail.repurchaseStats(df, "c", "dt")
      .as[(Long, Long, Double, Double, Double)].collect()(0)
    assert(got == ((2L, 1L, 0.5, 1.5, 2.0)), s"got $got")
  }

  test("priceEndings: exact cents endings, shares, charm flag") {
    import spark.implicits._
    val df = Seq(1.99, 2.99, 3.50, 4.00).toDF("p")
    val got = Retail.priceEndings(df, "p")
      .orderBy("ending")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 0.25, 0L),
      (50L, 1L, 0.25, 0L),
      (99L, 2L, 0.5, 1L)), s"got $got")
  }

  test("abcXyzMatrix: revenue classes cross hand-computed CV classes") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val weeks = Seq("2024-01-01", "2024-01-08", "2024-01-15").map(d)
    // revenues 70/20/10 -> cum shares .7 A / .9 B / 1.0 C
    // weekly qtys: k1 (10,10,10) cv 0 -> X; k2 (1,10,1) cv 1.299 -> Z;
    // k3 (2,8,5) cv 0.6 -> Y
    val rows =
      Seq((30.0, 10.0), (20.0, 10.0), (20.0, 10.0)).zip(weeks)
        .map { case ((a, q), w) => ("k1", w, a, q) } ++
      Seq((5.0, 1.0), (10.0, 10.0), (5.0, 1.0)).zip(weeks)
        .map { case ((a, q), w) => ("k2", w, a, q) } ++
      Seq((3.0, 2.0), (4.0, 8.0), (3.0, 5.0)).zip(weeks)
        .map { case ((a, q), w) => ("k3", w, a, q) }
    val got = Retail.abcXyzMatrix(rows.toDF("k", "day", "amt", "qty"),
        "k", "day", "amt", "qty")
      .orderBy("key")
      .as[(String, Double, String, Long, Option[Double], String, String)]
      .collect().toSeq
    assert(got == Seq(
      ("k1", 70.0, "A", 3L, Some(0.0), "X", "AX"),
      ("k2", 20.0, "B", 3L, Some(1.299), "Z", "BZ"),
      ("k3", 10.0, "C", 3L, Some(0.6), "Y", "CY")), s"got $got")
  }

  test("priceChangeProfile: hand weekly deltas — changes, max jump, mean change") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    // k1 weekly unit prices: 10.00, 10.00, 12.50, 11.00
    //   deltas: 0, +2.50, -1.50 -> 2 changes, max 2.50, mean (0+2.5+1.5)/3
    val rows = Seq(
      ("k1", d("2024-01-01"), 20.0, 2.0),
      ("k1", d("2024-01-08"), 30.0, 3.0),
      ("k1", d("2024-01-15"), 25.0, 2.0),
      ("k1", d("2024-01-22"), 22.0, 2.0),
      // single-week key -> dropped
      ("k2", d("2024-01-01"), 5.0, 1.0))
    val got = Retail.priceChangeProfile(rows.toDF("k", "day", "amt", "qty"),
        "k", "day", "amt", "qty")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("k1", 4L, 2L, 2.5, 1.3333)), s"got $got")
  }

  test("basketSizeProfile: hand lines-per-order distribution with shares") {
    import spark.implicits._
    // orders: 1 -> 3 lines, 2 -> 1 line, 3 -> 1 line, 4 -> 2 lines
    val df = Seq(1L, 1L, 1L, 2L, 3L, 4L, 4L).map(o => (o, "x"))
      .toDF("o", "item")
    val got = Retail.basketSizeProfile(df, "o")
      .orderBy("n_lines")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 0.5), (2L, 1L, 0.25), (3L, 1L, 0.25)),
      s"got $got")
  }

  test("hhiConcentration: hand shares, monopoly group, exact round-then-add") {
    val df = Seq(
      ("g", "e1", 50.0), ("g", "e2", 30.0), ("g", "e3", 20.0),
      ("m", "e9", 10.0)).toDF("grp", "ent", "v")
    val got = Retail.hhiConcentration(df, Seq("grp"), "ent", "v")
      .orderBy("grp")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    // g: shares .5/.3/.2 -> HHI .25+.09+.04 = .38, top .5
    assert(got(0) == (("g", 3L, 100.0, 0.5, 0.38)), s"got ${got(0)}")
    // m: single entity -> HHI 1, top 1
    assert(got(1) == (("m", 1L, 10.0, 1.0, 1.0)), s"got ${got(1)}")
  }

  test("discountResponse: per-level volumes, shares, and uplift vs the zero-discount baseline") {
    val lines = Seq(
      (0.00, 2.0, 10.0), (0.00, 2.0, 10.0), (0.10, 4.0, 10.0))
      .toDF("disc", "qty", "price")
    val got = Retail.discountResponse(lines, "disc", "qty", "price")
      .orderBy("discount")
      .as[(Double, Long, Double, Double, Double, Double, Option[Double])]
      .collect().toSeq
    // level 0: n=2, qty 4, avg 2, uplift 1; level .10: qty 4, avg 4,
    // uplift 2; rev 20 vs 9 -> shares 20/29, 9/29
    assert(got.map(g => (g._1, g._2, g._3, g._4)) ==
      Seq((0.0, 2L, 4.0, 2.0), (0.1, 1L, 4.0, 4.0)), s"got $got")
    assert(got(0)._5 == 0.5 && got(1)._5 == 0.5, s"qty shares: $got")
    assert(math.abs(got(0)._6 - 20.0 / 29) < 1e-6 &&
      math.abs(got(1)._6 - 9.0 / 29) < 1e-6, s"rev shares: $got")
    assert(got(0)._7.contains(1.0) && got(1)._7.contains(2.0), s"got $got")
    // no zero-discount lines: every uplift null, levels all kept
    val noBase = Seq((0.05, 1.0, 10.0)).toDF("disc", "qty", "price")
    val nb = Retail.discountResponse(noBase, "disc", "qty", "price")
      .as[(Double, Long, Double, Double, Double, Double, Option[Double])]
      .collect().toSeq
    assert(nb.size == 1 && nb.head._7.isEmpty, s"got $nb")
  }

  test("interPurchaseProfile: hand gaps, same-day orders collapse, singleton null") {
    import org.apache.spark.sql.functions.col
    def d(s: String) = java.sql.Date.valueOf(s)
    val orders = Seq(
      (1L, d("2020-01-01")), (1L, d("2020-01-03")),
      (1L, d("2020-01-03")), // same-day duplicate: one shopping event
      (1L, d("2020-01-07")),
      (2L, d("2020-05-05"))).toDF("cust", "od")
    val got = Retail.interPurchaseProfile(orders, "cust", "od")
      .orderBy("cust")
      .as[(Long, Long, Option[Double], Option[Double])].collect().toSeq
    // gaps 2, 4: mean 3; var = (20 - 18)/1 = 2 -> cv = sqrt(2)/3
    val cv = BigDecimal(math.sqrt(2.0) / 3.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == ((1L, 3L, Some(3.0), Some(cv))), s"got ${got(0)}")
    assert(got(1) == ((2L, 1L, None, None)), s"got ${got(1)}")
  }

  test("rankStability: identical eras overlap fully, swapped tops overlap zero") {
    import org.apache.spark.sql.functions.col
    val same = Seq(("k1", 10.0, "a"), ("k2", 5.0, "a"), ("k3", 1.0, "a"),
      ("k1", 10.0, "b"), ("k2", 5.0, "b"), ("k3", 1.0, "b"))
      .toDF("key", "m", "era")
    val s = Retail.rankStability(same, "key", col("m"),
        col("era") === "a", col("era") === "b", depths = Seq(2))
      .as[(Long, Long, Double)].collect().toSeq
    assert(s == Seq((2L, 2L, 1.0)), s"got $s")
    // era a tops k1,k2; era b tops k3,k4 -> zero overlap at depth 2
    val swap = Seq(("k1", 10.0, "a"), ("k2", 9.0, "a"),
      ("k3", 1.0, "a"), ("k4", 1.0, "a"),
      ("k1", 1.0, "b"), ("k2", 1.0, "b"),
      ("k3", 10.0, "b"), ("k4", 9.0, "b")).toDF("key", "m", "era")
    val z = Retail.rankStability(swap, "key", col("m"),
        col("era") === "a", col("era") === "b", depths = Seq(2))
      .as[(Long, Long, Double)].collect().toSeq
    assert(z == Seq((2L, 0L, 0.0)), s"got $z")
  }

  test("priceIndexes: hand Laspeyres/Paasche/Fisher on matched items") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // X: p0=1 (10/10), p1=2 (30/15); Y: p0=4 (20/5), p1=3 (12/4)
    // L = (2*10+3*5)/(1*10+4*5) = 35/30; P = (2*15+3*4)/(1*15+4*4) = 42/31
    val df = Seq(
      ("X", 10.0, 10.0, true), ("X", 30.0, 15.0, false),
      ("Y", 20.0, 5.0, true), ("Y", 12.0, 4.0, false),
      ("Z", 7.0, 1.0, true)) // base-only: excluded by matched-model rule
      .toDF("i", "v", "q", "b")
    val r = Retail.priceIndexes(df, col("i"), col("v"), col("q"),
      col("b")).head()
    assert(r.getAs[Long]("items") === 2L)
    assert(r.getAs[Double]("laspeyres") === 1.166667)
    assert(r.getAs[Double]("paasche") === 1.354839)
    assert(r.getAs[Double]("fisher") === 1.257237)
  }
}
