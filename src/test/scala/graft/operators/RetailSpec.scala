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
}
