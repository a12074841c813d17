package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Retail-analytics operators over the order/line-item model — the
  * OLAP layer a demand-forecasting engine (the reference's M5 domain)
  * sits next to in production: association rules over baskets and
  * RFM customer segmentation.
  */
object Retail {

  /** X86 — market-basket association rules: for every pair of items
    * co-occurring in an order, support `P(ab)`, confidence `P(b|a)`,
    * and lift `P(ab)/(P(a)·P(b))` — top-k pairs by co-occurrence.
    *
    * Shape: distinct (order, item) → self-join on the order key with
    * `itemA < itemB` (each unordered pair once) → one pair-count agg;
    * item marginals and the order total are separate small aggs
    * broadcast back in. The self-join output is Σ C(|basket|, 2) —
    * bounded by basket size, not catalog size; a pathological
    * mega-basket (a wholesale order with 10⁴ items) explodes
    * quadratically, so production callers should cap basket size
    * upstream (the standard FP-growth-style guard). The final top-k
    * is orderBy+limit → TakeOrderedAndProject, never a full sort.
    */
  def marketBasket(
      items: DataFrame,
      orderCol: String,
      itemCol: String,
      topK: Int,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
    : DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    // the distinct basket frame feeds the pair join, the item
    // marginals, AND the order total — persist it so they share one
    // distinct shuffle instead of re-running it three times
    val oi = scope.persist(
      items.select(col(orderCol).as("__o"), col(itemCol).as("__i"))
        .distinct())
    val pairs = oi.as("l").join(oi.as("r"), col("l.__o") === col("r.__o"))
      .filter(col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("item_a"), col("r.__i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    val itemCounts = oi.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val total = oi.agg(countDistinct(col("__o")).cast("double").as("__total"))
    pairs
      .orderBy(col("n_ab").desc, col("item_a"), col("item_b")).limit(topK)
      .join(broadcast(itemCounts.select(col("__i").as("item_a"),
        col("__n").as("__na"))), "item_a")
      .join(broadcast(itemCounts.select(col("__i").as("item_b"),
        col("__n").as("__nb"))), "item_b")
      .crossJoin(broadcast(total))
      .select(
        col("item_a"), col("item_b"), col("n_ab"),
        round(col("n_ab") / col("__total"), 6).as("support"),
        round(col("n_ab") / col("__na").cast("double"), 6).as("confidence"),
        round(col("n_ab") * col("__total") /
          (col("__na").cast("double") * col("__nb")), 6).as("lift"))
  }

  /** X87 — RFM segmentation: per customer, Recency (days since last
    * order, from the corpus max date), Frequency (order count),
    * Monetary (exact decimal total), each scored 1–5 against exact
    * global quintile cutoffs, plus the standard coarse segments.
    *
    * The cutoffs are ONE exact-percentile aggregate over the
    * per-customer frame, broadcast back as scalars — scoring is then
    * a pure map-side comparison (`1 + Σ v > q_i`), so ties land
    * identically on any engine. R scores INVERT (recent = 5). Exact
    * single-group percentile gathers the column into one buffer (the
    * t38 trade-off): fine at customer cardinality ≤ tens of millions;
    * at billions swap `percentile` for `approx_percentile` or the
    * equi-depth zipWithIndex path — the scoring stays unchanged.
    */
  def rfmSegments(
      orders: DataFrame,
      custCol: String,
      dateCol: String,
      amountCol: String): DataFrame = {
    val perCust = orders.groupBy(col(custCol)).agg(
      max(col(dateCol)).as("__last"),
      count(lit(1)).as("f"),
      sum(col(amountCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .as("__m"))
    val gmax = orders.agg(max(col(dateCol)).as("__gmax"))
    val rfm = perCust.crossJoin(broadcast(gmax))
      .select(col(custCol),
        datediff(col("__gmax"), col("__last")).cast("bigint").as("r"),
        col("f"),
        col("__m").cast("double").as("m"))
    val qs = rfm.agg(
      percentile(col("r"), F.array(Seq(0.2, 0.4, 0.6, 0.8).map(lit): _*))
        .as("__qr"),
      percentile(col("f"), F.array(Seq(0.2, 0.4, 0.6, 0.8).map(lit): _*))
        .as("__qf"),
      percentile(col("m"), F.array(Seq(0.2, 0.4, 0.6, 0.8).map(lit): _*))
        .as("__qm"))
    def score(v: org.apache.spark.sql.Column, q: String) =
      (1 to 4).map(i => (v > element_at(col(q), i)).cast("int"))
        .reduce(_ + _) + 1
    val scored = rfm.crossJoin(broadcast(qs))
      .select(col(custCol), col("r"), col("f"), col("m"),
        // recency inverts: the SMALLEST r (most recent) scores 5
        (lit(6) - score(col("r"), "__qr")).as("r_score"),
        score(col("f"), "__qf").as("f_score"),
        score(col("m"), "__qm").as("m_score"))
    scored.select(
      col(custCol), col("r"), col("f"),
      round(col("m"), 2).as("m"),
      col("r_score").cast("bigint").as("r_score"),
      col("f_score").cast("bigint").as("f_score"),
      col("m_score").cast("bigint").as("m_score"),
      when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4,
        "champion")
        .when(col("r_score") >= 3 && col("f_score") >= 3, "loyal")
        .when(col("r_score") >= 4, "recent")
        .when(col("f_score") >= 4, "frequent_lapsed")
        .when(col("r_score") <= 2 && col("f_score") <= 2, "at_risk")
        .otherwise("regular").as("segment"))
  }
}
