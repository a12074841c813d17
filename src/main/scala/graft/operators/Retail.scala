package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
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
      amountCol: String,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
      : DataFrame = {
    // the ONE fact-table scan: per-customer aggregate to catalog
    // cardinality, persisted — everything downstream (global max date,
    // quantile pass, scoring) reads this cached frame, never orders
    // again (r13: the global max previously re-scanned orders whole)
    val perCust = scope.persist(orders.groupBy(col(custCol)).agg(
      max(col(dateCol)).as("__last"),
      count(lit(1)).as("f"),
      sum(col(amountCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .as("__m")))
    // max over per-customer last dates == max over orders
    val gmax = perCust.agg(max(col("__last")).as("__gmax"))
    val rfm = perCust.crossJoin(broadcast(gmax))
      .select(col(custCol),
        datediff(col("__gmax"), col("__last")).cast("bigint").as("r"),
        col("f"),
        col("__m").cast("double").as("m"))
    // quintile cutoffs via the exact rank-arithmetic decimal path —
    // cutoffs are compared (v > q_i) against data values, and a float
    // quantile ULP on one engine would flip a boundary score (the r12
    // migration; cutoffs were previously unrounded float percentiles).
    // The 12 cutoffs COLLECT to driver literals (bounded model state,
    // the psi/kmeans shape): many cut-column references through a
    // joined 1-row frame send Catalyst exponential, and literals make
    // the scoring pure codegen with no join at all. All THREE metric
    // columns share ONE ranked pass (multiExactQuantiles — the r12
    // x128 regression was three separate sort+zip+persist rounds for
    // 12 scalars), and the pass's working set unpersists as soon as
    // the cutoffs are collected. rfm itself stays unpersisted: it is a
    // pure projection over the cached perCust plus a tiny broadcast.
    val qScope = graft.util.CacheScope()
    val cutRows = Profiling.multiExactQuantiles(rfm, Seq(),
      Seq("r" -> col("r"), "f" -> col("f"), "m" -> col("m")),
      (1 to 4).map(i => s"q$i" -> i * 0.2), scope = qScope)
      .collect()
    qScope.unpersistAll()
    if (cutRows.isEmpty) {
      // empty input (or all-null r/f/m): no quantiles exist — return an
      // empty frame with the full output schema instead of throwing
      // from a collect()(0) (the old percentile crossJoin shape was
      // empty-safe; this keeps that contract)
      return rfm.filter(lit(false)).select(
        col(custCol), col("r"), col("f"), round(col("m"), 2).as("m"),
        lit(null).cast("bigint").as("r_score"),
        lit(null).cast("bigint").as("f_score"),
        lit(null).cast("bigint").as("m_score"),
        lit(null).cast("string").as("segment"))
    }
    val byMetric = cutRows.map(r => r.getString(0) ->
      (1 to 4).map(i => lit(r.getDecimal(i)))).toMap
    // one metric column entirely null (e.g. every amount null) drops
    // out of the shared quantile pass — fail with the cause, not an
    // unkeyed NoSuchElementException from byMetric("m") (r13 ADVICE)
    val absent = Seq("r", "f", "m").filterNot(byMetric.contains)
    require(absent.isEmpty,
      s"rfmSegments: metric(s) ${absent.mkString(", ")} have no non-null " +
        "values — quintile cutoffs are undefined for them")
    val (qr, qf, qm) = (byMetric("r"), byMetric("f"), byMetric("m"))
    def score(v: org.apache.spark.sql.Column,
        qs: IndexedSeq[org.apache.spark.sql.Column]) =
      qs.map(c => (v > c).cast("int")).reduce(_ + _) + 1
    val scored = rfm
      .select(col(custCol), col("r"), col("f"), col("m"),
        // recency inverts: the SMALLEST r (most recent) scores 5
        (lit(6) - score(col("r"), qr)).as("r_score"),
        score(col("f"), qf).as("f_score"),
        score(col("m"), qm).as("m_score"))
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

  /** X104 — ABC / Pareto classification: rank keys by exact decimal
    * revenue descending, compute each key's cumulative revenue share,
    * and label A (first `aCut` of revenue), B (to `bCut`), C (tail) —
    * the standard inventory-prioritization split ("20% of SKUs are 80%
    * of revenue").
    *
    * Shape (r13 verdict #2 — NO global cumulative window): one
    * map-side-combinable decimal aggregate collapses the input to
    * CATALOG cardinality; the cumulative revenue then rides
    * [[graft.operators.Relational.chunkedPrefixSum]] (range-sort +
    * zipWithIndex + chunk-summary prefix — every window partition
    * bounded by construction), so a 10^7+-item catalog never pins a
    * single task to the whole ranked frame; the grand total is one
    * scalar aggregate broadcast back (the O27 pattern).
    *
    * Portability: revenue sums and the running total are exact
    * decimal (addition-order-free, so the distributed two-level scan
    * is bit-identical to a single ranked pass); the share division
    * happens per row on exact operands and stabilizes through
    * DECIMAL(18,8) BEFORE the class thresholds compare, so a boundary
    * key lands in the same class on any engine. Ties order by key so
    * the running total is a total order.
    */
  def abcClassification(
      items: DataFrame,
      keyCol: String,
      amountCol: String,
      aCut: Double = 0.8,
      bCut: Double = 0.95): DataFrame = {
    require(aCut > 0 && aCut < bCut && bCut < 1,
      s"need 0 < aCut < bCut < 1, got $aCut, $bCut")
    val dec = org.apache.spark.sql.types.DecimalType(28, 2)
    // the pre-migration window sum widened DECIMAL(28,2) to (38,2);
    // running the scan at the same type keeps the cum values (and so
    // every downstream double cast) bit-identical
    val cumT = org.apache.spark.sql.types.DecimalType(38, 2)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val perKey = items.groupBy(col(keyCol).as("key"))
      .agg(sum(col(amountCol).cast(dec)).as("revenue"))
    val cum = Relational.chunkedPrefixSum(perKey, Nil,
      Seq(col("revenue").desc, col("key")), "revenue", "__cum", cumT)
    val total = perKey.agg(sum(col("revenue")).cast(cumT).as("__tot"))
    val share = round(
      (col("__cum").cast("double") / col("__tot").cast("double"))
        .cast(stable), 6)
    cum.crossJoin(broadcast(total)).select(
      col("key"),
      round(col("revenue").cast("double"), 2).as("revenue"),
      share.cast("double").as("cum_share"),
      when(share <= aCut, "A").when(share <= bCut, "B").otherwise("C")
        .as("abc_class"))
  }

  /** X105 — cohort lifetime-value curve: customers cohort by their
    * FIRST order month; for each (cohort, month offset) the curve
    * reports active customers, period revenue, and cumulative revenue
    * per cohort customer — the "how much is a January customer worth
    * by month 6" table that pricing/CAC decisions read.
    *
    * Shape: the first-order month is one per-customer aggregate
    * (map-side combinable); the (cohort, offset) rollup is another;
    * the cumulative window runs over the cohort×offset grid, whose
    * cardinality is months², not customers. Month arithmetic is exact
    * integers (`year·12 + month`), immune to the day-of-month pitfalls
    * of months_between. Revenue sums are exact DECIMAL(28,2); the one
    * division per grid row stabilizes through DECIMAL(18,8).
    */
  def cohortLtv(
      orders: DataFrame,
      custCol: String,
      dateCol: String,
      amountCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 2)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val monthIdx = year(col(dateCol)) * 12 + month(col(dateCol))
    val firstMonth = orders.groupBy(col(custCol).as("__c"))
      .agg(min(monthIdx).as("__m0"))
    val sized = firstMonth.groupBy(col("__m0"))
      .agg(countDistinct(col("__c")).as("__cohort_n"))
    val fact = orders
      .join(firstMonth, col(custCol) === col("__c"))
      .groupBy(col("__m0"), (monthIdx - col("__m0")).as("month_offset"))
      .agg(countDistinct(col(custCol)).as("active_customers"),
        sum(col(amountCol).cast(dec)).as("__rev"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__m0")).orderBy(col("month_offset"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    fact.join(broadcast(sized), "__m0")
      .select(
        // render the cohort as its calendar month for readability
        format_string("%04d-%02d",
          ((col("__m0") - 1) / 12).cast("int"),
          ((col("__m0") - 1) % 12 + 1).cast("int")).as("cohort_month"),
        col("month_offset").cast("bigint").as("month_offset"),
        col("__cohort_n").as("cohort_size"),
        col("active_customers"),
        round(col("__rev").cast("double"), 2).as("revenue"),
        round((sum(col("__rev")).over(wCum).cast("double")
            / col("__cohort_n").cast("double")).cast(stable), 4)
          .cast("double").as("cum_ltv"))
  }

  /** X137 — price elasticity per item: the OLS slope of `ln(quantity)`
    * on `ln(price)` across an item's selling days — the classic
    * log-log demand elasticity (slope −2 ⇒ a 1% price cut lifts
    * volume ~2%), the pricing knob a demand forecaster feeds.
    *
    * One daily (item, day) aggregate, then one moment aggregate per
    * item (the zipfFit shape): each ln term casts to DECIMAL(28,10)
    * and sums exactly; the closed-form slope assembles from the exact
    * sums and stabilizes through DECIMAL(18,8). Items with no price
    * variation across days are singular → null slope (`n_days` and
    * the zero-variance guard carry the why). Daily price quantizes to
    * cents through DECIMAL(28,6) (the x144 money contract) before the
    * log.
    */
  def priceElasticity(
      lineitem: DataFrame,
      itemCol: String,
      dateCol: String,
      priceCol: String,
      qtyCol: String,
      roundDigits: Int = 4): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 10)
    val money = org.apache.spark.sql.types.DecimalType(28, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val daily = lineitem
      .filter(col(priceCol).isNotNull && col(qtyCol).isNotNull)
      .groupBy(col(itemCol).as("__i"),
        to_date(col(dateCol)).as("__d"))
      .agg(
        sum(round(col(priceCol).cast(money), 2)).as("__p"),
        sum(col(qtyCol).cast(money)).as("__q"))
      .filter(col("__p") > 0 && col("__q") > 0)
    // x = ln(unit price) = ln(Σrevenue/Σqty) — elasticity regresses
    // volume on the PRICE PAID PER UNIT, not on revenue
    val x = log(col("__p").cast("double") / col("__q").cast("double"))
    val y = log(col("__q").cast("double"))
    val m = daily.groupBy(col("__i")).agg(
      count(lit(1)).as("__n"),
      sum(x.cast(dec)).as("__sx"),
      sum(y.cast(dec)).as("__sy"),
      sum((x * y).cast(dec)).as("__sxy"),
      sum((x * x).cast(dec)).as("__sxx"))
    val n = col("__n").cast("double")
    def d(c: String): org.apache.spark.sql.Column = col(c).cast("double")
    val varX = n * d("__sxx") - d("__sx") * d("__sx")
    val slope = (n * d("__sxy") - d("__sx") * d("__sy")) / varX
    m.select(col("__i").as(itemCol), col("__n").as("n_days"),
      round(when(col("__n") >= 3 && varX > 1e-9, slope).cast(stable),
        roundDigits).cast("double").as("elasticity"))
  }

  /** X106 — item-item cosine similarity (neighborhood collaborative
    * filtering): over binary basket membership,
    * `cos(i,j) = n_ij / sqrt(n_i · n_j)` — the classic item-based
    * recommender sketch (Sarwar et al., WWW'01), and the latent-free
    * complement of the ALS factorizer in [[graft.ml.Recommender]].
    *
    * Same candidate bound as [[marketBasket]]: the pair join is
    * per-order, so cost is Σ C(|basket|, 2) — basket-bounded, not
    * catalog-bounded (cap pathological baskets upstream). `minCount`
    * floors support so one-off co-occurrences don't rank. The cosine
    * is a single expression on exact integer counts (`sqrt` is IEEE
    * correctly-rounded, so both engines compute the identical double),
    * rounded before the top-k orders on it.
    */
  def itemCosine(
      items: DataFrame,
      orderCol: String,
      itemCol: String,
      topK: Int,
      minCount: Long = 2,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
    : DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val oi = scope.persist(
      items.select(col(orderCol).as("__o"), col(itemCol).as("__i"))
        .distinct())
    val pairs = oi.as("l").join(oi.as("r"), col("l.__o") === col("r.__o"))
      .filter(col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("item_a"), col("r.__i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val itemCounts = oi.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    pairs
      .join(broadcast(itemCounts.select(col("__i").as("item_a"),
        col("__n").as("__na"))), "item_a")
      .join(broadcast(itemCounts.select(col("__i").as("item_b"),
        col("__n").as("__nb"))), "item_b")
      .select(col("item_a"), col("item_b"), col("n_ab"),
        round(col("n_ab") / sqrt(col("__na").cast("double") * col("__nb")), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** X162 — repeat-purchase statistics: one row of customer-loyalty
    * health — customer count, repeat share (≥ 2 orders), mean orders
    * per customer, and the EXACT median inter-order gap in days (the
    * r12 rank-arithmetic quantile over per-customer consecutive-order
    * gaps) — the replenishment-cycle number reorder reminders and CLV
    * models are built on. Same-day repeat orders contribute zero-day
    * gaps identically under any tie order.
    */
  def repurchaseStats(df: DataFrame, custCol: String, dateCol: String,
      roundDigits: Int = 4): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(custCol)).orderBy(col(dateCol))
    val gaps = df
      .withColumn("__gap",
        F.datediff(col(dateCol), F.lag(col(dateCol), 1).over(w)))
      .filter(col("__gap").isNotNull)
    val med = graft.operators.Profiling.groupedExactQuantiles(gaps, Seq(),
      col("__gap"), Seq("__med" -> 0.5))
    val perCust = df.groupBy(col(custCol)).agg(F.count(F.lit(1)).as("__n"))
    perCust.agg(
        F.count(F.lit(1)).as("n_customers"),
        F.sum((col("__n") >= 2).cast("long")).as("n_repeat"),
        F.sum(col("__n")).as("__orders"))
      .crossJoin(med)
      .select(col("n_customers"), col("n_repeat"),
        F.round((col("n_repeat").cast("double") / col("n_customers"))
          .cast(stable), roundDigits).cast("double").as("repeat_rate"),
        F.round((col("__orders").cast("double") / col("n_customers"))
          .cast(stable), roundDigits).cast("double")
          .as("orders_per_customer"),
        col("__med").cast("double").as("median_gap_days"))
  }

  /** X153 — price-ending distribution: counts and shares of the CENTS
    * ending (0–99) of a money column, with the charm-pricing flag
    * (ending in 9) — the psychological-pricing / data-provenance
    * screen: organic retail prices pile on .99/.49, synthetic or
    * converted ones spread uniformly (the pricing cousin of
    * [[graft.operators.Profiling.benford]]).
    *
    * Exact integer cents via the x144 money contract (quantize through
    * DECIMAL(28,6) then ×100) — no float formatting anywhere; one
    * counting aggregate to ≤100 rows, shares over a whole-relation
    * window on that tiny table.
    */
  def priceEndings(df: DataFrame, priceCol: String,
      roundDigits: Int = 6): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val cents = (F.round(col(priceCol).cast(dec), 2) * 100).cast("bigint")
    val counted = df.filter(col(priceCol).isNotNull)
      .select(F.pmod(cents, F.lit(100L)).as("ending"))
      .groupBy(col("ending")).agg(F.count(F.lit(1)).as("n"))
    // bounded: runs over the ≤100-row cent-ending histogram, never data
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    counted.select(col("ending"), col("n"),
      F.round((col("n").cast("double") / F.sum(col("n")).over(tot))
        .cast(stable), roundDigits).cast("double").as("share"),
      (F.pmod(col("ending"), F.lit(10L)) === 9).cast("long")
        .as("is_charm"))
  }

  /** X176 — ABC–XYZ inventory matrix: [[abcClassification]]'s revenue
    * classes crossed with demand-VARIABILITY classes from the weekly
    * coefficient of variation (X: cv ≤ 0.5 steady, Y: ≤ 1.0 variable,
    * Z: erratic) — the 9-cell planning grid ("AX = automate, CZ =
    * make-to-order") that combines WHAT matters with HOW predictable
    * it is. Pairs with the Syntetos–Boylan quadrants (x116), which
    * classify INTERMITTENCE; XYZ classifies magnitude stability.
    *
    * Portability: weekly sums quantize to DECIMAL, moments accumulate
    * exactly (the x163 scale discipline), cv = sd/mean assembles as
    * one double chain and ROUNDs through DECIMAL(18,8) BEFORE the
    * class compare, so a boundary key lands identically on any
    * engine. Keys with < 2 observed weeks or zero mean get class Z
    * with null cv (no spread to measure = not steady).
    */
  def abcXyzMatrix(
      items: DataFrame,
      keyCol: String,
      dayCol: String,
      amountCol: String,
      qtyCol: String,
      roundDigits: Int = 4): DataFrame = {
    val t6 = org.apache.spark.sql.types.DecimalType(12, 6)
    val s6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val q12 = org.apache.spark.sql.types.DecimalType(24, 12)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val abc = abcClassification(items
        .select(col(keyCol), col(amountCol)), keyCol, amountCol)
      .select(col("key"), col("revenue"), col("abc_class"))
    val weekly = items
      .groupBy(col(keyCol).as("key"),
        date_trunc("week", col(dayCol)).as("__w"))
      .agg(sum(col(qtyCol).cast(t6)).cast(t6).as("__q"))
    val m = weekly.groupBy(col("key"))
      .agg(count(lit(1)).as("n_weeks"),
        sum(col("__q")).cast(s6).as("__s"),
        sum((col("__q") * col("__q")).cast(q12)).cast(q12).as("__qq"))
    val mean = col("__s").cast("double") / col("n_weeks")
    val variance = (col("__qq").cast("double")
      - col("__s").cast("double") * col("__s").cast("double")
        / col("n_weeks")) / (col("n_weeks") - 1)
    val cv = round((sqrt(variance) / mean).cast(stable), roundDigits)
    val withCv = m.select(col("key"), col("n_weeks"),
      when(col("n_weeks") >= 2 && col("__s") > 0, cv).as("__cv"))
    abc.join(withCv, "key")
      .select(col("key"), col("revenue"), col("abc_class"),
        col("n_weeks"), col("__cv").cast("double").as("cv"),
        when(col("__cv").isNull, "Z")
          .when(col("__cv") <= 0.5, "X")
          .when(col("__cv") <= 1.0, "Y")
          .otherwise("Z").as("xyz_class"))
      .withColumn("cell", concat(col("abc_class"), col("xyz_class")))
  }

  /** X178 — price-change profile per item: weekly average unit price
    * (exact-cents via one stabilized division), then the week-over-
    * week deltas — change count, largest absolute jump, mean absolute
    * change — the price-stability screen feeding [[priceElasticity]]
    * (an item whose price never moves has no elasticity to estimate)
    * and the promo-detection heuristic (a big down-jump followed by a
    * reversal is a promotion).
    *
    * Once the weekly price is a 2-dp DECIMAL, every delta, max, and
    * the mean's sum are EXACT decimal arithmetic — the only float ops
    * are the two stabilized divisions (weekly price, mean change).
    * Items need ≥ 2 observed weeks.
    */
  def priceChangeProfile(
      items: DataFrame,
      keyCol: String,
      dayCol: String,
      amountCol: String,
      qtyCol: String,
      roundDigits: Int = 4): DataFrame = {
    val dec28 = org.apache.spark.sql.types.DecimalType(28, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val weekly = items
      .filter(col(qtyCol).isNotNull && col(qtyCol) > 0 &&
        col(amountCol).isNotNull)
      .groupBy(col(keyCol).as("key"),
        date_trunc("week", col(dayCol)).as("__w"))
      .agg(sum(col(amountCol).cast(dec28)).as("__a"),
        sum(col(qtyCol).cast(dec28)).as("__q"))
      .select(col("key"), col("__w"),
        // exact-cents weekly unit price: one stabilized division
        round((col("__a").cast("double") / col("__q").cast("double"))
          .cast(stable), 2).as("__p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("__w"))
    val withDelta = weekly
      .withColumn("__d", col("__p") - lag(col("__p"), 1).over(w))
    withDelta.groupBy(col("key"))
      .agg(count(lit(1)).as("n_weeks"),
        sum((col("__d").isNotNull && col("__d") =!= 0).cast("long"))
          .as("n_changes"),
        max(abs(col("__d"))).as("__maxj"),
        sum(abs(col("__d"))).as("__sumj"),
        count(col("__d")).as("__nd"))
      .filter(col("n_weeks") >= 2)
      .select(col("key"), col("n_weeks"), col("n_changes"),
        col("__maxj").cast("double").as("max_abs_jump"),
        round((col("__sumj").cast("double") / col("__nd"))
          .cast(stable), roundDigits).cast("double")
          .as("mean_abs_change"))
  }

  /** X168 — basket-size profile: the distribution of lines per order
    * (how many distinct items a basket carries), with each size's
    * order count and share — the first diagnostic of basket depth and
    * the sanity gate before any association-rule mining (x127's
    * per-order self-join cost is Σ basket²; THIS table is that budget).
    * One count aggregate to order cardinality, one count aggregate to
    * ≤ max-basket rows, shares over a whole-relation window on that
    * tiny table.
    */
  def basketSizeProfile(df: DataFrame, orderCol: String,
      roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val perOrder = df.groupBy(col(orderCol))
      .agg(F.count(F.lit(1)).as("__lines"))
    val counted = perOrder.groupBy(col("__lines").as("n_lines"))
      .agg(F.count(F.lit(1)).as("n_orders"))
    // bounded: runs over the lines-per-order histogram (max basket
    // size rows), never the order stream
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    counted.select(col("n_lines"), col("n_orders"),
      F.round((col("n_orders").cast("double")
        / F.sum(col("n_orders")).over(tot)).cast(stable), roundDigits)
        .cast("double").as("share"))
  }

  /** X191 — discount-depth response curve: per exact discount level,
    * line volume, quantity and revenue shares, average line quantity,
    * and the quantity UPLIFT vs the zero-discount baseline — the "do
    * deeper discounts actually move more units" readout behind promo
    * planning (the descriptive complement of x177's fitted
    * elasticity: this shows the response curve itself, band by band).
    *
    * Discounts quantize to exact DECIMAL(4,2) levels (never float
    * group keys); quantity/revenue sums are exact decimals; the
    * shares and uplift divide once each through DECIMAL(18,8). The
    * zero-discount baseline average rides a 1-row broadcast (O27);
    * no baseline rows → null uplift. One map-side-combinable agg to
    * the ≤101-level frame.
    */
  /** X194 — Herfindahl–Hirschman concentration index per group: with
    * each entity's share of the group total, `HHI = Σ share²` — the
    * antitrust-standard "is this market/supply base concentrated"
    * number (1/k = k equal players, 1 = monopoly); next to x136's
    * Gini it answers concentration at ENTITY grain (who dominates)
    * rather than distribution shape. In a curation pipeline the same
    * statistic audits source dominance inside a training mix.
    *
    * Two map-side-combinable decimal aggregates (entity sums, group
    * totals); each entity's share² term rounds to DECIMAL(18,8)
    * BEFORE the exact per-group sum (round-then-add — entity
    * iteration order must not leak), top share is a max over the
    * same exact shares. Zero/negative-total groups emit null HHI.
    */
  def hhiConcentration(
      df: DataFrame,
      groupCols: Seq[String], entityCol: String, valueCol: String,
      roundDigits: Int = 6): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 2)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val gs = groupCols.map(col)
    val perEnt = df.filter(col(valueCol).isNotNull)
      .groupBy(gs :+ col(entityCol).as("__e"): _*)
      .agg(F.sum(col(valueCol).cast(dec)).as("__v"))
    val tots = perEnt.groupBy(gs: _*)
      .agg(F.sum(col("__v")).as("__tot"), F.count(F.lit(1)).as("__ne"))
    val renamed = groupCols.foldLeft(tots)((d, c) =>
      d.withColumnRenamed(c, s"__t_$c"))
    val joinCond = (groupCols.map(c => col(c) <=> col(s"__t_$c"))
      :+ F.lit(true)).reduce(_ && _)
    val share = col("__v").cast("double") / col("__tot").cast("double")
    perEnt.join(renamed, joinCond)
      .groupBy(gs: _*)
      .agg(
        F.first(col("__ne")).as("n_entities"),
        F.round(F.first(col("__tot")).cast("double"), 2).as("total"),
        F.round(F.max(F.when(col("__tot") > 0, share)).cast(stable),
          roundDigits).cast("double").as("top_share"),
        F.round(F.sum(F.round(F.when(col("__tot") > 0, share * share)
          .cast(stable), 8)).cast(stable), roundDigits)
          .cast("double").as("hhi"))
  }

  def discountResponse(
      lineitems: DataFrame,
      discountCol: String, qtyCol: String, priceCol: String,
      roundDigits: Int = 6): DataFrame = {
    val d42 = org.apache.spark.sql.types.DecimalType(4, 2)
    val dec = org.apache.spark.sql.types.DecimalType(28, 2)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val rows = lineitems
      .filter(col(discountCol).isNotNull && col(qtyCol).isNotNull)
      .select(col(discountCol).cast(d42).as("discount"),
        col(qtyCol).cast(dec).as("__q"),
        (col(priceCol) * (F.lit(1.0d) - col(discountCol))).cast(dec)
          .as("__rev"))
    val byLevel = rows.groupBy(col("discount"))
      .agg(F.count(F.lit(1)).as("n_lines"),
        F.sum(col("__q")).as("__qty"),
        F.sum(col("__rev")).as("__r"))
    val tot = rows.agg(F.sum(col("__q")).as("__tq"),
      F.sum(col("__rev")).as("__tr"))
    val avgQty = F.round((col("__qty").cast("double") / col("n_lines"))
      .cast(stable), 6).cast("double")
    val base = byLevel.filter(col("discount") === F.lit(0).cast(d42))
      .select(avgQty.as("__base"))
    byLevel.crossJoin(F.broadcast(tot))
      // LEFT join on true: an input with no zero-discount lines keeps
      // every level with a null uplift instead of vanishing entirely
      .join(F.broadcast(base), F.lit(true), "left")
      .select(col("discount").cast("double").as("discount"),
        col("n_lines"),
        F.round(col("__qty").cast("double"), 2).as("total_qty"),
        avgQty.as("avg_qty"),
        F.round((col("__qty").cast("double") / col("__tq").cast("double"))
          .cast(stable), roundDigits).cast("double").as("qty_share"),
        F.round((col("__r").cast("double") / col("__tr").cast("double"))
          .cast(stable), roundDigits).cast("double").as("rev_share"),
        F.round(F.when(col("__base") > 0, avgQty / col("__base"))
          .cast(stable), roundDigits).cast("double").as("qty_uplift"))
  }

  /** X206 — inter-purchase cadence per customer: gaps between
    * DISTINCT purchase days (same-day orders are one shopping event —
    * a 0-day "gap" would poison the regularity read), their mean, and
    * the coefficient of variation — the replenishment-cycle profile
    * behind every "is this customer due?" trigger and the
    * per-customer prior a demand forecaster (the reference's M5
    * domain) conditions on. CV reads: ≪1 clockwork replenishment,
    * ≈1 Poisson-random, ≫1 bursty.
    *
    * One distinct + one key-partitioned lag window + one aggregate.
    * Gap sums/squares are exact integers; mean and CV are single
    * float chains over exact operands stabilized through
    * DECIMAL(18,8). Customers with < 2 distinct days emit no gaps
    * (null mean); CV needs ≥ 3 days and a positive mean.
    */
  def interPurchaseProfile(
      df: DataFrame, keyCol: String, dateCol: String,
      roundDigits: Int = 4): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val days = df.filter(col(dateCol).isNotNull)
      .select(col(keyCol).as("__k"), F.to_date(col(dateCol)).as("__d"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__d"))
    val gaps = days
      .withColumn("__g",
        F.datediff(col("__d"), F.lag(col("__d"), 1).over(w)).cast("long"))
    val n = col("__ng").cast("double")
    val mean = col("__sg").cast("double") / n
    // sample variance from exact integer moments, one IEEE chain
    val variance = ((col("__sgg").cast("double")
      - col("__sg").cast("double") * col("__sg").cast("double") / n)
      / (n - 1))
    gaps.groupBy(col("__k"))
      .agg(F.count(F.lit(1)).as("n_purchase_days"),
        F.count(col("__g")).as("__ng"),
        F.sum(col("__g")).as("__sg"),
        F.sum(col("__g") * col("__g")).as("__sgg"))
      .select(col("__k").as(keyCol), col("n_purchase_days"),
        F.round(F.when(col("__ng") >= 1, mean).cast(stable), roundDigits)
          .cast("double").as("mean_gap_days"),
        F.round(F.when(col("__ng") >= 2 && mean > 0 && variance >= 0,
          F.sqrt(variance) / mean).cast(stable), roundDigits)
          .cast("double").as("cv_gap"))
  }

  /** X207 — top-k rank stability between two eras: the share of era
    * A's top-d keys (by a summed metric) still in era B's top-d, at
    * each requested depth — the ranking-drift monitor for "did the
    * bestseller list churn overnight" that distribution drift
    * ([[graft.operators.Evaluation.psi]]) can't see (a reshuffle
    * inside the same distribution is invisible to any histogram).
    *
    * Shape: one grouped aggregate per era off a single input scan
    * (conditional sums), two TakeOrdered top-maxDepth projections
    * (never a full sort), ranks via a window over the ≤ maxDepth-row
    * frame (bounded by construction), one join of two k-row frames,
    * and a depths×k cross of driver literals. Ties break by key —
    * deterministic end-to-end. Shares stabilize through
    * DECIMAL(18,8).
    */
  def rankStability(
      df: DataFrame, keyCol: String, metric: org.apache.spark.sql.Column,
      eraA: org.apache.spark.sql.Column, eraB: org.apache.spark.sql.Column,
      depths: Seq[Int] = Seq(5, 10, 20),
      roundDigits: Int = 6,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
      : DataFrame = {
    require(depths.nonEmpty && depths.forall(_ >= 1),
      s"depths must be positive: $depths")
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val maxD = depths.max
    val spark = df.sparkSession
    import spark.implicits._
    // ONE scan: per-era conditional sums in the same aggregate,
    // persisted — both top-k projections read it
    val byKey = scope.persist(df.filter((eraA || eraB) && metric.isNotNull)
      .groupBy(col(keyCol).as("__key"))
      .agg(
        F.sum(F.when(eraA, metric.cast(dec)).otherwise(F.lit(0).cast(dec)))
          .as("__ma"),
        F.sum(F.when(eraB, metric.cast(dec)).otherwise(F.lit(0).cast(dec)))
          .as("__mb")))
    def topRanks(m: String, out: String): DataFrame = {
      val top = byKey.select(col("__key"), col(m))
        .orderBy(col(m).desc, col("__key")).limit(maxD)
      // bounded: the rank window runs over <= maxDepth rows
      top.withColumn(out, F.row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col(m).desc, col("__key"))))
        .select(col("__key"), col(out))
    }
    val joined = topRanks("__ma", "__ra")
      .join(topRanks("__mb", "__rb"), Seq("__key"), "full_outer")
    val depthsDf = depths.map(_.toLong).toDF("depth")
    F.broadcast(depthsDf).crossJoin(joined)
      .groupBy(col("depth"))
      .agg(F.sum((col("__ra") <= col("depth") &&
        col("__rb") <= col("depth")).cast("long")).as("overlap"))
      .select(col("depth"), F.coalesce(col("overlap"), F.lit(0L))
          .as("overlap"),
        F.round((F.coalesce(col("overlap"), F.lit(0L)).cast("double")
          / col("depth")).cast(stable), roundDigits)
          .cast("double").as("overlap_share"))
  }

  /** Classic bilateral price indexes between two periods (ILO CPI
    * manual ch. 15): Laspeyres (base-period quantity weights),
    * Paasche (current-period weights), and Fisher (their geometric
    * mean — the "ideal" index satisfying the reversal tests). Items
    * must trade in BOTH periods (the matched-model rule); unit price
    * per item-period is total value / total quantity.
    *
    * Shape: ONE aggregate to (item, period) cells; the four
    * value-sums run over the matched-item cell table, so the heavy
    * scan never repeats. Per-item terms round 8dp before the exact
    * decimal sum (the house cross-engine-sum discipline).
    */
  def priceIndexes(df: DataFrame, item: Column, price: Column,
      qty: Column, inBase: Column, roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val cells = df.filter(item.isNotNull && price.isNotNull
        && qty.isNotNull && inBase.isNotNull)
      .select(item.cast("string").as("__i"),
        inBase.cast("boolean").as("__b"),
        price.cast("double").as("__v"), qty.cast("double").as("__q"))
      .groupBy(col("__i"), col("__b"))
      .agg(F.sum(col("__v")).as("__val"), F.sum(col("__q")).as("__qty"))
      .filter(col("__qty") > 0)
    val base = cells.filter(col("__b"))
      .select(col("__i"), (col("__val") / col("__qty")).as("__p0"),
        col("__qty").as("__q0"))
    val cur = cells.filter(!col("__b"))
      .select(col("__i"), (col("__val") / col("__qty")).as("__p1"),
        col("__qty").as("__q1"))
    val m = base.join(cur, Seq("__i"))
    val terms = m.agg(F.count(F.lit(1)).as("items"),
      F.sum(F.round((col("__p1") * col("__q0")).cast(stable), 8))
        .as("__l1"),
      F.sum(F.round((col("__p0") * col("__q0")).cast(stable), 8))
        .as("__l0"),
      F.sum(F.round((col("__p1") * col("__q1")).cast(stable), 8))
        .as("__p1s"),
      F.sum(F.round((col("__p0") * col("__q1")).cast(stable), 8))
        .as("__p0s"))
    val lasp = col("__l1").cast("double") / col("__l0").cast("double")
    val paas = col("__p1s").cast("double") / col("__p0s").cast("double")
    terms.filter(col("items") > 0 && col("__l0") > 0 && col("__p0s") > 0)
      .select(col("items"),
        F.round(lasp.cast(stable), roundDigits).cast("double")
          .as("laspeyres"),
        F.round(paas.cast(stable), roundDigits).cast("double")
          .as("paasche"),
        F.round(F.sqrt(lasp * paas).cast(stable), roundDigits)
          .cast("double").as("fisher"))
  }
}
