package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / time-series operators (SURVEY.md §2.3) with pandas-parity
  * semantics. All of these are single-shuffle: one exchange on the
  * partition key, then per-partition sorted evaluation. At 100 TB, the
  * key design point is that ALL lags/leads/rollings for one key reuse
  * one Window spec — Catalyst collapses them into a single Window
  * physical operator (one sort, one pass).
  */
object TimeSeries {

  /** O28 — grouped lag: per-key shift(+k) for each k in `lags`.
    * Ref: pipeline.py:102-110.
    */
  def groupedLag(
      df: DataFrame,
      partitionBy: Seq[Column],
      orderBy: Seq[Column],
      target: String,
      lags: Seq[Int],
      prefix: String = "lag"): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    lags.foldLeft(df) { (acc, k) =>
      acc.withColumn(s"${prefix}_${target}_$k", lag(col(target), k).over(w))
    }
  }

  /** O29 — grouped lead: per-key shift(-k).
    * Ref: pipeline.py:172-176.
    */
  def groupedLead(
      df: DataFrame,
      partitionBy: Seq[Column],
      orderBy: Seq[Column],
      target: String,
      leads: Seq[Int],
      prefix: String = "lead"): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    leads.foldLeft(df) { (acc, k) =>
      acc.withColumn(s"${prefix}_${target}_$k", lead(col(target), k).over(w))
    }
  }

  /** O30 — grouped trailing rolling mean with pandas `min_periods=window`
    * semantics: mean of rows [t-w, t-1], null unless ALL w rows exist.
    * A bare `avg(...)` over the frame would emit partial-window means at
    * the head of every group — the count guard is what makes it
    * pandas-faithful. Ref: pipeline.py:114-124.
    */
  def rollingMeanMinPeriods(
      df: DataFrame,
      partitionBy: Seq[Column],
      orderBy: Seq[Column],
      target: String,
      windows: Seq[Int],
      prefix: String = "rmean"): DataFrame =
    windows.foldLeft(df) { (acc, w) =>
      val fr = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
        .rowsBetween(-w, -1)
      acc.withColumn(s"${prefix}_${target}_$w",
        when(count(col(target)).over(fr) === w, avg(col(target)).over(fr)))
    }

  /** As-of join: for each left row, attach the MOST RECENT right-side
    * values with `right.tsCol <= left.tsCol` per key, optionally within
    * `tolerance` (same units as the ts columns' ordering — days for
    * dates, whatever `datediff`-able type is used).
    *
    * Composition, not a custom operator (SURVEY §4.3 preference (a)):
    * tag both sides, union them, and per key carry the last non-null
    * right value forward over a (ts, side) ordering — right rows sort
    * BEFORE left rows at equal ts, so an exact-ts match is taken. One
    * shuffle + one sort; the naive alternative (range join) explodes
    * to |left|×|right-per-key| intermediates. Right side must be
    * unique per (key, ts) for deterministic results.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      toleranceDays: Option[Int] = None): DataFrame = {
    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts")) ++
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
      .withColumn("__side", lit(0))
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // Carry ONE struct (ts + all values) with a single last(ignoreNulls):
    // the timestamp the tolerance predicate checks and every value column
    // always come from the SAME right row. Carrying columns independently
    // would pair the newest __rts with an older row's value whenever the
    // newest right row holds a NULL in that value column.
    val rStruct = struct(
      col("__ts").as("__rts") +: valueCols.map(c => col(s"__r_$c").as(c)): _*)
    val carried = unioned.withColumn("__r",
      last(when(col("__side") === 0, rStruct), ignoreNulls = true).over(w))
    val withinTol = toleranceDays match {
      case Some(tol) => datediff(col("__ts"), col("__r").getField("__rts")) <= tol
      case None => lit(true)
    }
    val out = valueCols.foldLeft(carried.filter(col("__side") === 1)) { (df, c) =>
      df.withColumn(c, when(col("__r").isNotNull && withinTol, col("__r").getField(c)))
    }
    out.select(left.columns.map(col) ++ valueCols.map(col): _*)
  }

  /** O31/O32 — calendar feature extraction, pandas conventions:
    * quarter, ISO week, day-of-month, weekday (Mon=0 — Spark `weekday`,
    * NOT `dayofweek` which is Sun=1), weekend flag (Sat/Sun).
    * Ref: utils.py:10-24.
    */
  /** Event-sequence funnel: for each user, the earliest completion of
    * `steps` in order, each step within `maxGapSeconds` of the previous
    * one (the product-analytics "signup → view → purchase" conversion
    * query). Returns one row per user who reached step 1, with
    * `step_i` = epoch seconds of the earliest qualifying event (null
    * once the chain breaks) and `completed` = how many steps the chain
    * reached. "Earliest qualifying" is greedy per step — min ts of
    * step 1, then min ts of step 2 after it, and so on.
    *
    * Scale shape: one filtered agg per step over the (user)-keyed
    * events — k−1 join+agg rounds of per-user cardinality, never an
    * event×event self-join; the event rows a step joins are filtered to
    * that step's type first, so each round moves only that type's
    * slice. Timestamps compare as full-precision epoch DOUBLES (both
    * engines derive the identical IEEE value from the microsecond
    * timestamp, so the comparison is portable bit-for-bit). */
  def sequenceFunnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], maxGapSeconds: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps, got $steps")
    require(maxGapSeconds > 0, "maxGapSeconds must be positive")
    val et = col(tsCol).cast("double")
    val first = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(et).as("step_1"))
    val chained = steps.tail.zipWithIndex.foldLeft(first) {
      case (acc, (st, i)) =>
        val prev = s"step_${i + 1}"; val cur = s"step_${i + 2}"
        val nxt = df.filter(col(typeCol) === st)
          .select(col(userCol), et.as("__t"))
        val carried = acc.columns.map(col)
        acc.join(nxt, Seq(userCol), "left")
          .groupBy(carried: _*)
          .agg(min(when(col("__t") > col(prev) &&
              col("__t") <= col(prev) + maxGapSeconds, col("__t")))
            .as(cur))
    }
    val stepCols = steps.indices.map(i => col(s"step_${i + 1}"))
    val completed = stepCols.map(c =>
      when(c.isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    // a null step nulls every later step by construction (the chain
    // condition references the previous step), so the count is the
    // chain length
    chained.select(
      col(userCol) +:
        steps.indices.map(i =>
          col(s"step_${i + 1}").cast("bigint").as(s"step_${i + 1}")) :+
        completed.as("completed"): _*)
  }

  /** Gap-based sessionization: a session ends when the next event of
    * the same user arrives more than `gapSeconds` later — the batch
    * complement of the streaming session window (t48), and the step
    * web/product analytics runs before any funnel or attribution.
    * Per-user session sequence numbers come from one sorted window
    * pass (running sum of session-start flags); the per-session
    * rollup is one map-side-combinable aggregate. Both passes shuffle
    * once on the user key and scale with per-user event counts, never
    * user×user. Timestamps compare in exact epoch MICROS (integer
    * arithmetic — no float time math), and the output renders them the
    * same way for the cross-engine hash.
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val us = unix_micros(col(tsCol))
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val run = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = df
      .withColumn("__gap", us - lag(us, 1).over(w))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") > gapSeconds * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(run))
    flagged.groupBy(col(userCol), col("session_seq"))
      .agg(
        min(us).as("start_us"),
        max(us).as("end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: for every (from, to) adjacent pair, the count and the
    * row-normalized transition probability `P(to | from)` — the
    * behavioral fingerprint behind next-event prediction, anomaly
    * scoring (improbable paths), and funnel design. One sorted window
    * pass per user builds the adjacency (shuffle on the user key,
    * never event×event); the count aggregate collapses to
    * type²-cardinality rows, so the row-normalizing window is tiny by
    * construction. `prob` is rational (n/total) and stabilizes through
    * DECIMAL(18,8) before rounding (the changepointScan boundary
    * contract). */
  def markovTransitions(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, roundDigits: Int = 6): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy(col("from_type"))
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    pairs.select(col("from_type"), col("to_type"), col("n"),
      round((col("n").cast("double") / sum(col("n")).over(tot))
        .cast(stable), roundDigits).cast("double").as("prob"))
  }

  /** Weekly retention cohorts: users grouped by the week of their FIRST
    * event; for each (cohort week, weeks since) cell, how many of that
    * cohort's users were active — the standard retention triangle. Both
    * week truncations are Monday-based, so the offset is an exact
    * multiple of 7 days. One per-user min agg, a join back, and one
    * (cohort, offset) count-distinct agg. */
  def retentionCohorts(df: DataFrame, userCol: String, tsCol: String)
    : DataFrame = {
    val firsts = df.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("__cohort"))
    df.select(col(userCol), date_trunc("week", col(tsCol)).as("__week"))
      .join(firsts, Seq(userCol))
      .groupBy(col("__cohort"), col("__week"))
      .agg(countDistinct(col(userCol)).as("n_users"))
      .select(col("__cohort").cast("date").as("cohort_week"),
        (datediff(col("__week"), col("__cohort")) / 7).cast("bigint")
          .as("week_offset"),
        col("n_users"))
  }

  /** X81 — rolling z-score anomaly flag: per key, each value scored
    * against the mean/stddev of the `w` STRICTLY PRECEDING rows
    * (frame [-w, -1] — the current value never contaminates its own
    * baseline), with pandas-style min_periods=w (null score until a
    * full window exists) and a zero-variance guard. The streaming-
    * friendly outlier detector: one shuffle on the key, one sorted
    * window pass, no self-join.
    */
  def rollingZscore(
      df: DataFrame,
      keyCol: String,
      orderBy: Seq[Column],
      valueCol: String,
      w: Int,
      threshold: Double = 2.0): DataFrame = {
    require(w >= 2, s"window must be >= 2 for a sample stddev, got $w")
    val fr = Window.partitionBy(col(keyCol)).orderBy(orderBy: _*)
      .rowsBetween(-w, -1)
    val v = col(valueCol).cast("double")
    val z = when(count(v).over(fr) === w && stddev_samp(v).over(fr) > 0,
      (v - avg(v).over(fr)) / stddev_samp(v).over(fr))
    df.withColumn("__z", round(z, 4))
      .withColumn("is_anomaly",
        when(col("__z").isNotNull, (abs(col("__z")) > threshold).cast("int")))
      .withColumnRenamed("__z", "zscore")
  }

  /** X89 — Hampel filter: robust rolling outlier detection. Each value
    * is scored against the MEDIAN of its key's `w` strictly-preceding
    * values, scaled by the MAD (median absolute deviation) —
    * `flag = |x − med| > k · 1.4826 · MAD` — the standard robust
    * alternative to [[rollingZscore]]: a genuine spike in the BASELINE
    * window inflates a mean/stddev baseline and masks the next
    * anomaly, while the median/MAD baseline shrugs it off (the spec
    * pins exactly that case).
    *
    * Shape: the frame's values ride ONE `collect_list` window (w
    * elements per row — bounded, engine-portable), and both nested
    * medians are pure array expressions (`sort_array` + middle
    * element; even windows average the two middles): no second window
    * pass, no UDF, exact arithmetic — the only float ops are the
    * final scale multiply and the (exact) median averaging, so
    * results hash bit-for-bit. min_periods semantics: null until the
    * window is full; MAD = 0 (constant window) flags any deviation.
    */
  def hampelFilter(
      df: DataFrame,
      keyCol: String,
      orderBy: Seq[Column],
      valueCol: String,
      w: Int,
      k: Double = 3.0): DataFrame = {
    require(w >= 2, s"window must be >= 2, got $w")
    val fr = Window.partitionBy(col(keyCol)).orderBy(orderBy: _*)
      .rowsBetween(-w, -1)
    val v = col(valueCol).cast("double")
    def medianOf(arr: Column): Column = {
      val sorted = sort_array(arr)
      val n = size(sorted)
      // exact middle for odd n; mean of the two middles for even
      // (the divisions are exact .0 doubles, so the int casts are safe)
      when(n % 2 === 1, element_at(sorted, ((n + 1) / 2).cast("int")))
        .otherwise((element_at(sorted, (n / 2).cast("int")) +
          element_at(sorted, (n / 2 + 1).cast("int"))) / 2.0)
    }
    val win = collect_list(v).over(fr)
    val scored = df
      .withColumn("__win", win)
      .withColumn("__med",
        when(size(col("__win")) === w, medianOf(col("__win"))))
      .withColumn("__mad",
        when(col("__med").isNotNull,
          medianOf(transform(col("__win"), x => abs(x - col("__med"))))))
    scored
      .withColumn("deviation",
        when(col("__med").isNotNull, round(abs(v - col("__med")), 4)))
      .withColumn("is_outlier",
        when(col("__med").isNotNull,
          (abs(v - col("__med")) > lit(k * 1.4826) * col("__mad"))
            .cast("int")))
      .drop("__win", "__med", "__mad")
  }

  /** X82 — last-touch attribution: for each conversion event, the
    * channel (event type) of the key's most recent PRECEDING event in
    * `channelTypes`, provided it happened within `maxGapSeconds`;
    * conversions with no qualifying touch attribute to null (direct).
    * The product-analytics complement of [[sequenceFunnel]] — per
    * conversion instead of per user.
    *
    * One window pass over (key, ts, id) order with frame [-∞, -1]:
    * `last(when(channel), ignoreNulls)` carries the latest touch's ts
    * and type. The two carried columns null out on the SAME rows (one
    * shared predicate), so independent last() calls stay consistent —
    * no struct carry needed (contrast [[asofJoin]], where right-side
    * values can be null independently). No event×event self-join at
    * any scale; ordering ties break on the id column.
    */
  def lastTouchAttribution(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      conversionType: String,
      channelTypes: Seq[String],
      maxGapSeconds: Long): DataFrame = {
    require(channelTypes.nonEmpty, "channelTypes must be non-empty")
    require(!channelTypes.contains(conversionType),
      "a conversion cannot be its own touch channel")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col(typeCol).isin(channelTypes: _*)
    val touchTs = last(when(isTouch, unix_micros(col(tsCol))),
      ignoreNulls = true).over(w)
    val touchType = last(when(isTouch, col(typeCol)),
      ignoreNulls = true).over(w)
    // the carried columns MUST be materialized before the conversion
    // filter: referencing the window expression after it would
    // re-evaluate the window over the filtered (conversions-only)
    // frame, where no touch rows exist
    val gapUs = unix_micros(col(tsCol)) - col("__tts")
    df.withColumn("__tts", touchTs)
      .withColumn("__ttype", touchType)
      .filter(col(typeCol) === conversionType)
      .select(
        col(idCol),
        col(keyCol),
        when(gapUs <= maxGapSeconds * 1000000L, col("__ttype"))
          .as("channel"),
        when(gapUs <= maxGapSeconds * 1000000L, gapUs).as("gap_us"))
  }

  /** X92 — Kaplan–Meier survival estimation over user lifetimes: the
    * churn-analytics standard for "how long do users stay active",
    * correct under RIGHT-CENSORING — users still active at the end of
    * the observation window contribute their lifetime-so-far to the
    * at-risk counts without being counted as churned (a naive
    * average-lifetime over a finite window is biased low for exactly
    * this reason). Lifetime = last−first event day; a user whose last
    * event falls STRICTLY within `censorLastDays` of the corpus max
    * (gap < censorLastDays) is censored — a user exactly
    * `censorLastDays` old counts as a churn event (the `>=` compare is
    * inclusive on the churn side; [[nelsonAalen]] shares the same
    * boundary). Output: one row per distinct duration with the at-risk
    * count, churn events, and the product-limit survival
    * `S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ)` (computed as exp of a running
    * ln-sum — the portable cumulative product).
    *
    * Scale shape: one agg per user (user cardinality), one agg per
    * distinct duration, then windows over the DURATION table — whose
    * row count is bounded by the observation window in DAYS, not by
    * users, so the unpartitioned running windows are safe by
    * construction. The user total rides a 1-row broadcast.
    */
  def kaplanMeier(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      censorLastDays: Int = 3): DataFrame = {
    require(censorLastDays >= 0, "censorLastDays must be >= 0")
    val perUser = df.groupBy(col(keyCol)).agg(
      to_date(min(col(tsCol))).as("__first"),
      to_date(max(col(tsCol))).as("__last"))
    val gmax = df.agg(to_date(max(col(tsCol))).as("__gmax"))
    val lifetimes = perUser.crossJoin(broadcast(gmax))
      .select(
        datediff(col("__last"), col("__first")).cast("long").as("__dur"),
        (datediff(col("__gmax"), col("__last")) >= censorLastDays)
          .cast("long").as("__event"))
    val byDur = lifetimes.groupBy(col("__dur")).agg(
      count(lit(1)).as("__n"), sum(col("__event")).as("__d"))
    val total = lifetimes.agg(count(lit(1)).as("__total"))
    val wPrev = Window.orderBy(col("__dur"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy(col("__dur"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val factor = lit(1.0) - col("__d").cast("double") / col("__risk")
    // a duration where EVERY remaining at-risk user churns has factor
    // 0: survival is exactly 0 from there on. Spark's log(0) is null
    // (silently skipped by sum) and other engines give -inf or error,
    // so the zero case is handled structurally: non-positive factors
    // never enter the ln-sum, and the running-min guard zeroes every
    // row at or after one
    byDur.crossJoin(broadcast(total))
      .withColumn("__risk",
        col("__total") - coalesce(sum(col("__n")).over(wPrev), lit(0L)))
      .withColumn("survival",
        round(when(min(factor).over(wRun) <= 0, lit(0.0))
          .otherwise(exp(sum(when(factor > 0, log(factor))).over(wRun))), 6))
      .select(col("__dur").as("duration_days"),
        col("__risk").as("n_risk"),
        col("__d").as("n_events"),
        col("survival"))
  }

  /** X146 — stickiness: per week, average daily actives over the
    * week's 7 calendar days (inactive days count as zero) divided by
    * weekly actives — the DAU/WAU engagement ratio (1/7 = everyone
    * shows once, 1.0 = everyone daily). The intensity complement of
    * [[growthAccounting]]'s composition ledger.
    *
    * Two distinct-count aggregates on (user, day)/(user, week) keys —
    * exact integers; the one division per week stabilizes through
    * DECIMAL(18,8).
    */
  def stickiness(df: DataFrame, userCol: String, tsCol: String,
      roundDigits: Int = 4): DataFrame = {
    val day = to_date(date_trunc("DAY", col(tsCol)))
    val wk = to_date(date_trunc("WEEK", col(tsCol)))
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val dau = df.select(col(userCol).as("__u"), day.as("__d"), wk.as("__w"))
      .distinct()
      .groupBy(col("__w")).agg(count(lit(1)).as("__active_days"))
    val wau = df.select(col(userCol).as("__u"), wk.as("__w")).distinct()
      .groupBy(col("__w")).agg(count(lit(1)).as("wau"))
    wau.join(dau, Seq("__w"))
      .select(col("__w").as("week"), col("wau"),
        round((col("__active_days").cast("double") / 7).cast(stable),
          roundDigits).cast("double").as("avg_dau"),
        round((col("__active_days").cast("double") / 7 / col("wau"))
          .cast(stable), roundDigits).cast("double").as("stickiness"))
  }

  /** X139 — growth accounting: per week, the WAU decomposition into
    * `new` (first-ever week), `retained` (also active the prior
    * week), `resurrected` (returning after a gap), and `churned`
    * (active the PRIOR week, absent this week — attributed to the
    * week they failed to show). The standard product-growth ledger:
    * `wau(w) = wau(w−1) + new + resurrected − churned` holds by
    * construction.
    *
    * Everything is distinct-user counting on (user, week) keys —
    * exact integers end to end, two self-joins of user-week
    * cardinality (the weekly activity table, never raw events). Weeks
    * with zero actives but nonzero churn still appear (the outer
    * union with the churn side — a silent drop there would hide a
    * total collapse, the one week you most need to see). Churn is
    * reported only through the LAST observed week: without the clip,
    * every user active in the final week would land in an artifactual
    * max-week+7 churn row — an observation-boundary effect, not real
    * churn (r12 ADVICE).
    */
  def growthAccounting(df: DataFrame, userCol: String, tsCol: String)
    : DataFrame = {
    val wk = to_date(date_trunc("WEEK", col(tsCol)))
    val act = df.select(col(userCol).as("__u"), wk.as("__w")).distinct()
    val first = act.groupBy(col("__u")).agg(min(col("__w")).as("__w0"))
    val prev = act.select(col("__u"), date_add(col("__w"), 7).as("__w"))
    val classified = act
      .join(first, Seq("__u"))
      .join(prev.withColumn("__had_prev", lit(1)).distinct(),
        Seq("__u", "__w"), "left")
      .groupBy(col("__w"))
      .agg(
        sum(when(col("__w") === col("__w0"), 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("__w") =!= col("__w0")
          && col("__had_prev").isNotNull, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("__w") =!= col("__w0")
          && col("__had_prev").isNull, 1L).otherwise(0L))
          .as("n_resurrected"),
        count(lit(1)).as("wau"))
    // churn only through the last OBSERVED week: everyone active in
    // the final week would otherwise land in an artifactual
    // max-week+7 row — an observation-boundary effect reported as
    // real churn (r12 ADVICE)
    val maxW = act.agg(max(col("__w")).as("__wmax"))
    val churned = prev
      .join(act, Seq("__u", "__w"), "left_anti")
      .crossJoin(broadcast(maxW))
      .filter(col("__w") <= col("__wmax"))
      .groupBy(col("__w")).agg(count(lit(1)).as("n_churned"))
    classified.join(churned, Seq("__w"), "full_outer")
      .select(col("__w").as("week"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"),
        coalesce(col("wau"), lit(0L)).as("wau"))
  }

  /** X140 — sequence anomaly score: each user's event chain scored by
    * its mean negative log-likelihood under the GLOBAL empirical
    * transition matrix — the behavioral complement of
    * [[markovEntropyRate]]'s corpus-level number (bots replaying the
    * one common loop score LOW, broken or adversarial flows score
    * HIGH). The event-sequence analog of the x112 bigram-LM text
    * scorer.
    *
    * One lead window per user builds the transitions; the global
    * matrix is a type²-cardinality aggregate broadcast back; each
    * `−ln(n_ij/n_i·)` term casts to DECIMAL(18,10) and sums exactly
    * per user. Users with no transitions have no row.
    */
  def sequenceLikelihood(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String,
      roundDigits: Int = 6): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val trans = df
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).as("__from"),
        col("__to"))
    val matrix = trans.groupBy(col("__from"), col("__to"))
      .agg(count(lit(1)).as("__n"))
    val fromTot = matrix.groupBy(col("__from")).agg(sum(col("__n")).as("__nf"))
    val dec = org.apache.spark.sql.types.DecimalType(18, 10)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val term = (-log(col("__n") / col("__nf").cast("double"))).cast(dec)
    trans
      .join(broadcast(matrix), Seq("__from", "__to"))
      .join(broadcast(fromTot), Seq("__from"))
      .groupBy(col("__u"))
      .agg(count(lit(1)).as("n_transitions"),
        round((sum(term).cast("double") / count(lit(1))).cast(stable),
          roundDigits).cast("double").as("avg_nll"))
      .select(col("__u").as(userCol), col("n_transitions"),
        col("avg_nll"))
  }

  /** X136 — time-to-convert: per user, the latency from the FIRST
    * `fromType` event to the first `toType` event at-or-after it —
    * the funnel-latency distribution ("how long from signup to first
    * purchase") that conversion RATES (sequenceFunnel) don't carry.
    * Users who never convert appear with null latency (the
    * denominator matters: a fast median over 1% converters is not
    * health).
    *
    * Two per-user aggregates: min fromTs per user, then the
    * conversion events join that (broadcast-sized) first-event table,
    * filter to on-or-after, and take min toTs per user — no window,
    * no self-join; cost is two user-cardinality aggregates plus one
    * broadcast join.
    */
  def timeToConvert(
      df: DataFrame,
      userCol: String, tsCol: String, typeCol: String,
      fromType: String, toType: String): DataFrame = {
    val us = unix_micros(col(tsCol))
    val first = df.filter(col(typeCol) === fromType)
      .groupBy(col(userCol)).agg(min(us).as("__from_us"))
    val conv = df.filter(col(typeCol) === toType)
      .select(col(userCol), us.as("__to_us"))
      .join(first, Seq(userCol))
      .filter(col("__to_us") >= col("__from_us"))
      .groupBy(col(userCol)).agg(min(col("__to_us")).as("__conv_us"))
    first.join(conv, Seq(userCol), "left")
      .select(col(userCol),
        ((col("__conv_us") - col("__from_us")) / 1000000L)
          .cast("bigint").as("latency_s"))
  }

  /** X134 — Markov entropy rate of the event-type process: with
    * empirical transition counts `n_ij`,
    * `H = −Σ_ij (n_ij/N)·ln(n_ij/n_i·)` nats per step — how
    * PREDICTABLE the next event is given the current one (0 =
    * deterministic flows, ln(k) = uniform chaos over k types). The
    * one-number sequence-health metric next to [[markovTransitions]]'
    * full matrix: bots and broken instrumentation both crater it.
    *
    * One lead window per user (user-key shuffle), one count aggregate
    * to type² rows, one final sum — each term ONE left-associated
    * double expression cast DECIMAL(18,10) and summed exactly (the
    * mutualInfo discipline).
    */
  def markovEntropyRate(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String,
      roundDigits: Int = 6): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(typeCol).as("__from"), col("__to"))
      .agg(count(lit(1)).as("__n"))
    val fromTot = pairs.groupBy(col("__from")).agg(sum(col("__n")).as("__nf"))
    val total = pairs.agg(sum(col("__n")).as("__nt"),
      countDistinct(col("__from")).as("__states"))
    val dec = org.apache.spark.sql.types.DecimalType(18, 10)
    val term = (-(col("__n") / col("__nt").cast("double"))
      * log(col("__n") / col("__nf").cast("double"))).cast(dec)
    pairs.join(fromTot, "__from")
      .crossJoin(broadcast(total))
      .agg(
        first(col("__nt")).as("n_transitions"),
        first(col("__states")).as("n_states"),
        round(sum(term).cast("double"), roundDigits).as("entropy_rate"))
  }

  /** X126 — Nelson–Aalen cumulative hazard: `H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ`
    * over the same right-censored lifetimes as [[kaplanMeier]] — the
    * hazard-scale view (≈ −ln S; additive, so it reads off WHEN churn
    * pressure accelerates, which the survival curve's products
    * flatten). Same lifetime/censoring construction and
    * window-bounded-by-duration-cardinality shape as KM.
    *
    * Portability: each dᵢ/nᵢ increment is one IEEE division on exact
    * integers, cast to DECIMAL(18,10) and running-summed EXACTLY (the
    * linkPrediction discipline — KM can sum ln-factors in float
    * because exp smooths them; an additive hazard cannot), then
    * rounded once per row.
    */
  def nelsonAalen(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      censorLastDays: Int = 3,
      roundDigits: Int = 6): DataFrame = {
    require(censorLastDays >= 0, "censorLastDays must be >= 0")
    val perUser = df.groupBy(col(keyCol)).agg(
      to_date(min(col(tsCol))).as("__first"),
      to_date(max(col(tsCol))).as("__last"))
    val gmax = df.agg(to_date(max(col(tsCol))).as("__gmax"))
    val lifetimes = perUser.crossJoin(broadcast(gmax))
      .select(
        datediff(col("__last"), col("__first")).cast("long").as("__dur"),
        (datediff(col("__gmax"), col("__last")) >= censorLastDays)
          .cast("long").as("__event"))
    val byDur = lifetimes.groupBy(col("__dur")).agg(
      count(lit(1)).as("__n"), sum(col("__event")).as("__d"))
    val total = lifetimes.agg(count(lit(1)).as("__total"))
    val wPrev = Window.orderBy(col("__dur"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy(col("__dur"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val dec = org.apache.spark.sql.types.DecimalType(18, 10)
    byDur.crossJoin(broadcast(total))
      .withColumn("__risk",
        col("__total") - coalesce(sum(col("__n")).over(wPrev), lit(0L)))
      .withColumn("hazard",
        round(sum((col("__d").cast("double") / col("__risk")).cast(dec))
          .over(wRun).cast("double"), roundDigits))
      .select(col("__dur").as("duration_days"),
        col("__risk").as("n_risk"),
        col("__d").as("n_events"),
        col("hazard"))
  }

  /** X127 — two-proportion z-test for a deterministic A/B split: the
    * experiment readout (`did the variant move the conversion rate,
    * and beyond noise?`). The pooled-variance z:
    * `z = (p₁ − p₂)/√(p̂(1−p̂)(1/n₁ + 1/n₂))`.
    *
    * ONE conditional-count aggregate over one scan (the welchTTest
    * shape); everything enters the final expression as an exact
    * integer count, so the z and the rate delta are single shared
    * float expressions stabilized through DECIMAL(18,8). Degenerate
    * splits (either side empty, or pooled rate 0/1 → zero variance)
    * yield null, not a division error.
    */
  def twoProportionZ(
      df: DataFrame,
      inA: Column, inB: Column, success: Column,
      roundDigits: Int = 4): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val agg = df.filter(inA || inB).agg(
      count(when(inA, lit(1))).as("__na"),
      count(when(inA && success, lit(1))).as("__ca"),
      count(when(inB, lit(1))).as("__nb"),
      count(when(inB && success, lit(1))).as("__cb"))
    val na = col("__na").cast("double")
    val nb = col("__nb").cast("double")
    val p1 = col("__ca") / na
    val p2 = col("__cb") / nb
    val pp = (col("__ca") + col("__cb")) / (na + nb)
    val z = (p1 - p2) / sqrt(pp * (lit(1.0d) - pp)
      * (lit(1.0d) / na + lit(1.0d) / nb))
    def r(c: Column): Column =
      round(c.cast(stable), roundDigits).cast("double")
    agg.select(
      col("__na").as("n_a"), col("__ca").as("conv_a"),
      col("__nb").as("n_b"), col("__cb").as("conv_b"),
      r(when(col("__na") > 0, p1)).as("rate_a"),
      r(when(col("__nb") > 0, p2)).as("rate_b"),
      r(when(col("__na") > 0 && col("__nb") > 0
        && pp > 0 && pp < 1, z)).as("z_stat"))
  }

  def timeFeatures(df: DataFrame, dateCol: String, prefix: String = ""): DataFrame = {
    val d = col(dateCol)
    df.withColumn(s"${prefix}quarter", quarter(d))
      .withColumn(s"${prefix}week", weekofyear(d))
      .withColumn(s"${prefix}day", dayofmonth(d))
      .withColumn(s"${prefix}dayofweek", weekday(d))
      .withColumn(s"${prefix}is_weekend",
        weekday(d).isin(5, 6).cast("int"))
  }

  /** X125 — exponentially time-decayed event counts: at each event,
    * `Σ_j 2^(−(t_i − t_j)/halfLife)` over the user's events so far —
    * the "trending right now" primitive (recency-weighted activity,
    * decayed heavy hitters) with a principled decay instead of an
    * arbitrary window cliff.
    *
    * LINEAR batch plan (r12 — replaces the O(Σ nᵤ²) per-user pair
    * join the r11 verdict flagged): factor the kernel per half-life
    * segment. With B = halfLife and x = t − t₀(user), seg = x div B,
    * dx = x mod B:
    * `Σⱼ 0.5^((tᵢ−tⱼ)/h) = 0.5^(dxᵢ/h)·Rᵢ + Σ_d 0.5^(dxᵢ/h + d)·W_{seg−d}`
    * where `Rᵢ` is the RUNNING sum of per-row weights `2^(dx/h)` within
    * (user, seg) and `W_s` the segment totals — one window pass plus a
    * 36-way bounded lookback (beyond 36 half-lives a whole segment's
    * worth of weight is < 2⁻³⁵ per event — below the old per-pair
    * DECIMAL(18,10) quantum, i.e. exactly what the pair form already
    * dropped). Cost: one window + one (u,seg) aggregate + a 36×
    * row-expansion equi-join — linear in events, no self-join.
    *
    * Portability: weights are rebased so exponents stay in [0,1) and
    * 2^f evaluates via [[exp2Poly]] — a fixed-order Horner polynomial
    * over shared literal coefficients, bit-identical on any IEEE
    * engine (libm `pow` is NOT bit-portable: Java Math.pow and glibc
    * pow disagree in the last ulp, which flipped a per-term decimal
    * quantization at a quantum boundary in live sf0.1 data — so NO
    * libm call remains anywhere in this operator). The quantized
    * weights (DECIMAL(18,7)) sum exactly in window and segment
    * aggregates; every float product has engine-identical operands and
    * quantizes to DECIMAL(28,10) before the final order-free decimal
    * sum. Declared bound: ≤ ~4×10⁸ events per (user, half-life
    * window) keeps the decimal→double rebuilds exact (unscaled <
    * 2⁵³). The streaming twin
    * [[graft.streaming.Stateful.decayedCounts]] is the O(1)
    * per-arrival form, proven equal on dyadic-exact data in
    * StatefulSpec.
    */
  def decayedCounts(
      df: DataFrame,
      userCol: String, tsCol: String, tieCol: String,
      halfLifeSeconds: Long,
      roundDigits: Int = 4): DataFrame = {
    require(halfLifeSeconds > 0, "halfLifeSeconds must be positive")
    val us = unix_micros(col(tsCol))
    val e = df.select(col(userCol).as("__u"), us.as("__t"),
      col(tieCol).as("__id"))
    val hus = halfLifeSeconds * 1000000.0d
    val husL = halfLifeSeconds * 1000000L
    val lookback = 36
    val wDec = org.apache.spark.sql.types.DecimalType(18, 7)
    val tDec = org.apache.spark.sql.types.DecimalType(28, 10)
    def fr: Column = col("__rem").cast("double") / lit(hus)
    val uWin = org.apache.spark.sql.expressions.Window.partitionBy("__u")
    val e2 = e
      .withColumn("__x", col("__t") - min(col("__t")).over(uWin))
      .withColumn("__rem", pmod(col("__x"), lit(husL)))
      .withColumn("__seg",
        ((col("__x") - col("__rem")) / lit(husL)).cast("long"))
      .withColumn("__w", exp2Poly(fr).cast(wDec))
    val runWin = org.apache.spark.sql.expressions.Window
      .partitionBy("__u", "__seg").orderBy(col("__t"), col("__id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val withR = e2.withColumn("__R", sum(col("__w")).over(runWin))
      .withColumn("__same",
        ((lit(1.0d) / exp2Poly(fr))
          * col("__R").cast("double")).cast(tDec))
    val wseg = e2.groupBy(col("__u"), col("__seg")).agg(sum(col("__w")).as("__W"))
    // d ∈ 1..36 with its EXACT 2^−d double (both engines rebuild the
    // same exact value, Scala from the precomputed literal, the oracle
    // from 1/(1<<d) — exact either way)
    val dTable = typedLit((1 to lookback).map(d => (d, 1.0d / (1L << d))))
    val expanded = e2
      .select(col("__u"), col("__t"), col("__id"), col("__seg"), col("__rem"))
      .withColumn("__dt", explode(dTable))
      .withColumn("__ps", col("__seg") - col("__dt._1"))
    val cross = expanded
      .join(wseg.withColumnRenamed("__seg", "__ps"), Seq("__u", "__ps"))
      .select(col("__u"), col("__t"), col("__id"),
        ((col("__dt._2") / exp2Poly(fr))
          * col("__W").cast("double")).cast(tDec).as("__ct"))
      .groupBy(col("__u"), col("__t"), col("__id"))
      .agg(sum(col("__ct")).as("__cross"))
    withR
      .join(cross, Seq("__u", "__t", "__id"), "left")
      .select(col("__u").as(userCol), col("__t").as("ts_us"),
        col("__id").as(tieCol),
        // __cross contracts back to DECIMAL(28,10) (same scale — value
        // preserved) BEFORE the add: Spark's sum() widened it to
        // (38,10), and (28,10)+(38,10) needs precision 39, which
        // trips the precision-loss path and silently re-rounds the
        // sum at scale 9 — a double rounding that flipped a live
        // boundary row (…499996 → …50000 → up)
        round(col("__same")
            + coalesce(col("__cross").cast(tDec), lit(0).cast(tDec)),
          roundDigits).cast("double").as("decayed_count"))
  }

  /** Taylor coefficients of 2^f (`(ln 2)^k / k!`, k = 0..12) as
    * shortest-round-trip decimal strings: any IEEE-754 engine parses
    * each to the identical double, so a polynomial over them is a
    * shared cross-engine definition. Referenced verbatim by the
    * DuckDB oracle generator. */
  val Exp2Coeffs: IndexedSeq[String] = IndexedSeq(
    "1.0",
    "0.6931471805599453",
    "0.24022650695910072",
    "0.05550410866482158",
    "0.009618129107628477",
    "0.0013333558146428443",
    "0.0001540353039338161",
    "1.5252733804059841e-05",
    "1.321548679014431e-06",
    "1.01780860092397e-07",
    "7.054911620801123e-09",
    "4.4455382718708116e-10",
    "2.5678435993488206e-11")

  /** 2^f for f ∈ [0,1) as a FIXED-ORDER Horner polynomial over
    * [[Exp2Coeffs]] — pure IEEE mul/add, bit-identical on any engine.
    * libm `pow` is NOT bit-portable (Java Math.pow and glibc pow
    * disagree in the last ulp — observed flipping a decimal quantum
    * in live sf0.1 data), so portable operators must never let a libm
    * transcendental reach an emitted value. Truncation ≲ 1.5e-12
    * relative on [0,1) — the polynomial IS the definition; both
    * engines evaluate the same op DAG. */
  def exp2Poly(f: Column): Column = {
    val cs = Exp2Coeffs.map(s => lit(java.lang.Double.parseDouble(s)))
    cs.reverse.tail.foldLeft(cs.last: Column)((acc, c) => acc * f + c)
  }

  /** X124 — rolling correlation between two aligned series per key
    * (price vs demand over a trailing window: "is the price-response
    * live right now?"). Emits a correlation at every row whose
    * trailing window is FULL (`min_periods = w`, pandas semantics).
    *
    * Portability is the whole design: a double window-sum is NOT
    * addition-order-free (engines disagree — DuckDB slides windows
    * with a segment tree, Spark recomputes frames; different
    * association, different ulps), so both inputs quantize to 6 dp and
    * the five moment sums run as DECIMAL window sums — exact under ANY
    * association. The per-row correlation assembles from those exact
    * operands in one shared float expression, stabilized through
    * DECIMAL(18,8). Zero-variance windows yield null.
    */
  def rollingCorrelation(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      xCol: String,
      yCol: String,
      window: Int,
      roundDigits: Int = 6): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val dec2 = org.apache.spark.sql.types.DecimalType(37, 12)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val x = round(col(xCol).cast("double"), 6).cast(dec)
    val y = round(col(yCol).cast("double"), 6).cast(dec)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    val n = count(lit(1)).over(w)
    val sx = sum(x).over(w).cast("double")
    val sy = sum(y).over(w).cast("double")
    val sxy = sum((x * y).cast(dec2)).over(w).cast("double")
    val sxx = sum((x * x).cast(dec2)).over(w).cast("double")
    val syy = sum((y * y).cast(dec2)).over(w).cast("double")
    val nd = n.cast("double")
    val covN = nd * sxy - sx * sy
    val varX = nd * sxx - sx * sx
    val varY = nd * syy - sy * sy
    df.withColumn("rolling_corr",
      when(n === window && varX > 0 && varY > 0,
        round((covN / sqrt(varX * varY)).cast(stable), roundDigits)
          .cast("double")))
  }

  /** X120 — linear multi-touch attribution: every touch inside the
    * lookback window before a conversion shares the credit equally
    * (1/k each) — the multi-touch complement of
    * [[lastTouchAttribution]]'s winner-takes-all rule. Reported per
    * channel: total credit and how many conversions it participated
    * in.
    *
    * Shape: conversions join touches per user with a range predicate —
    * a user-key shuffle whose per-pair cost is bounded by the lookback
    * window, never event × event across users; per-conversion touch
    * counts are one aggregate on the join output. Portability: each
    * credit `1/k` is one IEEE division cast to DECIMAL(18,10) and
    * summed exactly (the linkPrediction discipline), so per-channel
    * totals are addition-order-free.
    */
  def linearAttribution(
      df: DataFrame,
      userCol: String, tsCol: String, tieCol: String, typeCol: String,
      touchTypes: Seq[String], convType: String,
      windowSeconds: Long,
      roundDigits: Int = 6): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(windowSeconds > 0, "windowSeconds must be positive")
    val us = unix_micros(col(tsCol))
    val conv = df.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"), us.as("__cts"),
        col(tieCol).as("__cid"))
    val touch = df.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__u"), us.as("__tts"),
        col(typeCol).as("channel"))
    val w = windowSeconds * 1000000L
    val joined = conv.join(touch,
      Seq("__u")).filter(
      col("__tts") < col("__cts") && col("__tts") >= col("__cts") - w)
    val perConv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__u"), col("__cts"), col("__cid"))
    val dec = org.apache.spark.sql.types.DecimalType(18, 10)
    joined
      .withColumn("__k", count(lit(1)).over(perConv))
      .groupBy(col("channel"))
      .agg(
        sum((lit(1.0d) / col("__k")).cast(dec)).as("__credit"),
        countDistinct(col("__u"), col("__cts"), col("__cid"))
          .as("n_conversions"))
      .select(col("channel"),
        round(col("__credit").cast("double"), roundDigits)
          .as("credit"),
        col("n_conversions"))
  }

  /** X115 — per-user inter-arrival statistics: mean gap, coefficient
    * of variation, and Goh–Barabási burstiness
    * `B = (σ−μ)/(σ+μ)` (−1 = metronome, 0 = Poisson, →1 = bursty) —
    * the temporal-behavior fingerprint that separates bots (B ≈ −1),
    * organic users (B ≈ 0), and binge sessions (B → 1). Feeds the
    * same screens as [[sessionize]] without choosing a gap threshold.
    *
    * Shape: one lag window per user (user-key shuffle, scales with
    * per-user event counts), then ONE map-side-combinable aggregate.
    * Portability: gaps are exact integer MICROS; `Σg` and `Σg²` sum in
    * DECIMAL(38,0) — exact, addition-order-free (Σg² of micro-gaps
    * reaches ~10²⁸, far inside 38 digits) — and the variance assembles
    * from the exact sums in one shared float expression (never a
    * per-engine `var_samp` accumulation). Outputs stabilize through
    * DECIMAL(18,8). Users with < 2 gaps have no variance → null CV
    * and burstiness; users with < 2 events have no gaps and no row.
    */
  def interArrivalStats(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, roundDigits: Int = 4): DataFrame = {
    val us = unix_micros(col(tsCol))
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val gaps = df
      .withColumn("__g", us - lag(us, 1).over(w))
      .filter(col("__g").isNotNull)
    // g² overflows int64 for gaps beyond ~54 minutes (3e9 µs squared
    // is 9e18): square in DECIMAL(19,0) so the product is exact decimal
    val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val agg = gaps.groupBy(col(userCol)).agg(
      count(lit(1)).as("__n"),
      sum(col("__g").cast(dec)).as("__sg"),
      sum(col("__g").cast(d19) * col("__g").cast(d19)).as("__sgg"))
    val n = col("__n").cast("double")
    val sg = col("__sg").cast("double")
    val sgg = col("__sgg").cast("double")
    val mean = sg / n
    val varG = (n * sgg - sg * sg) / (n * (n - 1))
    val sd = sqrt(varG)
    def r(c: Column): Column =
      round(c.cast(stable), roundDigits).cast("double")
    agg.select(col(userCol),
      col("__n").as("n_gaps"),
      r(mean / lit(1000000.0d)).as("mean_gap_s"),
      // mean = 0 (all gaps zero) would make CV 0/0 and burstiness
      // (0-0)/(0+0): guard on the denominators, not just the variance
      r(when(col("__n") >= 2 && mean > 0, sd / mean)).as("cv_gap"),
      r(when(col("__n") >= 2 && (sd + mean) > 0, (sd - mean) / (sd + mean)))
        .as("burstiness"))
  }

  /** X159 — cohort retention triangle: per (cohort week = the user's
    * first-ever week, age in weeks), the active-user count and the
    * retention share of the cohort — the matrix every product review
    * reads row by row ("is week-4 retention improving cohort over
    * cohort?"), and the disaggregated source of [[growthAccounting]]'s
    * per-week ledger. All exact distinct-count arithmetic on the
    * user-week activity table; one user-cardinality first-week
    * aggregate, one (cohort, age) count, cohort sizes joined back.
    */
  def retentionTriangle(df: DataFrame, userCol: String, tsCol: String,
      roundDigits: Int = 4): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val wk = to_date(date_trunc("WEEK", col(tsCol)))
    val act = df.select(col(userCol).as("__u"), wk.as("__w")).distinct()
    val first = act.groupBy(col("__u")).agg(min(col("__w")).as("__c"))
    val sizes = first.groupBy(col("__c")).agg(count(lit(1)).as("__n0"))
    act.join(first, "__u")
      .select(col("__c"),
        (datediff(col("__w"), col("__c")) / 7).cast("long").as("__age"))
      .groupBy(col("__c"), col("__age"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "__c")
      .select(col("__c").as("cohort_week"), col("__age").as("age_weeks"),
        col("n_active"), col("__n0").as("cohort_size"),
        round((col("n_active").cast("double") / col("__n0")).cast(stable),
          roundDigits).cast("double").as("retention"))
  }

  /** X161 — session statistics: one row of session-level health over
    * [[sessionize]]'s output — session count, bounce rate (single-event
    * sessions), mean events per session, and the EXACT median session
    * duration (the r12 rank-arithmetic quantile; a mean duration is
    * meaningless under the heavy right tail sessions always have).
    */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long, roundDigits: Int = 4): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val s = sessionize(df, userCol, tsCol, tieCol, gapSeconds)
    val med = Profiling.groupedExactQuantiles(s, Seq(), col("duration_us"),
      Seq("__med_us" -> 0.5))
    s.agg(
        count(lit(1)).as("n_sessions"),
        sum((col("n_events") === 1).cast("long")).as("n_bounce"),
        sum(col("n_events")).as("__ev"))
      .crossJoin(med)
      .select(col("n_sessions"), col("n_bounce"),
        round((col("n_bounce").cast("double") / col("n_sessions"))
          .cast(stable), roundDigits).cast("double").as("bounce_rate"),
        round((col("__ev").cast("double") / col("n_sessions"))
          .cast(stable), roundDigits).cast("double")
          .as("events_per_session"),
        round((col("__med_us").cast("double") / 1000000.0d).cast(stable),
          roundDigits).cast("double").as("median_duration_s"))
  }

  /** X147 — simple exponential smoothing per key:
    * `S_t = α·y_t + β·S_{t−1}`, `S_1 = y_1` — the classic one-knob
    * smoother whose last state IS the one-step-ahead forecast (the
    * baseline every fancier model must beat; the reference's M5 family
    * sits beside exactly this kind of statistical baseline).
    *
    * Cross-engine pattern (new in r12): an ORDERED-FOLD PARITY gate.
    * The recursion is evaluated as one per-key left fold — Spark's
    * `aggregate` higher-order function over the sorted value array ≡
    * DuckDB's `list_reduce` over `list(... ORDER BY ...)`. Both
    * engines fold left-to-right from the first element with the SAME
    * lambda (`α·x + β·acc`, α and β shared shortest-round-trip double
    * literals), so every intermediate S_t is the identical IEEE
    * double — recursions that a window cannot express become exactly
    * gateable. β is passed explicitly (1−α recomputed per engine
    * could differ by an ulp; the caller-side Scala subtraction is
    * done ONCE and shared as a literal).
    *
    * Scale: one grouped collect of the per-key series — bounded by
    * the OBSERVATION WINDOW (days), never by row count (the
    * kaplanMeier bounded-window argument); inputs quantize through
    * DECIMAL(18,6) so both engines fold identical doubles.
    */
  def sesForecast(
      df: DataFrame,
      keyCol: String, orderCol: String, valueCol: String,
      alpha: Double,
      roundDigits: Int = 4): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val beta = 1.0 - alpha
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val y = col(valueCol).cast(dec6).cast("double")
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(orderCol).as("__o"), y.as("__y"))
    rows.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_obs"),
        expr("array_sort(collect_list(struct(__o, __y)))").as("__a"))
      .withColumn("__ys", expr("transform(__a, s -> s.__y)"))
      .select(col("__k").as(keyCol), col("n_obs"),
        round(expr(
          s"aggregate(slice(__ys, 2, size(__ys) - 1), element_at(__ys, 1), " +
            s"(acc, x) -> ${alpha}D * x + ${beta}D * acc)")
          .cast(stable), roundDigits).cast("double").as("ses_forecast"))
  }

  /** X158 — Holt's linear-trend forecast per key (double exponential
    * smoothing): `l_t = α·y_t + (1−α)(l+b)`, `b_t = γ(l_t−l) + (1−γ)b`,
    * one-step forecast `l+b` — the trending complement of
    * [[sesForecast]], and the MULTI-STATE extension of the r12
    * ordered-fold parity pattern: the accumulator is a STRUCT folded
    * identically by Spark's `aggregate` (explicit init + finish) and
    * DuckDB's `list_reduce` (init prepended as the first element,
    * values pair-wrapped so the lambda shape matches). The
    * accumulator is an ARRAY [l, b], NOT a struct: DuckDB's
    * list_reduce evaluates struct-returning lambdas FIELD BY FIELD
    * with the accumulator mutated in place — the second field's
    * expression sees the first field already overwritten (observed
    * live; a scan-order quirk this gate must not depend on either
    * way). List construction evaluates every element from the
    * original accumulator on both engines. All four smoothing
    * literals are shared shortest-round-trip doubles — complements
    * are Scala-computed ONCE, never re-derived per engine. Init:
    * `l = y₂, b = y₂ − y₁`, fold from the 3rd point; a single-point
    * series forecasts itself.
    */
  def holtForecast(
      df: DataFrame,
      keyCol: String, orderCol: String, valueCol: String,
      alpha: Double, gamma: Double,
      roundDigits: Int = 4): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    require(gamma > 0 && gamma < 1, s"gamma must be in (0,1): $gamma")
    val bL = 1.0 - alpha
    val dT = 1.0 - gamma
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val y = col(valueCol).cast(dec6).cast("double")
    val lExpr =
      s"${alpha}D * x + ${bL}D * (element_at(acc, 1) + element_at(acc, 2))"
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(orderCol).as("__o"), y.as("__y"))
    rows.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_obs"),
        expr("array_sort(collect_list(struct(__o, __y)))").as("__a"))
      .withColumn("__ys", expr("transform(__a, s -> s.__y)"))
      .select(col("__k").as(keyCol), col("n_obs"),
        round(expr(
          s"""CASE WHEN size(__ys) = 1 THEN element_at(__ys, 1)
             |ELSE aggregate(
             |  slice(__ys, 3, size(__ys) - 2),
             |  array(element_at(__ys, 2),
             |    element_at(__ys, 2) - element_at(__ys, 1)),
             |  (acc, x) -> array(
             |    $lExpr,
             |    ${gamma}D * (($lExpr) - element_at(acc, 1))
             |      + ${dT}D * element_at(acc, 2)),
             |  acc -> element_at(acc, 1) + element_at(acc, 2)) END"""
            .stripMargin)
          .cast(stable), roundDigits).cast("double").as("holt_forecast"))
  }

  /** X180 — conversion-latency profile: for each user's FIRST
    * `fromType` event, the time to their first `toType` event at or
    * after it — conversion count plus EXACT p50/p90 latency seconds —
    * the "how long does signup→purchase take" number that sets
    * attribution windows (x123/x160's lookback) and session TTLs from
    * DATA instead of convention.
    *
    * Shape: two per-user min aggregates (map-side combinable), one
    * user-key join, then the exact-quantile machinery over the
    * per-user latency (user-cardinality input — the ranked pass's
    * scale-safe form). Latency converts µs → seconds in ONE double
    * division by 10⁶ (exact for any µs count below 2⁵³) and quantizes
    * through the quantile DECIMAL(18,6) contract.
    */
  def conversionLatency(
      df: DataFrame,
      userCol: String, tsCol: String, typeCol: String,
      fromType: String, toType: String): DataFrame = {
    val firstFrom = df.filter(col(typeCol) === fromType)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__c"))
    val firstTo = df.filter(col(typeCol) === toType)
      .select(col(userCol).as("__u"), col(tsCol).as("__p0"))
      .join(firstFrom, "__u")
      .filter(col("__p0") >= col("__c"))
      .groupBy(col("__u"), col("__c"))
      .agg(min(col("__p0")).as("__p"))
    val lat = firstTo.select(
      ((unix_micros(col("__p")) - unix_micros(col("__c"))).cast("double")
        / lit(1000000.0)).as("__lat"))
    val q = Profiling.groupedExactQuantiles(lat, Seq(), col("__lat"),
      Seq("p50_seconds" -> 0.5, "p90_seconds" -> 0.9))
    val n = lat.agg(count(lit(1)).as("n_conversions"))
    n.crossJoin(broadcast(q))
      .select(col("n_conversions"),
        col("p50_seconds").cast("double").as("p50_seconds"),
        col("p90_seconds").cast("double").as("p90_seconds"))
  }

  /** X175 — lead–lag cross-correlation between two keyed series:
    * `corr(x_t, y_{t−k})` for every lag k ∈ [−maxLag, maxLag] over the
    * days both series share — "does signups' curve lead purchases', and
    * by how many days?", the alignment diagnostic behind attribution
    * windows and feature-lag selection (its ACF cousin x126 asks the
    * same question of a series against ITSELF).
    *
    * Shape: two filters of the keyed frame; the y side replicates
    * across the 2·maxLag+1 lags with its day shifted by −k, so ONE
    * day-equijoin pairs x_d with y_{d+k} by CALENDAR day — a gap in
    * either series yields no pair for that (d, k), never a silently
    * mis-aligned one (r13 ADVICE: the previous positional
    * `lead/lag`-over-shared-days shift let "lag k" span more than k
    * days across calendar gaps). A lag spine left-join keeps every k
    * in the output (0 pairs, null corr). `corr` is the
    * engine-portable sample correlation the x126 gate already pins;
    * values quantize through DECIMAL(18,6) first. Lags with fewer
    * than 2 overlapping pairs emit null.
    *
    * Scale: the replicate + join is day-cardinality × lags — bounded
    * by the observation window, never by event count (feed per-period
    * aggregates, the sesForecast contract).
    */
  def leadLagCorrelation(
      df: DataFrame,
      keyCol: String, dayCol: String, valueCol: String,
      keyA: String, keyB: String,
      maxLag: Int,
      roundDigits: Int = 4): DataFrame = {
    require(maxLag >= 1 && maxLag <= 60, s"maxLag out of range: $maxLag")
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val v = col(valueCol).cast(dec6).cast("double")
    val a = df.filter(col(keyCol) === keyA)
      .select(col(dayCol).as("__d"), v.as("__x"))
    val b = df.filter(col(keyCol) === keyB)
      .select(col(dayCol).as("__d"), v.as("__y"))
    val lags = (-maxLag to maxLag)
    // corr(x_d, y_{d+k}): positive k = x LEADS y by k days (y's curve
    // repeats x's k days later) — so y at day d joins x at day d − k
    val isDate = b.schema("__d").dataType ==
      org.apache.spark.sql.types.DateType
    val bShift = b
      .withColumn("__lag", explode(array(lags.map(k => lit(k)): _*)))
      .select(col("__lag"),
        (if (isDate) date_sub(col("__d"), col("__lag").cast("int"))
         else col("__d") - col("__lag")).as("__ds"),
        col("__y"))
    val byLag = a.join(bShift, col("__d") === col("__ds"))
      .groupBy(col("__lag"))
      .agg(count(lit(1)).as("__np"),
        round(corr(col("__x"), col("__y")), roundDigits).as("__c"))
    val spine = df.sparkSession.range(-maxLag, maxLag + 1)
      .select(col("id").cast("int").as("__lag"))
    spine.join(byLag, Seq("__lag"), "left")
      .select(col("__lag").cast("bigint").as("lag"),
        coalesce(col("__np"), lit(0L)).as("n_pairs"),
        col("__c").as("xcorr"))
  }

  /** X173 — Holt–Winters ADDITIVE-SEASONAL one-step forecast per key
    * (triple exponential smoothing, period `s`):
    * `l_t = α(y_t − S_{t−s}) + (1−α)(l+b)`,
    * `b_t = γ(l_t − l) + (1−γ)b`, `S_t = δ(y_t − l_t) + (1−δ)S_{t−s}`,
    * forecast `l + b + S_{next}` — the seasonal completion of the
    * fold-parity forecasting family (SES x187 = level, Holt x198 =
    * level+trend, this = level+trend+season; the additive
    * decomposition x139 DESCRIBES the season, this one FORECASTS
    * with it).
    *
    * The accumulator extends the x198 ARRAY pattern to a ROTATING
    * ring: `[l, b, S_next, …, S_last]` (length s+2) — each step
    * consumes the head seasonal and appends the refreshed one, so the
    * lambda is a fixed-width array construction both engines evaluate
    * from the ORIGINAL accumulator (the x198 struct-mutation quirk
    * avoided by construction). Standard init from the first two
    * seasons: `l₀ = mean(season 1)`, `b₀ = (mean(s2) − mean(s1))/s`,
    * `S_i = y_i − l₀`; all init arithmetic is fixed left-associated
    * double expressions over DECIMAL(18,6)-quantized inputs, so both
    * engines fold identical doubles. Keys with fewer than 2s
    * observations emit no row (no second season, no trend init).
    *
    * Scale: one grouped collect of the per-key series — feed
    * per-period aggregates, never raw events (the sesForecast
    * bounded-window contract).
    */
  def holtWintersForecast(
      df: DataFrame,
      keyCol: String, orderCol: String, valueCol: String,
      alpha: Double, gamma: Double, delta: Double,
      season: Int = 7,
      roundDigits: Int = 4): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    require(gamma > 0 && gamma < 1, s"gamma must be in (0,1): $gamma")
    require(delta > 0 && delta < 1, s"delta must be in (0,1): $delta")
    require(season >= 2 && season <= 24, s"season out of range: $season")
    val s = season
    val bA = 1.0 - alpha; val bG = 1.0 - gamma; val bD = 1.0 - delta
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val y = col(valueCol).cast(dec6).cast("double")
    // left-associated season mean over ys[off+1 .. off+s]
    def seasonMean(off: Int): String =
      "(" + (1 to s).map(i => s"element_at(__ys, ${off + i})")
        .mkString(" + ") + s") / $s.0D"
    val l0 = s"(${seasonMean(0)})"
    val b0 = s"((${seasonMean(s)}) - ${seasonMean(0)}) / $s.0D"
    val initArr = (Seq(l0, b0) ++
      (1 to s).map(i => s"element_at(__ys, $i) - $l0")).mkString(", ")
    val newL = s"${alpha}D * (x - element_at(acc, 3)) " +
      s"+ ${bA}D * (element_at(acc, 1) + element_at(acc, 2))"
    val newB = s"${gamma}D * (($newL) - element_at(acc, 1)) " +
      s"+ ${bG}D * element_at(acc, 2)"
    val newS = s"${delta}D * (x - ($newL)) " +
      s"+ ${bD}D * element_at(acc, 3)"
    // rotate: consume head seasonal, append the refreshed one
    val rotated = (4 to s + 2).map(i => s"element_at(acc, $i)")
      .mkString(", ")
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(orderCol).as("__o"), y.as("__y"))
    rows.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_obs"),
        expr("array_sort(collect_list(struct(__o, __y)))").as("__a"))
      .filter(col("n_obs") >= 2 * s)
      .withColumn("__ys", expr("transform(__a, t -> t.__y)"))
      .withColumn("__r", expr(
        s"""aggregate(
           |  slice(__ys, ${s + 1}, size(__ys) - $s),
           |  array($initArr),
           |  (acc, x) -> array($newL, $newB, $rotated, $newS))"""
          .stripMargin))
      .select(col("__k").as(keyCol), col("n_obs"),
        round(expr("element_at(__r, 1)").cast(stable), roundDigits)
          .cast("double").as("level"),
        round(expr("element_at(__r, 2)").cast(stable), roundDigits)
          .cast("double").as("trend"),
        round(expr(
          "element_at(__r, 1) + element_at(__r, 2) + element_at(__r, 3)")
          .cast(stable), roundDigits).cast("double").as("hw_forecast"))
  }

  /** X166 — CUSUM drift detector per key: the two-sided cumulative-sum
    * control chart `S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ − μ − k))`,
    * `S⁻ₜ = max(0, S⁻ₜ₋₁ + (μ − k − xₜ))` with the standard
    * `k = kSigma·σ` slack and `h = hSigma·σ` decision interval —
    * the sequential mean-shift detector that catches SLOW drifts a
    * single changepoint scan (x140) sees late and a rolling z-score
    * (x121) never accumulates. Emits each key's max CUSUM excursion
    * both ways and the drift flag `max(S⁺, S⁻) > h`.
    *
    * The recursion is order-dependent and max-clipped — no window can
    * express it — so it rides the r12 ordered-fold parity pattern
    * (ses/holt): per-key sort + ONE fold with an ARRAY accumulator
    * `[S⁺, S⁻, maxS⁺, maxS⁻]` (array, not struct — the x198 DuckDB
    * list_reduce field-mutation quirk), folded identically on both
    * engines. μ and σ come from exact decimal moments (one double
    * sqrt, correctly rounded by IEEE) and ROUND to 6 dp before
    * entering the fold, so every intermediate is the identical double.
    *
    * Scale: one grouped collect of the per-key series — feed
    * PER-PERIOD aggregates (daily means), never raw events, so the
    * array is bounded by the observation window (the kaplanMeier
    * bounded-window argument).
    */
  def cusumDrift(
      df: DataFrame,
      keyCol: String, orderCol: String, valueCol: String,
      kSigma: Double = 0.5, hSigma: Double = 4.0,
      roundDigits: Int = 4): DataFrame = {
    require(kSigma >= 0 && hSigma > 0, s"bad CUSUM params: $kSigma, $hSigma")
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val q12 = org.apache.spark.sql.types.DecimalType(24, 12)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val y = col(valueCol).cast(dec6)
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(orderCol).as("__o"),
        y.as("__y"))
    val agg = rows.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("__y")).cast(org.apache.spark.sql.types.DecimalType(24, 6))
          .as("__sv"),
        sum((col("__y") * col("__y")).cast(q12)).cast(q12).as("__svv"),
        expr("array_sort(collect_list(struct(__o, __y)))").as("__a"))
      .withColumn("__ys",
        expr("transform(__a, s -> CAST(s.__y AS DOUBLE))"))
      // μ, σ from exact decimal moments; ONE left-associated double
      // expression each, rounded to 6 dp so the fold sees identical
      // doubles on any engine
      .withColumn("__mu", round((col("__sv").cast("double") / col("n_obs"))
        .cast(stable), 6).cast("double"))
      .withColumn("__sd", when(col("n_obs") < 2, lit(0.0)).otherwise(
        round(sqrt(greatest(lit(0.0),
          (col("__svv").cast("double")
            - col("__sv").cast("double") * col("__sv").cast("double")
              / col("n_obs")) / (col("n_obs") - 1)))
          .cast(stable), 6).cast("double")))
    val spNew = s"greatest(0D, element_at(acc, 1) + " +
      s"(element_at(xw, 1) - __mu - ${kSigma}D * __sd))"
    val smNew = s"greatest(0D, element_at(acc, 2) + " +
      s"(__mu - ${kSigma}D * __sd - element_at(xw, 1)))"
    val folded = agg.withColumn("__c", expr(
      s"""aggregate(
         |  transform(__ys, y -> array(y, 0D, 0D, 0D)),
         |  array(0D, 0D, 0D, 0D),
         |  (acc, xw) -> array(
         |    $spNew,
         |    $smNew,
         |    greatest(element_at(acc, 3), $spNew),
         |    greatest(element_at(acc, 4), $smNew)))""".stripMargin))
    folded.select(col("__k").as(keyCol), col("n_obs"),
      col("__mu").as("mean"), col("__sd").as("sd"),
      round(expr("element_at(__c, 3)").cast(stable), roundDigits)
        .cast("double").as("max_cusum_up"),
      round(expr("element_at(__c, 4)").cast(stable), roundDigits)
        .cast("double").as("max_cusum_down"),
      (round(greatest(expr("element_at(__c, 3)"),
          expr("element_at(__c, 4)")).cast(stable), roundDigits)
        > round((lit(hSigma) * col("__sd")).cast(stable), roundDigits))
        .cast("long").as("drift"))
  }

  /** X204 — Page–Hinkley mean-shift test per key (Page 1954, the
    * sequential-changepoint standard): the cumulative deviation from
    * the RUNNING mean, `m_t = Σ_{i≤t} (y_i − ȳ_i − δ)` with
    * `ȳ_i = mean(y_1..y_i)`, alarms when `m_t − min_{s≤t} m_s > λ` —
    * the self-calibrating upward-shift detector next to
    * [[cusumDrift]] (CUSUM needs a FIXED baseline μ/σ from the whole
    * window, so a drift contaminates its own baseline; PH's running
    * mean adapts, which is why streaming drift monitors default to
    * it). `δ` is the magnitude slack, `λ` the alarm threshold, both
    * in value units.
    *
    * Exactness (the cusum fold discipline): values quantize through
    * DECIMAL(18,6) → double so both engines fold identical operands;
    * the fold itself is ONE left-to-right double chain per step
    * (running sum, running mean by division, deviation accumulate,
    * running min, max excursion — identical IEEE sequence in Spark's
    * `aggregate` and DuckDB's `list_reduce`), and the only rounding
    * is the final 4 dp display round. Per-key arrays are the
    * sanctioned bounded-series collect (the cusum/ses shape); rows
    * fold in (order, value) sort order.
    */
  def pageHinkley(
      df: DataFrame,
      keyCol: String, orderCol: String, valueCol: String,
      delta: Double = 0.0, lambda: Double = 10.0,
      roundDigits: Int = 4): DataFrame = {
    require(lambda > 0, s"alarm threshold lambda must be positive: $lambda")
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(orderCol).as("__o"),
        col(valueCol).cast(dec6).as("__y"))
    val agg = rows.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_obs"),
        expr("array_sort(collect_list(struct(__o, __y)))").as("__a"))
      .withColumn("__ys",
        expr("transform(__a, s -> CAST(s.__y AS DOUBLE))"))
    // state = [i, Σy, m, min m, max excursion]; every sub-expression
    // re-derives from acc (the x198 struct-mutation lesson)
    val iNew = "(element_at(acc, 1) + 1D)"
    val sNew = "(element_at(acc, 2) + element_at(xw, 1))"
    val mNew = s"(element_at(acc, 3) + (element_at(xw, 1) " +
      s"- $sNew / $iNew - ${delta}D))"
    val minNew = s"least(element_at(acc, 4), $mNew)"
    val folded = agg.withColumn("__c", expr(
      s"""aggregate(
         |  transform(__ys, y -> array(y, 0D, 0D, 0D, 0D)),
         |  array(0D, 0D, 0D, 0D, 0D),
         |  (acc, xw) -> array(
         |    $iNew,
         |    $sNew,
         |    $mNew,
         |    $minNew,
         |    greatest(element_at(acc, 5), $mNew - ($minNew))))""".stripMargin))
    folded.select(col("__k").as(keyCol), col("n_obs"),
      round(expr("element_at(__c, 5)").cast(stable), roundDigits)
        .cast("double").as("ph_stat"),
      (round(expr("element_at(__c, 5)").cast(stable), roundDigits)
        > lit(lambda)).cast("long").as("detected"))
  }

  /** X190 — EWMA control chart per key (Roberts 1959, the SPC
    * standard): `z_t = λ·y_t + (1−λ)·z_{t−1}` with `z_0 = μ`, flagged
    * against the steady-state control limits
    * `μ ± L·σ·sqrt(λ/(2−λ))` — the small-persistent-shift detector
    * that complements [[cusumDrift]] (CUSUM accumulates excursions
    * past a slack; EWMA's exponential memory reacts faster to small
    * sustained drifts and forgets transients).
    *
    * Exactness (the cusum/ses fold discipline): μ and σ come from
    * exact decimal moments rounded to 6 dp doubles; λ, 1−λ, and the
    * combined limit multiplier `L·sqrt(λ/(2−λ))` are SCALA-computed
    * shortest-round-trip double literals (never re-derived per
    * engine); the fold is pure double arithmetic over identical
    * operands, so the violation compares need no rounding at all —
    * both engines walk bit-identical z values. Steady-state (not
    * time-varying) limits by design: the exact variance ramp needs
    * `(1−λ)^{2t}`, and libm pow is not bit-portable (the r12 x165
    * lesson); after t ≈ 3/λ the ramp is within float noise of 1
    * anyway.
    *
    * The accumulator is an ARRAY [z, nViol, firstViol, t] (the x198
    * struct-mutation lesson); rows fold in (order, value) sort order.
    */
  def ewmaChart(
      df: DataFrame,
      keyCol: String, orderCol: String, valueCol: String,
      lambda: Double = 0.2, lSigma: Double = 3.0,
      roundDigits: Int = 4): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1): $lambda")
    require(lSigma > 0, s"lSigma must be positive: $lSigma")
    val beta = 1.0 - lambda
    val lim = lSigma * math.sqrt(lambda / (2.0 - lambda))
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val q12 = org.apache.spark.sql.types.DecimalType(24, 12)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val y = col(valueCol).cast(dec6)
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(orderCol).as("__o"), y.as("__y"))
    val agg = rows.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("__y")).cast(org.apache.spark.sql.types.DecimalType(24, 6))
          .as("__sv"),
        sum((col("__y") * col("__y")).cast(q12)).cast(q12).as("__svv"),
        expr("array_sort(collect_list(struct(__o, __y)))").as("__a"))
      .withColumn("__ys",
        expr("transform(__a, s -> CAST(s.__y AS DOUBLE))"))
      .withColumn("__mu", round((col("__sv").cast("double") / col("n_obs"))
        .cast(stable), 6).cast("double"))
      .withColumn("__sd", when(col("n_obs") < 2, lit(0.0)).otherwise(
        round(sqrt(greatest(lit(0.0),
          (col("__svv").cast("double")
            - col("__sv").cast("double") * col("__sv").cast("double")
              / col("n_obs")) / (col("n_obs") - 1)))
          .cast(stable), 6).cast("double")))
      .withColumn("__ucl", col("__mu") + lit(lim) * col("__sd"))
      .withColumn("__lcl", col("__mu") - lit(lim) * col("__sd"))
    val zNew = s"${lambda}D * x + ${beta}D * element_at(acc, 1)"
    val viol = s"CASE WHEN ($zNew) > __ucl OR ($zNew) < __lcl " +
      "THEN 1D ELSE 0D END"
    val folded = agg.withColumn("__c", expr(
      s"""aggregate(
         |  __ys,
         |  array(__mu, 0D, 0D, 1D),
         |  (acc, x) -> array(
         |    $zNew,
         |    element_at(acc, 2) + ($viol),
         |    CASE WHEN element_at(acc, 3) > 0D THEN element_at(acc, 3)
         |         WHEN ($viol) = 1D THEN element_at(acc, 4)
         |         ELSE 0D END,
         |    element_at(acc, 4) + 1D))""".stripMargin))
    folded.select(col("__k").as(keyCol), col("n_obs"),
      col("__mu").as("mean"), col("__sd").as("sd"),
      round(expr("element_at(__c, 1)").cast(stable), roundDigits)
        .cast("double").as("ewma_final"),
      expr("element_at(__c, 2)").cast("bigint").as("n_violations"),
      when(expr("element_at(__c, 3)") > 0,
        expr("element_at(__c, 3)").cast("bigint")).as("first_violation"))
  }

  /** X199 — turning-points randomness test per key (Kendall): count
    * interior points that are strict local extrema
    * (`y_{i−1} < y_i > y_{i+1}` or `y_{i−1} > y_i < y_{i+1}`); an iid
    * series has `E[T] = 2(n−2)/3` and `Var[T] = (16n−29)/90`, so the
    * z-score flags both OVER-smooth series (too few turns: trends,
    * strong autocorrelation — x126's ACF quantifies which lag) and
    * oscillating ones (too many: alternating seasonality, sensor
    * jitter). The cheap "is this series even random" pre-screen
    * before fitting anything.
    *
    * One grouped lag/lead window pass (the O28 machinery — per-key
    * series, bounded by the observation window); ties produce NO
    * turning point (strict inequalities — the standard convention).
    * Counts are exact integers; E and z are one float chain each,
    * stabilized through DECIMAL(18,8). Keys with n < 3 emit zero
    * turns and a null z (the variance needs n ≥ 3).
    */
  def turningPoints(
      df: DataFrame,
      keyCol: String, orderCol: String, valueCol: String,
      roundDigits: Int = 4): DataFrame = {
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val w = Window.partitionBy(col("__k")).orderBy(col("__o"))
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(orderCol).as("__o"),
        col(valueCol).cast(dec6).as("__y"))
      .withColumn("__pv", lag(col("__y"), 1).over(w))
      .withColumn("__nx", lead(col("__y"), 1).over(w))
    val isTurn = (col("__pv") < col("__y") && col("__nx") < col("__y")) ||
      (col("__pv") > col("__y") && col("__nx") > col("__y"))
    val e = lit(2.0d) * (col("n_obs") - 2) / lit(3.0d)
    val v = (lit(16.0d) * col("n_obs") - 29) / lit(90.0d)
    rows.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_obs"),
        sum(when(col("__pv").isNotNull && col("__nx").isNotNull && isTurn,
          1L).otherwise(0L)).as("n_turning"))
      .select(col("__k").as(keyCol), col("n_obs"), col("n_turning"),
        round(when(col("n_obs") >= 3, e).cast(stable), roundDigits)
          .cast("double").as("expected"),
        round(when(col("n_obs") >= 3 && v > 0,
          (col("n_turning") - e) / sqrt(v)).cast(stable), roundDigits)
          .cast("double").as("z"))
  }

  /** X148 — maximum drawdown per key: the worst drop of a series from
    * its RUNNING PEAK (`max_t (runmax_t − y_t)`), plus the peak level
    * and the first date the worst drop is realized — the
    * collapse-severity metric (demand crash, engagement cliff,
    * equity-curve risk) that plain min/max cannot see because it is
    * ORDER-dependent.
    *
    * Entirely exact: values quantize through DECIMAL(18,2), the
    * running max is order-arithmetic on decimals (no float anywhere),
    * the argmax date rides a min(struct(−dd, date)) — one window pass
    * plus one grouped aggregate.
    */
  def maxDrawdown(
      df: DataFrame,
      keyCol: String, orderCol: String, valueCol: String): DataFrame = {
    val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val w = Window.partitionBy(col("__k")).orderBy(col("__o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(orderCol).as("__o"),
        col(valueCol).cast(dec2).as("__y"))
      .withColumn("__peak", max(col("__y")).over(w))
      .withColumn("__dd", col("__peak") - col("__y"))
      .withColumn("__mdd",
        max(col("__dd")).over(Window.partitionBy(col("__k"))))
    rows.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_obs"),
        max(col("__y")).cast("double").as("peak"),
        max(col("__dd")).cast("double").as("max_drawdown"),
        min(when(col("__dd") === col("__mdd"), col("__o")))
          .as("drawdown_at"))
      .select(col("__k").as(keyCol), col("n_obs"), col("peak"),
        col("max_drawdown"), col("drawdown_at"))
  }

  /** X149 — rolling EXACT median per key (`min_periods = window`,
    * pandas semantics): the robust rolling level every
    * outlier-tolerant smoother wants, with the median made
    * engine-exact the r12 way — the window's values are collected,
    * sorted, and interpolated IN DECIMAL ((a+b)·0.5 with a scale-1
    * decimal literal — exact), so no float quantile kernel exists on
    * either engine (rolling complement of
    * [[graft.operators.Profiling.groupedExactQuantiles]]; the Hampel
    * filter keeps its own MAD machinery).
    *
    * Scale: the per-row collected frame is `window` values — a
    * constant — so the extra memory per row is O(window), the same
    * contract as any ROWS-frame window aggregate.
    */
  def rollingExactMedian(
      df: DataFrame,
      keyCol: String, orderCol: String, valueCol: String,
      window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val half = lit(new java.math.BigDecimal("0.5"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__o"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(orderCol).as("__o"),
        col(valueCol).cast(dec2).as("__y"))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__win", sort_array(collect_list(col("__y")).over(w)))
    val mid = window / 2
    val med =
      if (window % 2 == 1) element_at(col("__win"), mid + 1)
      else (element_at(col("__win"), mid)
        + element_at(col("__win"), mid + 1)) * half
    rows.select(col("__k").as(keyCol), col("__o").as(orderCol),
      col("__y").cast("double").as(valueCol),
      when(col("__n") === window, med.cast("double"))
        .as("rolling_median"))
  }

  /** X150 — cumulative reach curve: per day, the NEW distinct users
    * (first-ever appearance) and the cumulative distinct-user count —
    * "how fast is total reach growing", the audience-accumulation
    * question a plain DAU series cannot answer. Exact without any
    * distinct-over-window: first-appearance day per user (one
    * user-cardinality aggregate), then new-per-day counts and one
    * running sum over the DAY-cardinality table.
    */
  def reachCurve(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val day = to_date(date_trunc("DAY", col(tsCol)))
    val firstDay = df.select(col(userCol).as("__u"), day.as("__d"))
      .groupBy(col("__u")).agg(min(col("__d")).as("__d0"))
    val perDay = firstDay.groupBy(col("__d0")).agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy(col("__d0"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay
      .select(col("__d0").as("day"), col("n_new"),
        sum(col("n_new")).over(w).as("cum_reach"))
  }

  /** Hurst exponent via rescaled-range analysis (Hurst 1951 /
    * Mandelbrot–Wallis 1969): chunk the series into full blocks of
    * each window size, compute the range of cumulative mean-deviations
    * over the block's population std (R/S), average per window size,
    * and fit `log(mean R/S) ~ H log(w)` by OLS over the window sizes.
    * H ≈ 0.5 = random walk, > 0.5 = persistent trend, < 0.5 =
    * mean-reverting — the long-memory read behind capacity planning
    * and anomaly baselines.
    *
    * Input: one row per time point (caller pre-aggregates). The
    * index order is (ts, value) — the value tie-break makes duplicate
    * timestamps DETERMINISTIC (r16 ADVICE): rows tied on both keys
    * are interchangeable, so block membership, R/S, and the fitted H
    * are identical across runs and engines. Shape: the series indexes
    * ONCE (a window over series length — the
    * day-cardinality-bounded pattern), fans out to the window-size
    * grid, and every window after that is partitioned per (w, block)
    * with ≤ max(windows) rows; the OLS runs on ≤ |windows| rows using
    * the ROUNDED per-w means, so both engines regress identical
    * inputs.
    */
  def hurstExponent(df: DataFrame, ts: Column, value: Column,
      windows: Seq[Int] = Seq(8, 16, 32, 64), roundDigits: Int = 6)
      : DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 2),
      s"window sizes must be >= 2: $windows")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val series = df.filter(ts.isNotNull && value.isNotNull)
      .select(ts.as("__t"), value.cast("double").as("__v"))
      .withColumn("__idx",
        row_number().over(Window.orderBy(col("__t"), col("__v")))
          .cast("long"))
    val fanned = series.select(col("__idx"), col("__v"),
      explode(array(windows.map(w => lit(w.toLong)): _*)).as("__w"))
      .withColumn("__blk", floor((col("__idx") - 1) / col("__w")))
    val blocks = fanned.groupBy(col("__w"), col("__blk"))
      .agg(count(lit(1)).as("__cnt"), sum(col("__v")).as("__sum"))
      .filter(col("__cnt") === col("__w"))
      .select(col("__w"), col("__blk"),
        (col("__sum") / col("__w").cast("double")).as("__mu"))
    val withDev = fanned.join(blocks, Seq("__w", "__blk"))
      .select(col("__w"), col("__blk"), col("__idx"),
        (col("__v") - col("__mu")).as("__dev"))
    val wcum = Window.partitionBy(col("__w"), col("__blk"))
      .orderBy(col("__idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rs = withDev.withColumn("__z", sum(col("__dev")).over(wcum))
      .groupBy(col("__w"), col("__blk"))
      .agg((max(col("__z")) - min(col("__z"))).as("__r"),
        sqrt(sum(col("__dev") * col("__dev"))
          / first(col("__w")).cast("double")).as("__sd"))
      .filter(col("__sd") > 0)
      .select(col("__w"), (col("__r") / col("__sd")).as("__rs"))
    val perW = rs.groupBy(col("__w"))
      .agg(count(lit(1)).as("blocks"),
        round((sum(col("__rs")) / count(lit(1))).cast(stable),
          roundDigits).cast("double").as("mean_rs"))
    // OLS over the <= |windows| rounded points: identical inputs in
    // both engines, so the slope agrees to well past roundDigits
    val pts = perW.filter(col("mean_rs") > 0)
      .select(log(col("__w").cast("double")).as("__lx"),
        log(col("mean_rs")).as("__ly"))
    val slope = pts.agg(count(lit(1)).as("__k"),
        sum(col("__lx")).as("__sx"), sum(col("__ly")).as("__sy"),
        sum(col("__lx") * col("__lx")).as("__sxx"),
        sum(col("__lx") * col("__ly")).as("__sxy"))
      .select(when(
        col("__k") * col("__sxx") - col("__sx") * col("__sx") > 0,
        (col("__k") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("__k") * col("__sxx") - col("__sx") * col("__sx")))
        .as("__h"))
    perW.crossJoin(broadcast(slope))
      .select(col("__w").as("w"), col("blocks"), col("mean_rs"),
        round(col("__h").cast(stable), roundDigits).cast("double")
          .as("hurst"))
      .orderBy("w")
  }
}
