package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forecasting-tier operators over per-key daily series — the demand-
  * analytics layer the reference's M5 domain implies but its pipeline
  * (pipeline.py) never builds: calendar gap repair, intermittent-demand
  * classification (Syntetos–Boylan), the competition's own scaled-error
  * metric (RMSSE/WRMSSE shape), and per-series linear trend.
  *
  * All operators take a DAILY series frame `(key, day, value)` — one
  * row per key per observed day (build it with one decimal-exact
  * `groupBy(key, to_date(ts)).agg(sum(...))` so the series itself is
  * bit-deterministic across engines) — and are single-shuffle: one
  * exchange on the series key, then per-key sorted evaluation. At
  * 100 TB the key property is that NO operator here materializes a
  * dense key×calendar cross join up front: gap filling explodes only
  * each row's own gap run (`sequence(day, next-1)`), so output size is
  * the repaired series itself, and every aggregate is map-side
  * combinable over series-key cardinality.
  */
object Forecast {

  /** X74 — calendar gap-fill + forward-fill: densify each key's series
    * to one row per day in `[min(day), max(day)]`, carrying the last
    * observed value through gaps (`is_gap` marks imputed rows).
    *
    * Shape: ONE window pass (lead over the key's day order) and ONE
    * generator — each row explodes `sequence(day, next_day - 1)`, so a
    * gap's cost lands on the row that opens it and the plan has no
    * spine×series join at all (the naive form — per-key min/max agg,
    * sequence-explode a spine, left join the series back, then a
    * SECOND window for the fill — shuffles twice and joins once for
    * the same answer). Forward-fill is free: the opening row's value
    * IS the carried value for every day it generates.
    */
  def gapFillForwardFill(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    daily
      .withColumn("__next", lead(col(dayCol), 1).over(w))
      .withColumn("__day",
        explode(sequence(col(dayCol),
          coalesce(date_sub(col("__next"), 1), col(dayCol)))))
      .select(
        col(keyCol),
        col("__day").as(dayCol),
        col(valueCol),
        (col("__day") =!= col(dayCol)).cast("int").as("is_gap"))
  }

  /** X75 — intermittent-demand classification (Syntetos–Boylan 2005):
    * per key, ADI (average inter-demand interval = span-days /
    * demand-days) and CV² (squared coefficient of variation of the
    * nonzero demand sizes), then the standard quadrant:
    * smooth (ADI < 1.32, CV² < 0.49), intermittent (ADI ≥ 1.32,
    * CV² < 0.49), erratic (ADI < 1.32, CV² ≥ 0.49), else lumpy.
    * The classifier that decides per-series whether Croston-style
    * models are even applicable — the M5 corpus is famously dominated
    * by intermittent/lumpy series.
    *
    * One map-side-combinable aggregate per key (count/min/max/avg/
    * var_samp); absent days ARE the zero-demand days, so the sparse
    * series needs no densification. Both ratios are rounded to 4 dp
    * BEFORE the threshold compare so the class label is a function of
    * the engine-portable rounded values, not of last-bit float noise.
    * Keys with a single demand day have no sample variance → class
    * "n/a".
    */
  def demandClasses(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val agg = daily.groupBy(col(keyCol)).agg(
      count(lit(1)).as("__nz"),
      (datediff(max(col(dayCol)), min(col(dayCol))) + 1).as("__span"),
      avg(v).as("__mean"),
      var_samp(v).as("__var"))
    val adi = round(col("__span").cast("double") / col("__nz"), 4)
    val cv2 = round(col("__var") / (col("__mean") * col("__mean")), 4)
    agg.select(
      col(keyCol),
      col("__nz").as("demand_days"),
      col("__span").cast("bigint").as("span_days"),
      adi.as("adi"),
      cv2.as("cv2"),
      when(cv2.isNull, "n/a")
        .when(adi < 1.32 && cv2 < 0.49, "smooth")
        .when(adi >= 1.32 && cv2 < 0.49, "intermittent")
        .when(adi < 1.32, "erratic")
        .otherwise("lumpy").as("demand_class"))
  }

  /** X76 — per-series scaled error (the M5 competition's RMSSE, with
    * the WRMSSE weight): zero-fill each key's series over
    * `[first(key day), global max day]`, split at `splitDay =
    * global max − horizon`, forecast every eval day with the flat
    * naive (the value AT splitDay), and report
    * `rmsse = sqrt(mean_eval((y−ŷ)²) / mean_train((y_t−y_{t−1})²))`
    * plus `weight` = the key's share of total value over the last 28
    * train days. sum(weight·rmsse) over the output IS the WRMSSE.
    *
    * Scale shape: the zero-fill reuses [[gapFillForwardFill]]'s
    * no-join explode (each row generates its own gap run as zeros;
    * the key's LAST row extends to the global max so eval days a key
    * never touched exist as zero demand). The global max day and the
    * weight denominator are 1-row broadcast scalars; everything else
    * is one window pass (the train lag) + one aggregate per key.
    * Keys first observed after splitDay have no train window → null
    * rmsse (reported, not dropped — at M5 scale those are the
    * new-product series the metric excludes).
    */
  def scaledError(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String,
      horizon: Int = 7,
      weightDays: Int = 28,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
    : DataFrame = {
    require(horizon > 0 && weightDays > 0,
      s"horizon/weightDays must be positive, got $horizon/$weightDays")
    // 1-row global bounds broadcast: split day + eval end
    val bounds = daily.agg(max(col(dayCol)).as("__gmax"))
      .select(col("__gmax"), date_sub(col("__gmax"), horizon).as("__split"))
    val withBounds = daily.crossJoin(broadcast(bounds))
    // zero-filled dense series: each row explodes its own gap run;
    // the last row extends through the global max (eval coverage)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val dense = withBounds
      .withColumn("__next", lead(col(dayCol), 1).over(w))
      .withColumn("__day",
        explode(sequence(col(dayCol),
          coalesce(date_sub(col("__next"), 1), col("__gmax")))))
      .select(col(keyCol), col("__split"), col("__day"),
        when(col("__day") === col(dayCol), col(valueCol).cast("double"))
          .otherwise(lit(0.0)).as("__y"))
    // flat-naive forecast = the zero-filled value AT the split day,
    // one unordered whole-partition window (no second shuffle: same key)
    val wAll = Window.partitionBy(col(keyCol))
    val scored = dense
      .withColumn("__fc",
        coalesce(max(when(col("__day") === col("__split"), col("__y")))
          .over(wAll), lit(0.0)))
      .withColumn("__prev", lag(col("__y"), 1).over(w.orderBy(col("__day"))))
    val isTrain = col("__day") <= col("__split")
    val isEval = col("__day") > col("__split")
    // perKey is series-cardinality (tiny next to the dense series);
    // persist it so the 1-row weight denominator doesn't re-run the
    // whole dense pipeline a second time for its one aggregate
    val perKey = scope.persist(scored.groupBy(col(keyCol)).agg(
      avg(when(isTrain,
        (col("__y") - col("__prev")) * (col("__y") - col("__prev"))))
        .as("__scale"),
      avg(when(isEval,
        (col("__y") - col("__fc")) * (col("__y") - col("__fc"))))
        .as("__mse"),
      sum(when(isTrain && col("__day") > date_sub(col("__split"), weightDays),
        col("__y"))).as("__wsum")))
    val total = perKey.agg(sum(col("__wsum")).as("__wtotal"))
    perKey.crossJoin(broadcast(total)).select(
      col(keyCol),
      round(when(col("__scale") > 0, sqrt(col("__mse") / col("__scale"))), 4)
        .as("rmsse"),
      round(col("__wsum") / col("__wtotal"), 6).as("weight"))
  }

  /** X83 — Croston's method + the Syntetos–Boylan approximation (SBA):
    * THE forecaster for the intermittent series X75 flags. Demand
    * sizes and inter-demand intervals get separate simple exponential
    * smoothing; the rate forecast is `ẑ/â` (Croston) and
    * `(1−α/2)·ẑ/â` (SBA, the bias-corrected form M5 practitioners
    * default to).
    *
    * SES is a recursion, but its closed form is a weighted sum —
    * `s_n = Σ_t w_t·y_t` with `w_t = α(1−α)^{n−t}` (and the full
    * remaining mass `(1−α)^{n−1}` on y₁) — so the whole fit is ONE
    * ranked-window pass + ONE map-side-combinable aggregate per key:
    * no recursion, no UDAF, no per-key iteration. With the default
    * α = 0.5 every weight is a power of two, so weights and
    * weight·value products are IEEE-exact on any engine — the
    * portability trick that lets an exponential fit hash-match
    * bit-for-bit.
    *
    * Sparse input semantics: only demand days enter (the zero days
    * ARE the intervals). Keys with a single demand day have no
    * interval series → null â and null forecasts.
    */
  def crostonForecast(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val wAll = Window.partitionBy(col(keyCol))
    val ranked = daily
      .withColumn("__z", col(valueCol).cast("double"))
      .withColumn("__rz", row_number().over(w))
      .withColumn("__nz", count(lit(1)).over(wAll))
      .withColumn("__iv",
        datediff(col(dayCol), lag(col(dayCol), 1).over(w)).cast("double"))
    // SES weight for position r of n: α(1-α)^(n-r), with position 1
    // absorbing the full remaining tail (1-α)^(n-1)
    def sesWeight(r: Column, n: Column): Column =
      when(r === 1, pow(lit(1 - alpha), n - 1))
        .otherwise(lit(alpha) * pow(lit(1 - alpha), n - r))
    // the interval series is one shorter and starts at the 2nd row
    val zHat = sum(sesWeight(col("__rz"), col("__nz")) * col("__z"))
    val aHat = sum(when(col("__rz") > 1,
      sesWeight(col("__rz") - 1, col("__nz") - 1) * col("__iv")))
    ranked.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_demands"),
      round(zHat, 4).as("z_hat"),
      round(aHat, 4).as("a_hat"),
      round(zHat / aHat, 4).as("croston"),
      round(lit(1 - alpha / 2) * zHat / aHat, 4).as("sba"))
  }

  /** X84 — backtest model selection: hold out the last `horizon` days
    * (zero-filled calendar, X76's construction), score three
    * forecasters per series — flat naive (value at the split day),
    * seasonal-naive-7 (value 7 days earlier), train mean — by eval
    * MAE, and pick the per-series winner (ties break in that fixed
    * order). The "which model does each of my million series want"
    * sweep, as one plan: the dense explode, two window passes
    * (lag-7 + per-key train mean/naive), one aggregate per key.
    * MAEs are rounded BEFORE the argmin so the winner is a function
    * of engine-portable values.
    */
  def backtestSelect(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String,
      horizon: Int = 7): DataFrame = {
    require(horizon > 0, s"horizon must be positive, got $horizon")
    val bounds = daily.agg(max(col(dayCol)).as("__gmax"))
      .select(col("__gmax"), date_sub(col("__gmax"), horizon).as("__split"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val dense = daily.crossJoin(broadcast(bounds))
      .withColumn("__next", lead(col(dayCol), 1).over(w))
      .withColumn("__day",
        explode(sequence(col(dayCol),
          coalesce(date_sub(col("__next"), 1), col("__gmax")))))
      .select(col(keyCol), col("__split"), col("__day"),
        when(col("__day") === col(dayCol), col(valueCol).cast("double"))
          .otherwise(lit(0.0)).as("__y"))
    val wDay = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
    val wAll = Window.partitionBy(col(keyCol))
    val isTrain = col("__day") <= col("__split")
    val scored = dense
      .withColumn("__naive",
        coalesce(max(when(col("__day") === col("__split"), col("__y")))
          .over(wAll), lit(0.0)))
      .withColumn("__snaive", coalesce(lag(col("__y"), 7).over(wDay), lit(0.0)))
      .withColumn("__mean", coalesce(avg(when(isTrain, col("__y"))).over(wAll),
        lit(0.0)))
    val isEval = col("__day") > col("__split")
    val agg = scored.groupBy(col(keyCol)).agg(
      round(avg(when(isEval, abs(col("__y") - col("__naive")))), 4)
        .as("mae_naive"),
      round(avg(when(isEval, abs(col("__y") - col("__snaive")))), 4)
        .as("mae_snaive7"),
      round(avg(when(isEval, abs(col("__y") - col("__mean")))), 4)
        .as("mae_mean"))
    val best = least(col("mae_naive"), col("mae_snaive7"), col("mae_mean"))
    agg.withColumn("best_model",
      when(col("mae_naive") === best, "naive")
        .when(col("mae_snaive7") === best, "snaive7")
        .otherwise("mean"))
  }

  /** X76b — WRMSSE against CALLER-provided forecasts (the M5
    * competition's actual leaderboard metric; [[scaledError]] is the
    * naive-forecast special case). Per key:
    * `rmsse = sqrt(mean_eval((actual−forecast)²) /
    * mean_train((y_t−y_{t−1})²))` with the eval window = the `horizon`
    * days after the train max, actuals and forecasts zero-filled over
    * it, and `weight` = the key's value share of the last
    * `weightDays` train days. `sum(weight·rmsse)` over the output IS
    * the WRMSSE (keys with no train history score null and are
    * excluded, M5's new-product rule — see [[wrmsseTotal]]).
    *
    * Scale shape: the train side reuses the explode-own-gap zero-fill
    * (one window pass); the eval side is a keys×horizon spine — the
    * size of the forecast table itself, not a data-sized blow-up —
    * with two co-partitioned left joins. The per-key frame is
    * persisted so the weight denominator is one cheap agg.
    */
  def wrmsse(
      train: DataFrame,
      actuals: DataFrame,
      forecasts: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String,
      fcCol: String,
      horizon: Int,
      weightDays: Int = 28,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
    : DataFrame = {
    require(horizon > 0, s"horizon must be positive, got $horizon")
    val bounds = train.agg(max(col(dayCol)).as("__tmax"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    // zero-filled train series -> per-key naive scale + weight sum
    val trainDense = train.crossJoin(broadcast(bounds))
      .withColumn("__next", lead(col(dayCol), 1).over(w))
      .withColumn("__day",
        explode(sequence(col(dayCol),
          coalesce(date_sub(col("__next"), 1), col("__tmax")))))
      .select(col(keyCol), col("__tmax"), col("__day"),
        when(col("__day") === col(dayCol), col(valueCol).cast("double"))
          .otherwise(lit(0.0)).as("__y"))
      .withColumn("__prev", lag(col("__y"), 1).over(w.orderBy(col("__day"))))
    val perKeyTrain = scope.persist(trainDense.groupBy(col(keyCol)).agg(
      avg((col("__y") - col("__prev")) * (col("__y") - col("__prev")))
        .as("__scale"),
      sum(when(col("__day") > date_sub(col("__tmax"), weightDays),
        col("__y"))).as("__wsum")))
    // eval spine: every train key × the horizon days after train max
    val spine = train.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .withColumn("__day", explode(sequence(
        date_add(col("__tmax"), 1), date_add(col("__tmax"), horizon))))
      .select(col(keyCol), col("__day"))
    val act = actuals.select(col(keyCol), col(dayCol).as("__day"),
      col(valueCol).cast("double").as("__a"))
    val fc = forecasts.select(col(keyCol), col(dayCol).as("__day"),
      col(fcCol).cast("double").as("__f"))
    val perKeyEval = spine
      .join(act, Seq(keyCol, "__day"), "left")
      .join(fc, Seq(keyCol, "__day"), "left")
      .groupBy(col(keyCol))
      .agg(avg((coalesce(col("__a"), lit(0.0)) - coalesce(col("__f"), lit(0.0)))
        * (coalesce(col("__a"), lit(0.0)) - coalesce(col("__f"), lit(0.0))))
        .as("__mse"))
    val total = perKeyTrain.agg(sum(col("__wsum")).as("__wtotal"))
    perKeyTrain.join(perKeyEval, Seq(keyCol))
      .crossJoin(broadcast(total))
      .select(
        col(keyCol),
        round(when(col("__scale") > 0, sqrt(col("__mse") / col("__scale"))), 4)
          .as("rmsse"),
        round(col("__wsum") / col("__wtotal"), 6).as("weight"))
  }

  /** The single WRMSSE number: `Σ weight·rmsse` over [[wrmsse]]'s
    * output, null-scale series excluded with their weight
    * renormalized over the scored set (the M5 accounting). */
  def wrmsseTotal(perSeries: DataFrame): DataFrame =
    perSeries.filter(col("rmsse").isNotNull)
      .agg(
        round(sum(col("weight") * col("rmsse")) / sum(col("weight")), 4)
          .as("wrmsse"),
        count(lit(1)).as("n_series"))

  /** X85 — per-series autocorrelation at the given lags over the
    * zero-filled daily calendar (each key's own [min, max] span):
    * `acf_k = corr(y_t, y_{t−k})` — the seasonality detector that
    * tells [[backtestSelect]]'s seasonal-naive arm when it is worth
    * fielding (weekly demand shows acf_7 ≫ acf_1). Built from the
    * same explode-own-gap densification as [[gapFillForwardFill]],
    * one lag window per requested lag, and one `corr` aggregate per
    * key — `corr`'s single-pass moments are engine-portable at 4 dp
    * (the x97 precedent). Constant series (zero variance) yield null.
    */
  def autocorrelation(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String,
      lags: Seq[Int] = Seq(1, 7)): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0), s"lags must be positive: $lags")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val dense = daily
      .withColumn("__next", lead(col(dayCol), 1).over(w))
      .withColumn("__day",
        explode(sequence(col(dayCol),
          coalesce(date_sub(col("__next"), 1), col(dayCol)))))
      .select(col(keyCol), col("__day"),
        when(col("__day") === col(dayCol), col(valueCol).cast("double"))
          .otherwise(lit(0.0)).as("__y"))
    val wDay = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
    val lagged = lags.foldLeft(dense) { (df, k) =>
      df.withColumn(s"__l$k", lag(col("__y"), k).over(wDay))
    }
    lagged.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_days"),
      lags.map(k => round(corr(col("__y"), col(s"__l$k")), 4).as(s"acf_$k")): _*)
  }

  /** Classical additive seasonal decomposition over each key's
    * zero-filled daily series: `y = trend + seasonal + resid` with
    * trend a CENTERED 7-day moving average (full-window-only — the
    * first/last 3 days have no trend, pandas-style edge NaN),
    * seasonal the per-weekday mean of the detrended series, and the
    * residual what remains — the pre-forecast diagnostic that says
    * whether [[backtestSelect]]'s seasonal arm has anything to win.
    *
    * Shape: the gap-explode densify (each row generates only its own
    * gap run — no calendar-spine join), ONE sorted window pass for the
    * trend, and the seasonal index as a second window partitioned by
    * (key, weekday) — a window, not an aggregate-plus-join-back, so
    * the densified/trended relation is computed ONCE and never
    * self-joined (the join form re-ran the whole upstream subtree on
    * both sides). Portability: trend ROUNDs to 6 dp before
    * detrending, so every downstream difference starts from
    * engine-identical doubles; the weekday convention is Mon=0 (the
    * t18 parity).
    */
  def seasonalDecompose(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String,
      roundDigits: Int = 4): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val dense = daily
      .withColumn("__next", lead(col(dayCol), 1).over(w))
      .withColumn("__day",
        explode(sequence(col(dayCol),
          coalesce(date_sub(col("__next"), 1), col(dayCol)))))
      .select(col(keyCol), col("__day"),
        when(col("__day") === col(dayCol), col(valueCol).cast("double"))
          .otherwise(lit(0.0)).as("__y"))
    val wTrend = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
      .rowsBetween(-3, 3)
    val trended = dense.withColumn("__trend",
        when(count(lit(1)).over(wTrend) === 7,
          round(avg(col("__y")).over(wTrend), 6)))
      .withColumn("__dow", weekday(col("__day")))
    val wSeason = Window.partitionBy(col(keyCol), col("__dow"))
    trended
      .withColumn("__seasonal",
        round(avg(col("__y") - col("__trend")).over(wSeason), 6))
      .select(col(keyCol), col("__day").as("day"),
        round(col("__y"), 2).as("y"),
        round(col("__trend"), roundDigits).as("trend"),
        round(col("__seasonal"), roundDigits).as("seasonal"),
        round(col("__y") - col("__trend") - col("__seasonal"), roundDigits)
          .as("resid"))
  }

  /** X174 — seasonal/trend STRENGTH per key (Hyndman & Athanasopoulos,
    * FPP: `F_s = max(0, 1 − Var(resid)/Var(seasonal+resid))`,
    * `F_t = max(0, 1 − Var(resid)/Var(trend+resid))`) — the one-number
    * summaries of [[seasonalDecompose]]'s parts that rank thousands of
    * series by "how seasonal / how trending", the triage before
    * choosing [[backtestSelect]] arms or
    * [[graft.operators.TimeSeries.holtWintersForecast]] parameters.
    *
    * Portability: the decomposition's components are already rounded
    * to 4 dp; they quantize to DECIMAL(12,4) (exact), the component
    * sums and squares accumulate exactly in DECIMAL, each variance
    * assembles as ONE left-associated double expression, and the
    * strength ratio rounds through DECIMAL(18,8). Edge rows without a
    * trend (the centered window's first/last 3 days) are excluded —
    * they have no decomposition to measure. Groups need ≥ 2 trended
    * days; a zero-variance denominator yields null strength.
    */
  def seasonalStrength(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String,
      roundDigits: Int = 4): DataFrame = {
    val dec4 = org.apache.spark.sql.types.DecimalType(12, 4)
    val s4 = org.apache.spark.sql.types.DecimalType(18, 4)
    val q8 = org.apache.spark.sql.types.DecimalType(24, 8)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val parts = seasonalDecompose(daily, keyCol, dayCol, valueCol)
      .filter(col("trend").isNotNull)
      .select(col(keyCol),
        col("resid").cast(dec4).as("__r"),
        (col("seasonal").cast(dec4) + col("resid").cast(dec4)).as("__sr"),
        (col("trend").cast(dec4) + col("resid").cast(dec4)).as("__tr"))
    def moments(c: String) = Seq(
      sum(col(c)).cast(s4).as(s"__s$c"),
      sum((col(c) * col(c)).cast(q8)).cast(q8).as(s"__q$c"))
    val m = parts.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        (moments("__r") ++ moments("__sr") ++ moments("__tr")): _*)
      .filter(col("n_days") >= 2)
    def variance(c: String) =
      (col(s"__q$c").cast("double")
        - col(s"__s$c").cast("double") * col(s"__s$c").cast("double")
          / col("n_days")) / (col("n_days") - 1)
    def strength(denom: String) = {
      val v = variance(denom)
      when(v > 0, round(greatest(lit(0.0),
        lit(1.0) - variance("__r") / v).cast(stable), roundDigits)
        .cast("double"))
    }
    m.select(col(keyCol), col("n_days"),
      strength("__sr").as("strength_seasonal"),
      strength("__tr").as("strength_trend"))
  }

  /** Single changepoint scan (the first step of binary segmentation /
    * the CUSUM-style scan statistic): over each key's zero-filled
    * daily series, find the split `t` maximizing
    * `|mean(y₁..t) − mean(y_{t+1}..n)| · sqrt(t·(n−t)/n)` — the
    * two-sample z numerator, largest where the level shift is. Splits
    * leaving fewer than `minSeg` days on a side are excluded (a
    * 1-day "segment" maximizes noise, not signal).
    *
    * One sorted window pass per key builds the prefix sums; every
    * prefix sum runs in DECIMAL so left/right means divide EXACT
    * numerators (no float accumulation order to disagree on), and the
    * argmax ranks on the ROUNDED statistic with the earliest day
    * winning ties. Cost: one key shuffle, windows over per-key
    * cardinality, k rows out.
    *
    * Rounding contract: `exact/t` means frequently TERMINATE at the
    * round digit + 1 (e.g. 190.92125), where Spark's round (decimal
    * string) and a float-math round disagree by one ulp of output.
    * Every rounded value therefore passes through DECIMAL(18,8) first
    * — both engines correctly-round the double to 8 dp, then round the
    * exact decimal HALF_UP — and the argmax ranks on that stabilized
    * value.
    */
  def changepointScan(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String,
      minSeg: Int = 7,
      roundDigits: Int = 4): DataFrame = {
    require(minSeg >= 1, s"minSeg must be >= 1, got $minSeg")
    val dec286 = org.apache.spark.sql.types.DecimalType(28, 6)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val dense = daily
      .withColumn("__next", lead(col(dayCol), 1).over(w))
      .withColumn("__day",
        explode(sequence(col(dayCol),
          coalesce(date_sub(col("__next"), 1), col(dayCol)))))
      .select(col(keyCol), col("__day"),
        when(col("__day") === col(dayCol), col(valueCol).cast(dec286))
          .otherwise(lit(0).cast(dec286)).as("__y"))
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(keyCol))
    val scanned = dense.select(col(keyCol), col("__day"),
        sum(col("__y")).over(wCum).as("__ca"),
        count(lit(1)).over(wCum).as("__t"),
        sum(col("__y")).over(wAll).as("__s"),
        count(lit(1)).over(wAll).as("__n"))
      .filter(col("__t") >= minSeg && col("__t") <= col("__n") - minSeg)
    val meanL = col("__ca").cast("double") / col("__t")
    val meanR = (col("__s") - col("__ca")).cast("double")
      .divide(col("__n") - col("__t"))
    val stat = abs(meanL - meanR) *
      sqrt((col("__t") * (col("__n") - col("__t"))).cast("double")
        / col("__n"))
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    def r(c: Column): Column =
      round(c.cast(stable), roundDigits).cast("double")
    val ranked = scanned.select(col(keyCol), col("__day"),
        r(meanL).as("mean_left"),
        r(meanR).as("mean_right"),
        r(stat).as("stat"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col("stat").desc, col("__day"))))
    ranked.filter(col("__rn") === 1)
      .select(col(keyCol), col("__day").as("split_day"),
        col("mean_left"), col("mean_right"), col("stat"))
  }

  /** X78 — per-series linear trend: OLS slope / intercept / R² of the
    * daily value against the day offset from the corpus' FIRST day,
    * via the SQL-standard `regr_*` aggregates (single-pass moment
    * sums, map-side combinable — the portable way to ask "which
    * series are growing"). The origin is a 1-row broadcast scalar;
    * centering x there keeps the intercept at the magnitude of the
    * values — an epoch-day x (~20 000) would amplify the slope's
    * last-bit float noise by 2e4 into the intercept and break
    * cross-engine agreement at any useful rounding.
    * Sparse semantics: only observed days enter the fit (absent days
    * are not zero observations here — trend over transactions, not
    * demand). Constant-x or single-point series yield null slope/R².
    */
  def linearTrend(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String): DataFrame = {
    val origin = daily.agg(min(col(dayCol)).as("__origin"))
    val x = datediff(col(dayCol), col("__origin")).cast("double")
    val y = col(valueCol).cast("double")
    daily.crossJoin(broadcast(origin)).groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_days"),
      round(regr_slope(y, x), 6).as("slope"),
      round(regr_intercept(y, x), 6).as("intercept"),
      round(regr_r2(y, x), 6).as("r2"))
  }

  /** X142 — hierarchical forecast reconciliation, top-down vs
    * bottom-up: for a 7-day horizon past the corpus max date, the
    * BOTTOM-UP forecast is each series' seasonal-naive-7 (last
    * week's value, zero when absent), and the TOP-DOWN forecast
    * distributes the AGGREGATE series' seasonal-naive total by each
    * series' historical share — the M5-native question ("forecast the
    * store, allocate to items") in its two canonical answers. The
    * two COHERENTLY sum to different totals exactly when the item mix
    * is shifting — the gap is the signal.
    *
    * Shape: one per-key lookup join on (key, target−7), one 1-row
    * aggregate-series lookup, one share aggregate broadcast back —
    * all exact DECIMAL(18,2) sums; shares and the top-down product
    * stabilize through DECIMAL(18,8).
    */
  def reconcileTopDown(
      df: DataFrame,
      keyCol: String,
      dateCol: String,
      valueCol: String,
      horizon: Int = 7,
      roundDigits: Int = 4): DataFrame = {
    require(horizon >= 1 && horizon <= 7,
      s"snaive-7 supports horizon 1..7, got $horizon")
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val obs = df.select(col(keyCol).as("__k"), col(dateCol).as("__d"),
      col(valueCol).cast(dec).as("__v"))
    val gmax = obs.agg(max(col("__d")).as("__dmax"))
    val keys = obs.select(col("__k")).distinct()
    val grid = keys.crossJoin(broadcast(gmax))
      .select(col("__k"), col("__dmax"),
        explode(sequence(lit(1), lit(horizon))).as("h_day"))
      .select(col("__k"), col("h_day"),
        date_add(col("__dmax"), col("h_day")).as("__target"),
        date_add(col("__dmax"), col("h_day") - 7).as("__lag7"))
    val bottom = grid.join(
      obs.select(col("__k"), col("__d").as("__lag7"),
        col("__v").as("__bv")),
      Seq("__k", "__lag7"), "left")
    val aggDay = obs.groupBy(col("__d")).agg(sum(col("__v")).as("__tot"))
    val totalFc = bottom
      .join(aggDay.select(col("__d").as("__lag7"),
        col("__tot")), Seq("__lag7"), "left")
    val shares = obs.groupBy(col("__k")).agg(sum(col("__v")).as("__ks"))
      .crossJoin(broadcast(obs.agg(sum(col("__v")).as("__gs"))))
      .select(col("__k"),
        round((col("__ks").cast("double") / col("__gs").cast("double"))
          .cast(stable), 8).as("__share"))
    totalFc.join(broadcast(shares), Seq("__k"))
      .select(col("__k").as(keyCol), col("h_day").cast("bigint").as("h_day"),
        round(coalesce(col("__bv").cast("double"), lit(0.0d)), 2)
          .as("bottom_up"),
        round((coalesce(col("__tot").cast("double"), lit(0.0d))
          * col("__share").cast("double")).cast(stable), roundDigits)
          .cast("double").as("top_down"))
  }

  /** X138 — longest zero-run per series over the DENSIFIED daily
    * grid: the stockout/blackout detector ("this SKU showed zero
    * demand for 23 straight days — that is unavailability, not
    * demand", the signal that corrupts naive forecasts and that the
    * M5 literature masks out). Gaps between observations count as
    * zeros — exactly what the gap-explode densify produces.
    *
    * Gaps-and-islands in one window pass over the dense series (run
    * id = running count of nonzero days), one per-run aggregate, one
    * per-key max — all shuffles on the key. Returns zero-run length 0
    * for a series with no zero days.
    */
  def longestZeroRun(
      df: DataFrame,
      keyCol: String,
      dateCol: String,
      valueCol: String): DataFrame = {
    val dense = gapFillZero(df, keyCol, dateCol, valueCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = dense
      .withColumn("__grp",
        sum((col("__v") =!= 0.0d).cast("long")).over(w))
      .filter(col("__v") === 0.0d)
      .groupBy(col(keyCol), col("__grp"))
      .agg(count(lit(1)).as("__len"), min(col("__day")).as("__start"))
    val longest = runs.groupBy(col(keyCol))
      .agg(max(struct(col("__len"), col("__start"))).as("__best"))
      .select(col(keyCol),
        col("__best").getField("__len").as("zero_run_days"),
        col("__best").getField("__start").as("run_start"))
    dense.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum((col("__v") === 0.0d).cast("long")).as("n_zero_days"))
      .join(longest, Seq(keyCol), "left")
      .select(col(keyCol), col("n_days"), col("n_zero_days"),
        coalesce(col("zero_run_days"), lit(0L)).as("zero_run_days"),
        col("run_start"))
  }

  /** [[longestZeroRun]]'s densify: each observation explodes its own
    * gap run to the next observation as zero days (the
    * gapFillForwardFill shape with a zero fill instead of a carry). */
  private def gapFillZero(
      df: DataFrame, keyCol: String, dateCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__d0"))
    df.select(col(keyCol), col(dateCol).as("__d0"),
        col(valueCol).cast("double").as("__obs"))
      .withColumn("__nxt", lead(col("__d0"), 1).over(w))
      .select(col(keyCol), col("__d0"), col("__obs"),
        explode(sequence(lit(0),
          when(col("__nxt").isNotNull,
            datediff(col("__nxt"), col("__d0")) - 1).otherwise(lit(0))))
          .as("__off"))
      .select(col(keyCol),
        date_add(col("__d0"), col("__off")).as("__day"),
        when(col("__off") === 0, col("__obs")).otherwise(lit(0.0d))
          .as("__v"))
  }

  /** X133 — two-regressor OLS per series, closed form: fit
    * `y = b0 + b1·day + b2·is_weekend` per key — the minimal
    * trend-plus-seasonality decomposition as two interpretable
    * coefficients (daily drift and weekend lift), the multivariate
    * step past [[linearTrend]]'s single slope. Solved by Cramer's
    * rule on the 3×3 normal equations — NO iterative fitting, no ML
    * library, one aggregate.
    *
    * Shape: one map-side-combinable moment aggregate per key (nine
    * sums), coefficients assembled per key from those scalars.
    * Portability: day centers on the broadcast corpus min (the
    * linearTrend ulp-amplification fix), every moment sums in
    * DECIMAL(28,6) (exact — x1 is an integer, x2 a 0/1 flag, y
    * quantized at cast), and the determinants expand in ONE fixed
    * association over the exact operands, stabilized through
    * DECIMAL(18,8). A singular system (a key with no weekend rows, or
    * fewer rows than regressors) yields null coefficients.
    */
  def olsTrendWeekend(
      df: DataFrame,
      keyCol: String,
      dateCol: String,
      valueCol: String,
      roundDigits: Int = 4): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val gmin = df.agg(min(col(dateCol)).as("__d0"))
    val rows = df.crossJoin(broadcast(gmin)).select(
      col(keyCol).as("__k"),
      datediff(col(dateCol), col("__d0")).cast("double").as("__x1"),
      weekday(col(dateCol)).isin(5, 6).cast("int").cast("double")
        .as("__x2"),
      col(valueCol).cast("double").as("__y"))
    val m = rows.groupBy(col("__k")).agg(
      count(lit(1)).as("__n"),
      sum(col("__x1").cast(dec)).as("__s1"),
      sum(col("__x2").cast(dec)).as("__s2"),
      sum(col("__y").cast(dec)).as("__sy"),
      sum((col("__x1") * col("__x1")).cast(dec)).as("__s11"),
      sum((col("__x2") * col("__x2")).cast(dec)).as("__s22"),
      sum((col("__x1") * col("__x2")).cast(dec)).as("__s12"),
      sum((col("__x1") * col("__y")).cast(dec)).as("__s1y"),
      sum((col("__x2") * col("__y")).cast(dec)).as("__s2y"))
    def d(c: String): Column = col(c).cast("double")
    val n = col("__n").cast("double")
    def det3(a: Column, b: Column, c: Column,
        dd: Column, e: Column, f: Column,
        g: Column, h: Column, i: Column): Column =
      a * (e * i - f * h) - b * (dd * i - f * g) + c * (dd * h - e * g)
    val det = det3(n, d("__s1"), d("__s2"),
      d("__s1"), d("__s11"), d("__s12"),
      d("__s2"), d("__s12"), d("__s22"))
    val det0 = det3(d("__sy"), d("__s1"), d("__s2"),
      d("__s1y"), d("__s11"), d("__s12"),
      d("__s2y"), d("__s12"), d("__s22"))
    val det1 = det3(n, d("__sy"), d("__s2"),
      d("__s1"), d("__s1y"), d("__s12"),
      d("__s2"), d("__s2y"), d("__s22"))
    val det2 = det3(n, d("__s1"), d("__sy"),
      d("__s1"), d("__s11"), d("__s1y"),
      d("__s2"), d("__s12"), d("__s2y"))
    val ok = col("__n") >= 3 && abs(det) > 1e-6
    def r(c: Column): Column =
      round(c.cast(stable), roundDigits).cast("double")
    m.select(col("__k").as(keyCol), col("__n").as("n_days"),
      r(when(ok, det0 / det)).as("b0"),
      r(when(ok, det1 / det)).as("b1_day"),
      r(when(ok, det2 / det)).as("b2_weekend"))
  }

  /** X123 — Theil–Sen robust trend per series: the MEDIAN of all
    * pairwise slopes `(y_j − y_i)/(t_j − t_i)` — breakdown point
    * ~29%, so a promo spike or stockout week that drags least-squares
    * ([[linearTrend]]) around leaves this estimate standing. The
    * robust screen for "is this SKU actually growing".
    *
    * Shape: a per-key self-join emits `C(n_days, 2)` pairs — bounded
    * by the OBSERVATION WINDOW in days squared (≤ 66k pairs/key for a
    * year of dailies), never by row count; the per-key median is one
    * grouped exact percentile over those pairs. For multi-year windows
    * cap the span upstream or switch to the repeated-median variant.
    * Slopes ROUND through DECIMAL(18,8) to 6 dp, then the per-key
    * median comes from [[Profiling.groupedExactQuantiles]] — exact
    * rank-arithmetic decimal interpolation, no float quantile kernel
    * (the r12 migration; the old `percentile` parity was
    * engine-version-sensitive). Keys with a single observed day have
    * no pairs and no row.
    */
  /** X157 — newsvendor order point: per key, the EXACT critical-ratio
    * quantile of per-period demand (`q = Cu/(Cu+Co)`, the classic
    * optimal stocking level under under-/over-stock costs) plus the
    * mean and the implied safety stock — the inventory question the
    * whole forecasting tier feeds. The quantile rides
    * [[Profiling.groupedExactQuantiles]] (rank-arithmetic decimal, the
    * r12 engine-version-proof path) — this operator is its
    * first direct user-facing consumer.
    */
  def newsvendorOrderPoint(
      df: DataFrame, keyCol: String, valueCol: String,
      criticalRatio: Double, roundDigits: Int = 4): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val q = Profiling.groupedExactQuantiles(df, Seq(keyCol),
      col(valueCol), Seq("__op" -> criticalRatio))
    val m = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_periods"),
        round((sum(col(valueCol).cast(dec)).cast("double")
          / count(lit(1))).cast(stable), roundDigits)
          .as("__mean"))
    m.join(q, Seq(keyCol))
      .select(col(keyCol), col("n_periods"),
        col("__mean").cast("double").as("mean_demand"),
        col("__op").cast("double").as("order_point"),
        round((col("__op").cast("double") - col("__mean").cast("double"))
          .cast(stable), roundDigits).cast("double").as("safety_stock"))
  }

  def theilSenSlope(
      df: DataFrame,
      keyCol: String,
      dateCol: String,
      valueCol: String,
      roundDigits: Int = 6,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
      : DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    // persisted: daily feeds THREE consumers (both self-join sides +
    // nDays) — unpersisted, each replayed the caller's derivation (r20)
    val daily = scope.persist(
      df.select(col(keyCol).as("__k"), col(dateCol).as("__d"),
        col(valueCol).cast("double").as("__y")))
    // the day gap is > 0 for every surviving row (a.__d < b.__d), but
    // the division must still be guarded: the optimizer may evaluate
    // this projection BEFORE the range predicate (observed live once
    // the RDD-backed quantile path consumed `pairs`), and an ANSI
    // divide-by-zero on an equal-date pair then kills the job
    val dd = datediff(col("b.__d"), col("a.__d"))
    // persisted: the C(n,2) pair explosion feeds BOTH the median's
    // ranked pass and the n_pairs rollup — unpersisted, the self-join
    // ran end-to-end twice (r20)
    val pairs = scope.persist(daily.as("a").join(daily.as("b"),
        col("a.__k") === col("b.__k") && col("a.__d") < col("b.__d"))
      .select(col("a.__k").as("__k"),
        round(when(dd =!= 0,
          (col("b.__y") - col("a.__y")) / dd).cast(stable),
          roundDigits).cast("double").as("__s")))
    val nDays = daily.groupBy(col("__k"))
      .agg(countDistinct(col("__d")).as("n_days"))
    val med = Profiling.groupedExactQuantiles(pairs, Seq("__k"),
      col("__s"), Seq("ts_slope" -> 0.5), roundDigits = roundDigits)
    pairs.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_pairs"))
      .join(med, "__k")
      .join(nDays, "__k")
      .select(col("__k").as(keyCol), col("n_days"), col("n_pairs"),
        col("ts_slope").cast("double").as("ts_slope"))
  }

  /** X165 — Mann–Kendall trend test per key: `S = Σ_{i<j}
    * sign(v_j − v_i)` over the time-ordered observations plus
    * Kendall's tau-a `2S / (n(n−1))` — the NONPARAMETRIC "is this
    * series monotonically trending" screen that pairs with
    * [[theilSenSlope]] (same pair set; Theil–Sen estimates HOW MUCH,
    * Mann–Kendall whether the direction is systematic). S is an exact
    * integer — the whole statistic is sign comparisons, so the gate
    * can hash it raw; only tau divides, once, through the
    * DECIMAL(18,8) round contract.
    *
    * Shape: the [[theilSenSlope]] per-key self-join — C(n_days, 2)
    * pairs per key, bounded by the OBSERVATION WINDOW squared, never
    * by row count; values quantize through DECIMAL(18,6) so equal-at-
    * scale values tie identically on any engine. Keys need ≥ 2
    * observed periods for a pair to exist.
    */
  def mannKendallTrend(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      roundDigits: Int = 4,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
      : DataFrame = {
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    // persisted: three consumers (both self-join sides + nObs) — see
    // [[theilSenSlope]] (r20)
    val daily = scope.persist(df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(orderCol).as("__o"),
        col(valueCol).cast(dec6).as("__v")))
    val s = daily.as("a").join(daily.as("b"),
        col("a.__k") === col("b.__k") && col("a.__o") < col("b.__o"))
      .select(col("a.__k").as("__k"),
        signum((col("b.__v") - col("a.__v")).cast("double"))
          .cast("long").as("__sgn"))
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("__pairs"), sum(col("__sgn")).as("s_stat"))
    val nObs = daily.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_obs"))
    s.join(nObs, "__k")
      .select(col("__k").as(keyCol), col("n_obs"), col("s_stat"),
        round((lit(2.0) * col("s_stat").cast("double")
          / (col("n_obs") * (col("n_obs") - 1)).cast("double"))
          .cast(stable), roundDigits).cast("double").as("tau"))
  }

  /** X189 — periodicity scan: for every candidate period p ∈
    * [2, maxPeriod], the seasonal-ANOVA R² of folding the series at p
    * — `SS_between/SS_total` where positions are `t mod p` and t is
    * the day index from each key's first day. The dominant period is
    * the argmax row: a weekly series peaks at p = 7 (and its
    * harmonics at 14, 21 score high too — the standard folded-means
    * signature). The trig-free periodogram: spectral power needs
    * cos/sin whose libm bits differ across engines, folded-position
    * variance needs only counts and decimal sums.
    *
    * Exactness: per (key, p, position) the count and decimal value
    * sums are exact; position means and the grand mean round to 6 dp
    * doubles (the cusum μ discipline), each position's
    * `n_j·(ȳ_j−ȳ)²` term rounds to DECIMAL(18,8) BEFORE the exact
    * per-(key,p) sum (round-then-add — position order must not leak);
    * R² is one final float division. Constant series → SS_total = 0 →
    * null score.
    *
    * Scale: the explode fans each row to maxPeriod−1 copies before a
    * map-side-combinable agg collapses to (key × period × position)
    * cardinality — feed per-period aggregates (the module contract),
    * never raw events.
    */
  def periodicityScan(
      daily: DataFrame,
      keyCol: String, dayCol: String, valueCol: String,
      maxPeriod: Int = 14,
      roundDigits: Int = 4,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
      : DataFrame = {
    require(maxPeriod >= 2 && maxPeriod <= 60,
      s"maxPeriod out of [2,60]: $maxPeriod")
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val d24 = org.apache.spark.sql.types.DecimalType(24, 6)
    val q12 = org.apache.spark.sql.types.DecimalType(24, 12)
    val term = org.apache.spark.sql.types.DecimalType(18, 8)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val rows = daily.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(dayCol).as("__d"),
        col(valueCol).cast(dec6).as("__y"))
    val firstDay = rows.groupBy(col("__k")).agg(min(col("__d")).as("__d0"))
    // persisted: the moments branch and the period fan-out both read
    // this frame (the r14 plan audit showed the un-persisted form
    // scanning the input twice per branch)
    val indexed = scope.persist(rows.join(firstDay, "__k")
      .select(col("__k"), datediff(col("__d"), col("__d0")).as("__t"),
        col("__y")))
    // per-key moments: n, Σy (exact), Σy² (exact) → ȳ and SS_total
    val moments = indexed.groupBy(col("__k")).agg(
      count(lit(1)).as("__n"),
      sum(col("__y")).cast(d24).as("__s"),
      sum((col("__y") * col("__y")).cast(q12)).cast(q12).as("__ss"))
    val mu = round((col("__s").cast("double") / col("__n"))
      .cast(stable), 6).cast("double")
    // fold positions for every candidate period in one explode
    val folded = indexed
      .withColumn("__p", explode(array((2 to maxPeriod).map(lit): _*)))
      .groupBy(col("__k"), col("__p"), pmod(col("__t"), col("__p")).as("__j"))
      .agg(count(lit(1)).as("__nj"), sum(col("__y")).cast(d24).as("__sj"))
    val muJ = round((col("__sj").cast("double") / col("__nj"))
      .cast(stable), 6).cast("double")
    // no broadcast hint: moments is one row PER SERIES KEY — unbounded
    // cardinality (per-user series), unlike the repo's other broadcast
    // sides (group lists, k-row tables). AQE picks broadcast when the
    // key count is actually small and a shuffle join when it isn't
    // (r14 ADVICE: a forced broadcast here is a driver OOM at corpus
    // scale)
    val withMu = folded.join(moments, "__k")
      .withColumn("__term",
        round((col("__nj") * (muJ - mu) * (muJ - mu)).cast(term), 8))
    val agg = withMu
      .groupBy(col("__k"), col("__p"))
      .agg(first(col("__n")).as("n_obs"),
        sum(col("__term")).as("__ssb"),
        first(col("__ss")).as("__ss2"), first(col("__s")).as("__s2"))
    val muF = round((col("__s2").cast("double") / col("n_obs"))
      .cast(stable), 6).cast("double")
    val sst = col("__ss2").cast("double") -
      col("n_obs").cast("double") * muF * muF
    agg.select(col("__k").as(keyCol), col("__p").cast("bigint").as("period"),
      col("n_obs"),
      round(when(sst > 0, col("__ssb").cast("double") / sst)
        .cast(stable), roundDigits).cast("double").as("r2"))
  }

  /** X216 — additive Holt–Winters fit per key (level + trend +
    * m-period seasonality, the classical triple-exponential smoother)
    * with the next-season total forecast — the trend-and-seasonality
    * forecaster between [[crostonForecast]] (intermittent demand, no
    * season) and the GBT pipeline (features, fit cost): one pass, no
    * training loop, the standard first baseline on M5-shaped retail
    * series.
    *
    *   l ← α(y − s_idx) + (1−α)(l + b)
    *   b ← β(l − l_prev) + (1−β)b
    *   s_idx ← γ(y − l) + (1−γ)s_idx
    *
    * Zero-init (l₀ = y₀, b₀ = 0, s = 0 — the streaming-friendly
    * simplification; a production fit warm-starts s from one season
    * of averages, which only changes the first season's transient).
    * Because a full season's forecast sums EVERY seasonal index once,
    * `next_season_total = m·l + (Σ₁..m h)·b + Σs` needs no phase
    * arithmetic.
    *
    * Exactness (the cusum fold discipline): values quantize through
    * DECIMAL(18,6) → double; α/β/γ and their complements are
    * Scala-computed shortest-round-trip literals; the fold is one
    * fixed IEEE sequence per step (identical in Spark `aggregate` and
    * DuckDB `list_reduce`), state = [i, l, b, s₁..s_m] doubles; only
    * the final display values round. Rows fold in (order, value)
    * sort order; per-key arrays are the sanctioned bounded-series
    * collect.
    */
  def holtWinters(
      daily: DataFrame,
      keyCol: String, dayCol: String, valueCol: String,
      alpha: Double = 0.3, beta: Double = 0.1, gamma: Double = 0.2,
      seasonLength: Int = 7, roundDigits: Int = 4): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1 &&
      gamma > 0 && gamma < 1, s"smoothing params must be in (0,1)")
    require(seasonLength >= 2 && seasonLength <= 366,
      s"seasonLength must be in [2,366]: $seasonLength")
    val m = seasonLength
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val rows = daily.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(dayCol).as("__o"),
        col(valueCol).cast(dec6).as("__y"))
    val agg = rows.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_obs"),
        expr("array_sort(collect_list(struct(__o, __y)))").as("__a"))
      .withColumn("__ys",
        expr("transform(__a, s -> CAST(s.__y AS DOUBLE))"))
    // state = [i, l, b, s1..sm]; every sub-expression re-derives from
    // acc (the x198 struct-mutation lesson)
    val i0 = "element_at(acc, 1)"
    val y = "element_at(xw, 1)"
    val idxPos = s"(4 + CAST(pmod($i0, ${m}.0D) AS INT))"
    val sIdx = s"element_at(acc, $idxPos)"
    val lNew = s"(${alpha}D * ($y - $sIdx) + ${1.0 - alpha}D * " +
      s"(element_at(acc, 2) + element_at(acc, 3)))"
    val bNew = s"(${beta}D * ($lNew - element_at(acc, 2)) + " +
      s"${1.0 - beta}D * element_at(acc, 3))"
    val sNew = s"(${gamma}D * ($y - $lNew) + ${1.0 - gamma}D * $sIdx)"
    val elems = Seq(
      s"$i0 + 1D",
      s"CASE WHEN $i0 = 0D THEN $y ELSE $lNew END",
      s"CASE WHEN $i0 = 0D THEN 0D ELSE $bNew END") ++
      (4 to m + 3).map(k =>
        s"CASE WHEN $i0 = 0D THEN 0D WHEN $idxPos = $k THEN $sNew " +
          s"ELSE element_at(acc, $k) END")
    val zeros = Seq.fill(m + 2)("0D").mkString(", ")
    val folded = agg.withColumn("__c", expr(
      s"""aggregate(
         |  transform(__ys, y -> array(y, $zeros)),
         |  array(0D, $zeros),
         |  (acc, xw) -> array(${elems.mkString(",\n    ")}))""".stripMargin))
    val sSum = (4 to m + 3).map(k => expr(s"element_at(__c, $k)"))
      .reduce(_ + _)
    val hSum = (1 to m).sum.toDouble
    val next = (expr("element_at(__c, 2)") * m
      + expr("element_at(__c, 3)") * hSum + sSum)
    folded.select(col("__k").as(keyCol), col("n_obs"),
      round(expr("element_at(__c, 2)").cast(stable), roundDigits)
        .cast("double").as("level"),
      round(expr("element_at(__c, 3)").cast(stable), roundDigits)
        .cast("double").as("trend"),
      round(next.cast(stable), roundDigits).cast("double")
        .as("next_season_total"))
  }

  /** X241 (r16) — negative-binomial overdispersion fit by the method
    * of moments: per key, a count metric's mean m and sample variance
    * v give the dispersion index v/m, and — when the data is
    * genuinely overdispersed (v > m, the regime where a Poisson model
    * underestimates every tail) — the NB size r = m²/(v−m) and
    * success probability p = m/v. THE distributional read behind
    * demand/count modeling ([[demandClasses]] labels the regimes;
    * this fits the model the lumpy regimes need — retail demand,
    * per-user event counts, and word frequencies are all classically
    * NB, not Poisson). Closed-form moments: no iteration, one
    * aggregate per key.
    *
    * Portability discipline: per-row squares rounded to 8 dp before
    * the exact DECIMAL(28,8) sums, mean pinned to 6 dp before the
    * variance combine (the didEstimate contract), final float chains
    * rounded once. Keys with n ≤ 1 or m = 0 emit null fits;
    * underdispersed keys (v ≤ m) emit the moments with null r/p and
    * overdispersed = 0.
    */
  def negBinomialFit(df: DataFrame, keyCols: Seq[String],
      valueCol: String, roundDigits: Int = 6): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val wide = org.apache.spark.sql.types.DecimalType(28, 8)
    val ks = keyCols.map(col)
    val rows = df.filter(col(valueCol).isNotNull)
      .select(ks :+ col(valueCol).cast("double").as("__v"): _*)
    val cells = rows.groupBy(ks: _*).agg(
      count(lit(1)).as("__n"),
      sum(col("__v").cast(wide)).as("__s"),
      sum(round((col("__v") * col("__v")).cast(wide), 8)).as("__q"))
    val mean = round((col("__s").cast("double") / col("__n").cast("double"))
      .cast(stable), 6).cast("double")
    val variance = when(col("__n") > 1L,
      (col("__q").cast("double") - col("__n").cast("double") * mean * mean)
        / (col("__n") - 1L).cast("double"))
    val enriched = cells.withColumn("__m", mean)
      .withColumn("__var", variance)
    val disp = col("__var") / col("__m")
    val over = col("__var") > col("__m")
    val r = col("__m") * col("__m") / (col("__var") - col("__m"))
    val p = col("__m") / col("__var")
    enriched.select(ks ++ Seq(
      col("__n").as("n"),
      round(col("__m").cast(stable), roundDigits).cast("double")
        .as("mean"),
      round(col("__var").cast(stable), roundDigits).cast("double")
        .as("variance"),
      round(when(col("__m") > 0, disp).cast(stable), roundDigits)
        .cast("double").as("dispersion"),
      when(col("__var").isNotNull && col("__m") > 0, over.cast("int"))
        .as("overdispersed"),
      round(when(over && col("__m") > 0, r).cast(stable), roundDigits)
        .cast("double").as("nb_r"),
      round(when(over && col("__m") > 0, p).cast(stable), roundDigits)
        .cast("double").as("nb_p")): _*)
  }
}
