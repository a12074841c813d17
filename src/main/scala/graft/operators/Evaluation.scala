package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation and distribution-drift statistics — the metrics a
  * training-data pipeline runs to answer "is this score any good?"
  * (ROC AUC), "did the data change under me?" (KS, PSI), and "how
  * concentrated is this quantity?" (Gini). Reference scope: the M5
  * pipeline evaluates its forecasts (WRMSSE, `Forecast.wrmsse`); these
  * are the classification/drift complements a production retrain loop
  * needs around that same model.
  *
  * Every statistic is exact and engine-portable: all intermediate
  * quantities are integer counts or sums of input doubles combined in
  * a fixed order, so a DuckDB oracle reproduces them bit-for-bit
  * before the final ROUND.
  */
object Evaluation {

  /** The scale knob every rank statistic here shares ([[rocAuc]]'s
    * `bins` block, factored): quantize a double column to `bins`
    * equal-width buckets between its global min/max (a 1-row
    * broadcast), bounding any later distinct-value window at `bins`
    * rows. The map is MONOTONE (order-preserving), so rank metrics
    * computed on the quantized order equal the exact ones whenever
    * the input already took ≤ `bins` distinct grid values, and
    * approximate them (tie handling coarsens at bin granularity)
    * otherwise — the documented x133 argument. `bins <= 0` = exact.
    * A degenerate constant column maps to bin 0.
    */
  private def quantize(raw: DataFrame, vCol: String, bins: Int)
      : DataFrame =
    if (bins <= 0) raw
    else {
      val keep = raw.columns.filter(_ != vCol).map(col).toSeq
      val ext = raw.agg(min(col(vCol)).as("__qlo"), max(col(vCol)).as("__qhi"))
      raw.crossJoin(broadcast(ext))
        .select(
          when(col("__qhi") > col("__qlo"),
            least(floor((col(vCol) - col("__qlo")) * bins
              / (col("__qhi") - col("__qlo"))), lit(bins - 1).cast("long")))
            .otherwise(lit(0L)).cast("double").as(vCol) +: keep: _*)
    }

  /** ROC AUC via the rank-sum (Mann–Whitney U) identity:
    * `AUC = (Σ_pos midrank − P(P+1)/2) / (P·N)` where `midrank` is the
    * average rank of a score under ties. Equivalent to the probability
    * a random positive outscores a random negative (ties count half) —
    * the trapezoidal area under the ROC curve, computed without
    * materializing the curve.
    *
    * Shape: one count aggregate collapses the input to DISTINCT score
    * rows `(score, n, n_pos)`; the cumulative-rank window then runs
    * over score cardinality, not row cardinality; one final aggregate
    * emits the 1-row result. For a 100 TB score column whose distinct
    * cardinality is itself huge, pass `bins > 0`: scores quantize to
    * `bins` equal-width buckets between the global min/max (a 1-row
    * broadcast), bounding the window at `bins` rows — binned AUC is
    * the standard scale form (it only coarsens tie handling; monotone
    * score transforms never change AUC, and binning is monotone).
    */
  def rocAuc(df: DataFrame, label: Column, score: Column,
      bins: Int = 0, roundDigits: Int = 6): DataFrame = {
    // a row without a score cannot be ranked; dropping nulls here also
    // keeps the window's null-ordering out of the cross-engine contract
    val raw = df.filter(score.isNotNull)
      .select(score.cast("double").as("__s"),
        when(label, lit(1L)).otherwise(lit(0L)).as("__y"))
    val scored =
      if (bins <= 0) raw
      else {
        val ext = raw.agg(min(col("__s")).as("__lo"), max(col("__s")).as("__hi"))
        raw.crossJoin(broadcast(ext))
          .select(
            when(col("__hi") > col("__lo"),
              least(floor((col("__s") - col("__lo")) * bins
                / (col("__hi") - col("__lo"))), lit(bins - 1).cast("long")))
              .otherwise(lit(0L)).as("__s"),
            col("__y"))
      }
    val perScore = scored.groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"))
    // midrank of every row tied at this score: rows_below + (ties+1)/2
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perScore.withColumn("__below",
        coalesce(sum(col("__n")).over(w), lit(0L)))
      .withColumn("__midrank",
        col("__below") + (col("__n") + 1) / lit(2.0d))
    ranked.agg(
        sum(col("__p") * col("__midrank")).as("__rs"),
        sum(col("__p")).as("__np"),
        sum(col("__n")).as("__nt"))
      .select(
        col("__np").as("n_pos"),
        (col("__nt") - col("__np")).as("n_neg"),
        round(
          when(col("__np") > 0 && col("__nt") > col("__np"),
            (col("__rs") - col("__np") * (col("__np") + 1) / lit(2.0d))
              / (col("__np") * (col("__nt") - col("__np")))),
          roundDigits).as("auc"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic
    * `D = max_v |F_a(v) − F_b(v)|` — the nonparametric drift test
    * between two slices of the same column (yesterday vs today, source
    * A vs source B). The ECDFs are evaluated at every pooled distinct
    * value, which is where the max must occur.
    *
    * Same shape as [[rocAuc]]: one aggregate to distinct values with
    * per-side counts, a cumulative window over value cardinality, one
    * 1-row result. The same `bins` option bounds the window for
    * continuous 100 TB columns (binned D understates the true D by at
    * most the probability mass inside one bin — the standard
    * histogram-sketch tradeoff).
    */
  def ksTest(df: DataFrame, sideA: Column, sideB: Column, value: Column,
      bins: Int = 0, roundDigits: Int = 6): DataFrame = {
    val raw = df
      .filter((sideA || sideB) && value.isNotNull)
      .select(value.cast("double").as("__v"),
        when(sideA, lit(1L)).otherwise(lit(0L)).as("__a"),
        when(sideB, lit(1L)).otherwise(lit(0L)).as("__b"))
    val binned =
      if (bins <= 0) raw
      else {
        val ext = raw.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
        raw.crossJoin(broadcast(ext))
          .select(
            when(col("__hi") > col("__lo"),
              least(floor((col("__v") - col("__lo")) * bins
                / (col("__hi") - col("__lo"))), lit(bins - 1).cast("long")))
              .otherwise(lit(0L)).cast("double").as("__v"),
            col("__a"), col("__b"))
      }
    val perValue = binned.groupBy(col("__v"))
      .agg(sum(col("__a")).as("__na"), sum(col("__b")).as("__nb"))
    val wCum = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // bounded: both windows run over the binned per-value frame
    // (≤ bins rows after the groupBy above), never the samples
    val wAll = Window.partitionBy()
    val cdf = perValue.select(
      sum(col("__na")).over(wCum).as("__ca"),
      sum(col("__nb")).over(wCum).as("__cb"),
      sum(col("__na")).over(wAll).as("__ta"),
      sum(col("__nb")).over(wAll).as("__tb"))
    // |ca/Ta − cb/Tb| maximized as |ca·Tb − cb·Ta| over exact
    // integers, divided ONCE at the end: no per-row float ratios to
    // disagree across engines before the max picks its row
    cdf.agg(
        max(abs(col("__ca") * col("__tb") - col("__cb") * col("__ta")))
          .as("__num"),
        max(col("__ta")).as("__ta"),
        max(col("__tb")).as("__tb"))
      .select(
        col("__ta").as("n_a"),
        col("__tb").as("n_b"),
        round(
          when(col("__ta") > 0 && col("__tb") > 0,
            col("__num").cast("double") / (col("__ta") * col("__tb"))),
          roundDigits).as("d_stat"))
  }

  /** Population Stability Index between a baseline slice and a current
    * slice of one numeric column: bin by the BASELINE's exact decile
    * cutoffs (so baseline bins are near-equal by construction), then
    * `PSI = Σ (p_cur − p_base) · ln(p_cur / p_base)`. The retrain
    * trigger metric: PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 act.
    *
    * One exact-percentile aggregate over the baseline (the t38
    * percentile ≡ quantile_cont parity), a 1-row broadcast of the
    * cutoffs, one map-side-combinable count aggregate over both slices
    * — two scans total, nothing driver-side, `k` rows out. Empty bins
    * on either side take probability `epsilon` (the standard PSI
    * smoothing; ln(0) is the alternative and it is not a number).
    */
  def psi(df: DataFrame, isBaseline: Column, isCurrent: Column,
      value: Column, k: Int = 10, epsilon: Double = 1e-6,
      roundDigits: Int = 6): DataFrame = {
    require(k >= 2, s"PSI needs at least 2 bins, got $k")
    val v = value.cast("double")
    val probs = (1 until k).map(_.toDouble / k)
    // cutoffs via the exact rank-arithmetic decimal path: a float
    // quantile interpolation is engine-VERSION-sensitive even after a
    // ROUND (the r12 x152 lesson), and a flipped cutoff moves boundary
    // rows between bins on one engine only. The k−1 cutoffs COLLECT to
    // driver literals — bounded model state like kmeans' k×dim
    // centroids, NOT data — because referencing k−1 columns of a
    // joined 1-row frame inside one expression tree sends Catalyst's
    // optimizer exponential (measured: each extra cut reference
    // doubled optimization time; 9 cuts OOMed the driver). Literals
    // also erase the nested-loop join: bin assignment is pure codegen.
    val qScope = graft.util.CacheScope()
    val cutsFrame = Profiling.groupedExactQuantiles(
      df.filter(isBaseline).select(v.as("__psiv")), Seq(), col("__psiv"),
      probs.zipWithIndex.map { case (p, i) => s"__c$i" -> p },
      scope = qScope)
    val cutRows = cutsFrame.collect()
    qScope.unpersistAll()
    require(cutRows.nonEmpty, "psi needs a non-empty baseline slice")
    val cuts = (0 until k - 1).map(i => lit(cutRows(0).getDecimal(i)))
    // bin = 1 + Σ (v > cut_i): map-side literal arithmetic
    val bin = cuts.foldLeft(lit(1L)) { (acc, c) =>
      acc + when(v > c, 1L).otherwise(0L)
    }
    val counted = df.filter((isBaseline || isCurrent) && v.isNotNull)
      .select(bin.as("bin"),
        when(isBaseline, 1L).otherwise(0L).as("__base"),
        when(isCurrent, 1L).otherwise(0L).as("__cur"))
      .groupBy(col("bin"))
      .agg(sum(col("__base")).as("__nb"), sum(col("__cur")).as("__nc"))
    // bounded: totals via a whole-relation window over the k-row bin
    // frame — cheaper and simpler than a second scan + broadcast join
    val tot = Window.partitionBy()
    val pb = greatest(col("__nb").cast("double")
      / sum(col("__nb")).over(tot), lit(epsilon))
    val pc = greatest(col("__nc").cast("double")
      / sum(col("__nc")).over(tot), lit(epsilon))
    counted
      .select(col("bin"), col("__nb").as("n_base"), col("__nc").as("n_cur"),
        round((pc - pb) * (log(pc) - log(pb)), roundDigits).as("psi_term"))
  }

  /** Welch's unequal-variance t-test between two slices of a numeric
    * column — "did the mean move, and is the move larger than the
    * noise?" — the parametric complement of [[ksTest]]'s whole-
    * distribution question. Returns the t statistic and the
    * Welch–Satterthwaite degrees of freedom (the caller looks up the
    * p-value; evaluating the t CDF is a table lookup, not a data
    * problem).
    *
    * ONE aggregate over one scan: per-side n/mean/variance as
    * conditional aggregates (all moment sketches, map-side
    * combinable). Both outputs stabilize through DECIMAL(18,8)
    * before rounding (the changepoint boundary contract).
    */
  def welchTTest(df: DataFrame, sideA: Column, sideB: Column,
      value: Column, roundDigits: Int = 4): DataFrame = {
    val v = value.cast("double")
    val agg = df.filter((sideA || sideB) && value.isNotNull).agg(
      count(when(sideA, lit(1))).as("__na"),
      avg(when(sideA, v)).as("__ma"),
      var_samp(when(sideA, v)).as("__va"),
      count(when(sideB, lit(1))).as("__nb"),
      avg(when(sideB, v)).as("__mb"),
      var_samp(when(sideB, v)).as("__vb"))
    val sa = col("__va") / col("__na")
    val sb = col("__vb") / col("__nb")
    val se2 = sa + sb
    val t = (col("__ma") - col("__mb")) / sqrt(se2)
    val dof = (se2 * se2) /
      (sa * sa / (col("__na") - 1) + sb * sb / (col("__nb") - 1))
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    def r(c: Column): Column =
      round(c.cast(stable), roundDigits).cast("double")
    agg.select(
      col("__na").as("n_a"), col("__nb").as("n_b"),
      r(when(col("__na") >= 2 && col("__nb") >= 2 && se2 > 0, t))
        .as("t_stat"),
      r(when(col("__na") >= 2 && col("__nb") >= 2 && sa > 0 && sb > 0,
        dof)).as("dof"))
  }

  /** X108 — Spearman rank correlation between two numeric columns:
    * Pearson correlation over midranks, the outlier-robust "does y
    * rise with x" monotone-association test (a feature-vs-label screen
    * that a linear corr misses on curved but monotone relationships).
    *
    * Shape: each variable's midranks come from ONE distinct-value
    * count aggregate + a cumulative window over VALUE cardinality (the
    * [[rocAuc]] machinery, run per side), joined back to rows on the
    * value — two shuffles of row cardinality, windows bounded by
    * distinct cardinality. Midranks are exact halves, so the five
    * moment sums run EXACTLY in DECIMAL(28,6) (addition-order-free);
    * the final correlation is one float expression over those exact
    * operands, stabilized through DECIMAL(18,8). A constant column has
    * zero rank variance → null, not a division error.
    *
    * For continuous columns at 100 TB, distinct ≈ rows and the
    * un-partitioned cumulative window pins one task: pass `bins > 0`
    * to [[quantize]] each side independently to a bounded grid —
    * binning is monotone per variable, so Spearman over the binned
    * midranks equals the exact value whenever each variable already
    * sat on a ≤bins grid, and is the standard histogram approximation
    * otherwise.
    */
  def spearman(df: DataFrame, x: Column, y: Column,
      bins: Int = 0, roundDigits: Int = 6,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
      : DataFrame = {
    val raw0 = df.filter(x.isNotNull && y.isNotNull)
      .select(x.cast("double").as("__x"), y.cast("double").as("__y"))
    // persisted: raw feeds THREE consumers (both midrank passes + the
    // ranked join) — unpersisted, each replayed the scan (r20)
    val raw = scope.persist(
      quantize(quantize(raw0, "__x", bins), "__y", bins))
    def midranks(frame: DataFrame, v: String, out: String): DataFrame = {
      val perVal = frame.groupBy(col(v)).agg(count(lit(1)).as("__n"))
      val w = Window.orderBy(col(v))
        .rowsBetween(Window.unboundedPreceding, -1)
      perVal.select(col(v),
        (coalesce(sum(col("__n")).over(w), lit(0L))
          + (col("__n") + 1) / lit(2.0d)).as(out))
    }
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val ranked = raw
      .join(midranks(raw, "__x", "__rx"), "__x")
      .join(midranks(raw, "__y", "__ry"), "__y")
    val m = ranked.agg(
      count(lit(1)).as("__nr"),
      sum(col("__rx").cast(dec)).as("__sx"),
      sum(col("__ry").cast(dec)).as("__sy"),
      sum((col("__rx") * col("__ry")).cast(dec)).as("__sxy"),
      sum((col("__rx") * col("__rx")).cast(dec)).as("__sxx"),
      sum((col("__ry") * col("__ry")).cast(dec)).as("__syy"))
    val n = col("__nr").cast("double")
    def d(c: String): Column = col(c).cast("double")
    val covN = n * d("__sxy") - d("__sx") * d("__sy")
    val varX = n * d("__sxx") - d("__sx") * d("__sx")
    val varY = n * d("__syy") - d("__sy") * d("__sy")
    m.select(col("__nr").as("n"),
      round(
        when(varX > 0 && varY > 0, covN / sqrt(varX * varY))
          .cast(stable), roundDigits)
        .cast("double").as("rho"))
  }

  /** X128 — calibration table + Brier score: does a probability
    * column MEAN what it says? Rows bin by predicted probability
    * (`⌊p·k⌋`, top-inclusive); each bin reports its size, mean
    * prediction, and observed positive rate — the reliability-diagram
    * table — and every row carries the global Brier score
    * `mean((p − y)²)` (the proper scoring rule; 0 = oracle,
    * 0.25 = coin). The model-monitoring readout for any scoring
    * filter (quality classifiers, dedup confidence, relevance).
    *
    * One counting aggregate to k bins + one 1-row Brier aggregate
    * broadcast back. All sums run in DECIMAL (the per-row p and
    * (p−y)² quantize at cast — exact, addition-order-free); ratios
    * stabilize through DECIMAL(18,8).
    */
  def calibration(df: DataFrame, prob: Column, label: Column,
      k: Int = 10, roundDigits: Int = 6): DataFrame = {
    require(k >= 2, s"need at least 2 bins, got $k")
    val dec = org.apache.spark.sql.types.DecimalType(18, 10)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val p = prob.cast("double")
    val y = when(label, lit(1.0d)).otherwise(lit(0.0d))
    val rows = df.filter(p.isNotNull)
      .select(least(floor(p * k), lit(k - 1).cast("long")).as("bin"),
        p.as("__p"), y.as("__y"))
    val brier = rows.agg(
      round((sum(((col("__p") - col("__y")) * (col("__p") - col("__y")))
        .cast(dec)).cast("double") / count(lit(1))).cast(stable),
        roundDigits).cast("double").as("brier"))
    rows.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__p").cast(dec)).as("__sp"),
        sum(col("__y").cast(dec)).as("__sy"))
      .crossJoin(broadcast(brier))
      .select(col("bin"), col("n"),
        round((col("__sp").cast("double") / col("n")).cast(stable),
          roundDigits).cast("double").as("avg_pred"),
        round((col("__sy").cast("double") / col("n")).cast(stable),
          roundDigits).cast("double").as("obs_rate"),
        col("brier"))
  }

  /** Gini coefficient of a nonnegative quantity's concentration
    * (spend, tokens, traffic): with values sorted ascending and
    * 1-based rank `i`, `G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n`. 0 = equal
    * shares, (n−1)/n = one holder has everything.
    *
    * Scale shape (r15 — [[graft.operators.Relational.chunkedRank]],
    * no zipWithIndex, no RDD round-trip): the chunked global rank
    * assigns `i` without a single-partition window or an extra
    * partition-size job; the moment sums then combine map-side in one
    * aggregate. Ties order by `tieBreaker` — Gini is
    * tie-order-invariant (equal values contribute the same Σ i·x for
    * any permutation of their ranks), the total order just makes the
    * plan deterministic end-to-end.
    *
    * Portability: the moment sums run in DECIMAL(28,6), so `Σx` and
    * `Σ i·x` are EXACT regardless of partition/addition order — a
    * double sum here would drift in the last ulp between engines and
    * break the hash gate. The one float division happens at the end on
    * exact operands. Values must fit 22 integer digits (money, counts,
    * token totals all do).
    */
  def gini(df: DataFrame, value: Column, tieBreaker: Column,
      roundDigits: Int = 6,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
      : DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val rows = df.filter(value.isNotNull)
      .select(value.cast(dec).as("__x"), tieBreaker.as("__t"))
    graft.operators.Relational
      .chunkedRank(rows, Seq(col("__x"), col("__t")), "__i0", scope)
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sum"),
        sum((col("__i0") + 1L) * col("__x")).as("__ws"))
      .select(col("__n").as("n"),
        round(col("__sum").cast("double"), 2).as("total"),
        round(
          when(col("__n") > 0 && col("__sum") > 0,
            lit(2.0d) * col("__ws").cast("double")
              / (col("__n") * col("__sum").cast("double"))
              - (col("__n") + 1) / col("__n").cast("double")),
          roundDigits).as("gini"))
  }

  /** X184 — Kruskal–Wallis H test: does a numeric column's
    * DISTRIBUTION differ across g groups? — the rank-based (outlier-
    * and-shape-robust) multi-group extension of [[welchTTest]]'s
    * two-mean question, with the standard tie correction
    * `C = 1 − Σ(t³−t)/(N³−N)`.
    *
    * Ranks are midranks per DISTINCT value (the [[spearman]]
    * machinery): one distinct-value count aggregate + a cumulative
    * window over VALUE cardinality — never a rank window over rows —
    * joined back on the value. Midranks are exact halves, so per-group
    * rank sums run EXACTLY in DECIMAL(28,6); each group's `R²/n` term
    * is one float chain rounded to DECIMAL(28,8) BEFORE the exact
    * group-sum (round-then-add — group iteration order must not leak
    * into the statistic), and H is one final float expression. All
    * groups identical values → C = 0 → null H (not a division error).
    *
    * For continuous value columns at 100 TB, distinct ≈ rows: pass
    * `bins > 0` ([[quantize]]) to bound the midrank window at `bins`
    * rows — monotone binning preserves the rank statistic exactly on
    * grid-valued data and coarsens only tie handling otherwise.
    *
    * Overflow: the tie sum Σ(t³−t) and the N³−N guard cube COUNTS,
    * which leave Long at N ≈ 2²¹ (ANSI mode would raise mid-query at
    * scale); both run in DECIMAL(12,0)³ → DECIMAL(38,0) — exact to
    * 10¹² rows, matching the oracle's HUGEINT promotion.
    */
  def kruskalWallis(df: DataFrame, group: Column, value: Column,
      bins: Int = 0, roundDigits: Int = 4): DataFrame = {
    val d12 = org.apache.spark.sql.types.DecimalType(12, 0)
    def cubeMinus(c: Column): Column = {
      val n = c.cast(d12)
      (n * n * n).cast(org.apache.spark.sql.types.DecimalType(38, 0)) - n
    }
    val raw0 = df.filter(group.isNotNull && value.isNotNull)
      .select(group.cast("string").as("__g"), value.cast("double").as("__v"))
    val raw = quantize(raw0, "__v", bins)
    val perVal = raw.groupBy(col("__v")).agg(count(lit(1)).as("__n"))
    // cumulative window over DISTINCT-value cardinality (bounded by
    // the value domain, never row count — the spearman discipline)
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perVal.select(col("__v"),
      (coalesce(sum(col("__n")).over(w), lit(0L))
        + (col("__n") + 1) / lit(2.0d)).as("__r"))
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val term = org.apache.spark.sql.types.DecimalType(28, 8)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val byG = raw.join(ranked, "__v")
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__ng"), sum(col("__r").cast(dec)).as("__sr"))
    val tot = perVal.agg(sum(col("__n")).as("__N"),
      sum(cubeMinus(col("__n"))).as("__T"))
    byG.crossJoin(broadcast(tot))
      .agg(
        first(col("__N")).as("n"),
        count(lit(1)).as("n_groups"),
        sum(round((col("__sr").cast("double") * col("__sr").cast("double")
          / col("__ng")).cast(term), 8)).as("__S"),
        first(col("__N")).as("__N2"),
        first(col("__T")).as("__T2"))
      .select(col("n"), col("n_groups"),
        round((lit(12.0d) * col("__S").cast("double")
          / (col("__N2").cast("double") * (col("__N2") + 1))
          - lit(3.0d) * (col("__N2") + 1)).cast(stable), roundDigits)
          .cast("double").as("h"),
        round(when(
          cubeMinus(col("__N2")) > col("__T2"),
          (lit(12.0d) * col("__S").cast("double")
            / (col("__N2").cast("double") * (col("__N2") + 1))
            - lit(3.0d) * (col("__N2") + 1))
            / (lit(1.0d) - col("__T2").cast("double")
              / (col("__N2").cast("double") * col("__N2") * col("__N2")
                - col("__N2"))))
          .cast(stable), roundDigits).cast("double").as("h_tie_corrected"))
  }

  /** X185 — log-rank test between two survival groups: are the two
    * survival curves [[graft.operators.TimeSeries.kaplanMeier]] draws
    * actually different? At every event time t the observed group-A
    * events compare against the expectation under a shared hazard
    * (`E_A = Σ d_t·n_At/n_t`), with the hypergeometric variance
    * `V = Σ d_t·(n_At/n_t)·(1−n_At/n_t)·(n_t−d_t)/(n_t−1)` and
    * `χ² = (O_A − E_A)²/V` — the standard A/B readout for retention
    * and churn experiments.
    *
    * Lifetimes per user follow the kaplanMeier construction verbatim
    * (first→last event, censored inside the trailing window); at-risk
    * counts per group ride cumulative windows over DURATION
    * cardinality (bounded by the observation window in days). Both
    * per-time terms are float chains over integer counts, rounded to
    * DECIMAL(18,8) BEFORE the exact decimal sum (round-then-add);
    * `n_t = 1` times contribute no variance (the standard convention).
    */
  def logRank(df: DataFrame, keyCol: String, tsCol: String,
      groupA: Column, censorLastDays: Int = 3,
      roundDigits: Int = 4): DataFrame = {
    require(censorLastDays >= 0, "censorLastDays must be >= 0")
    val perUser = df.groupBy(col(keyCol)).agg(
      to_date(min(col(tsCol))).as("__first"),
      to_date(max(col(tsCol))).as("__last"),
      // group membership from the same per-user pass: ANY row of the
      // user satisfying groupA marks the user (callers pass per-user-
      // constant predicates)
      max(groupA.cast("int")).as("__ga"))
    val gmax = df.agg(to_date(max(col(tsCol))).as("__gmax"))
    val lifetimes = perUser.crossJoin(broadcast(gmax))
      .select(
        datediff(col("__last"), col("__first")).cast("long").as("__dur"),
        (datediff(col("__gmax"), col("__last")) >= censorLastDays)
          .cast("long").as("__event"),
        col("__ga"))
    val byDur = lifetimes.groupBy(col("__dur")).agg(
      count(lit(1)).as("__n"),
      sum(col("__event")).as("__d"),
      sum(col("__ga")).as("__na"),
      sum(col("__event") * col("__ga")).as("__da"))
    // at-risk = total − everyone with shorter duration: cumulative
    // windows over DURATION cardinality (days, the kaplanMeier bound)
    val wPrev = Window.orderBy(col("__dur"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = lifetimes.agg(count(lit(1)).as("__tot"),
      sum(col("__ga")).as("__totA"))
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val risks = byDur.crossJoin(broadcast(tot))
      .withColumn("__risk",
        col("__tot") - coalesce(sum(col("__n")).over(wPrev), lit(0L)))
      .withColumn("__riskA",
        col("__totA") - coalesce(sum(col("__na")).over(wPrev), lit(0L)))
      .filter(col("__d") >= 1)
    val pA = col("__riskA").cast("double") / col("__risk").cast("double")
    val eTerm = round((col("__d").cast("double") * pA).cast(stable), 8)
    val vTerm = round(
      when(col("__risk") > 1,
        col("__d").cast("double") * pA * (lit(1.0d) - pA)
          * (col("__risk") - col("__d")).cast("double")
          / (col("__risk") - 1).cast("double"))
        .otherwise(lit(0.0d)).cast(stable), 8)
    risks.agg(
        first(col("__totA")).as("n_a"),
        (first(col("__tot")) - first(col("__totA"))).as("n_b"),
        sum(col("__da")).as("observed_a"),
        sum(eTerm).as("__e"),
        sum(vTerm).as("__v"))
      .select(col("n_a"), col("n_b"), col("observed_a"),
        round(col("__e").cast(stable), roundDigits).cast("double")
          .as("expected_a"),
        round(when(col("__v") > 0,
          (col("observed_a").cast("double") - col("__e").cast("double"))
            * (col("observed_a").cast("double") - col("__e").cast("double"))
            / col("__v").cast("double")).cast(stable), roundDigits)
          .cast("double").as("chi2"))
  }

  /** X186 — cumulative gains / lift table: rows rank into k score
    * bands (band 1 = highest scores) by EXACT quantile cutoffs; each
    * band reports its size, positives, cumulative capture rate (share
    * of all positives found in bands 1..i) and cumulative lift vs the
    * base rate — the "call the top 20%" targeting readout that a
    * single ROC AUC (x133) compresses away.
    *
    * Cutoffs come from the exact rank-arithmetic decimal machinery
    * ([[graft.operators.Profiling.groupedExactQuantiles]]) and COLLECT
    * to k−1 driver literals (bounded model state, the rfmSegments
    * shape), so banding is pure codegen: band = k − Σ(score > qᵢ).
    * The cumulative pass is a window over the k-row band table —
    * bounded by construction. Ratios stabilize through DECIMAL(18,8).
    */
  def gainsTable(df: DataFrame, score: Column, label: Column,
      k: Int = 10, roundDigits: Int = 6): DataFrame = {
    require(k >= 2 && k <= 100, s"need 2 <= k <= 100 bands, got $k")
    val rows = df.filter(score.isNotNull && label.isNotNull)
      .select(score.cast("double").as("__s"),
        label.cast("long").as("__y"))
    val qScope = graft.util.CacheScope()
    // headOption, not head: an all-null score/label input yields an
    // EMPTY quantile frame and head()'s bare NoSuchElementException
    // names nothing — fail with the cause (the rfmSegments rule)
    val cutRowOpt = graft.operators.Profiling.groupedExactQuantiles(
      rows, Seq(), col("__s"),
      (1 until k).map(i => s"q$i" -> i.toDouble / k),
      scope = qScope).collect().headOption
    qScope.unpersistAll()
    require(cutRowOpt.nonEmpty,
      "gainsTable: no non-null (score, label) rows — quantile cutoffs undefined")
    val cutRow = cutRowOpt.get
    val cuts = (1 until k).map(i => cutRow.getDecimal(i - 1))
    // band 1 = TOP scores: k − (# cutoffs the score exceeds)
    val band = lit(k) - cuts.map(c => (col("__s") > lit(c)).cast("int"))
      .reduce(_ + _)
    val byBand = rows.groupBy(band.as("band"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    gainsFromBandCounts(byBand, roundDigits)
  }

  /** [[gainsTable]]'s second half: the cumulative capture/lift fold
    * over an already-banded `(band, n, n_pos)` count frame. Factored
    * out (r15) so the STREAMING monitor's per-band running counts
    * ([[graft.streaming.Stateful.bandCountsMonitor]]) roll up through
    * the EXACT batch code path — stream ≡ batch by construction. */
  private[graft] def gainsFromBandCounts(
      byBand: DataFrame, roundDigits: Int): DataFrame = {
    // bounded: cumulative capture over the k-row band table, never data
    val wCum = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    byBand
      .withColumn("__cn", sum(col("n")).over(wCum))
      .withColumn("__cp", sum(col("n_pos")).over(wCum))
      .withColumn("__tn", sum(col("n")).over(tot))
      .withColumn("__tp", sum(col("n_pos")).over(tot))
      .select(col("band").cast("bigint").as("band"), col("n"), col("n_pos"),
        round(when(col("__tp") > 0,
          col("__cp").cast("double") / col("__tp").cast("double"))
          .cast(stable), roundDigits).cast("double").as("cum_capture"),
        round(when(col("__tp") > 0 && col("__cn") > 0,
          (col("__cp").cast("double") / col("__cn").cast("double"))
            / (col("__tp").cast("double") / col("__tn").cast("double")))
          .cast(stable), roundDigits).cast("double").as("cum_lift"))
  }

  /** X198 — average precision (area under the precision–recall
    * curve, the step-wise sklearn definition):
    * `AP = Σ_k (R_k − R_{k−1})·P_k` over distinct score thresholds
    * descending — THE ranking metric for imbalanced positives, where
    * x133's ROC AUC is inflated by the easy negatives (AP's baseline
    * is the prevalence, not 0.5). Ties handle at threshold
    * granularity: all rows sharing a score enter together, so the
    * result is permutation-independent by construction.
    *
    * Shape: one count aggregate to distinct-score cardinality, two
    * cumulative windows over THAT frame (the rocAuc discipline —
    * never a rank window over rows), each threshold's
    * `(Δtp/P)·precision` term rounded to DECIMAL(18,8) BEFORE the
    * exact sum (round-then-add), one final round. No positives →
    * null AP.
    *
    * AP's primary input IS a continuous model score, where distinct ≈
    * rows and the two global windows pin one task at 100 TB: pass
    * `bins > 0` ([[quantize]]) to bound both windows at `bins` rows.
    * Binned AP is PR-curve area at threshold granularity `bins` —
    * exact when scores already sit on a ≤bins grid (monotone map),
    * the standard sketch otherwise.
    */
  def averagePrecision(df: DataFrame, label: Column, score: Column,
      bins: Int = 0, roundDigits: Int = 6): DataFrame = {
    val raw = quantize(
      df.filter(score.isNotNull)
        .select(score.cast("double").as("__s"),
          when(label, lit(1L)).otherwise(lit(0L)).as("__y")),
      "__s", bins)
    val perScore = raw.groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"))
    apFromScoreCounts(perScore, roundDigits)
  }

  /** [[averagePrecision]]'s second half: the AP fold over an already-
    * collapsed `(__s, __n, __p)` distinct-score count frame. Factored
    * out (r15) so the STREAMING monitor's per-bin running counts
    * ([[graft.streaming.Stateful.binCountsMonitor]]) roll up through
    * the EXACT batch code path — stream ≡ batch by construction. */
  private[graft] def apFromScoreCounts(
      perScore: DataFrame, roundDigits: Int): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    // cumulative from the TOP score down, over distinct-score
    // cardinality only
    val w = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // the no-positive case guards INSIDE the term: ANSI mode raises on
    // the 0-denominator before the outer when() could mask it
    val term = when(col("__np") > 0, round(
      ((col("__p").cast("double") / col("__np"))
        * (col("__cp").cast("double") / col("__cn"))).cast(stable), 8))
    perScore
      .withColumn("__cn", sum(col("__n")).over(w))
      .withColumn("__cp", sum(col("__p")).over(w))
      .withColumn("__np", sum(col("__p")).over(tot))
      .withColumn("__nt", sum(col("__n")).over(tot))
      .agg(
        first(col("__np")).as("n_pos"),
        (first(col("__nt")) - first(col("__np"))).as("n_neg"),
        round(when(first(col("__np")) > 0, sum(term).cast("double"))
          .cast(stable), roundDigits).cast("double")
          .as("average_precision"))
  }

  /** X201 — Kendall's τ-b rank correlation from the CONTINGENCY CELLS
    * of (x, y) in Knight's prefix-sum concordance form (Knight, JASA
    * 1966: concordance from a sort, not a pair scan): per cell, with
    * the dense Dx×Dy value grid carrying 2-D prefix sums
    *   F = N(x′ <  x, y′ = y)   (per-y prefix over x)
    *   G = N(x′ <  x, y′ < y)   (per-x prefix of F over y)
    *   cumx = N(x′ < x)         (full-frame per-x sum of F)
    * the concordant/discordant ordered-pair counts are
    * `P = Σ n·G` and `Q = Σ n·(cumx − G − F)` — each pair counted
    * exactly once at its larger-x cell. Tie terms come from the
    * marginals, and `τ_b = (P − Q)/√((n₀−t_x)(n₀−t_y))` — the
    * tie-adjusted concordance test that [[spearman]]'s midrank form
    * doesn't give (τ has a direct probabilistic reading:
    * P(concordant) − P(discordant)).
    *
    * Scale shape (r15 verdict): the previous form joined ordered CELL
    * pairs (`x₁ < x₂`, a nested-loop θ-join) — bounded under the bins
    * contract but quadratic-pair work, and a caller who forgot `bins`
    * on a continuous column got distinct²-pair blowup. The grid form
    * is linear in Dx·Dy (the same bound that already bounds the cell
    * table), every window partition is bins-bounded, and NO join in
    * the plan carries a non-equi condition (the grid is generated by
    * the house 1-row scalar-broadcast + explode idiom; EvaluationSpec
    * pins the absence of cartesian/nested-loop-θ nodes at any bins).
    * The operator's domain is ordinal/categorical columns; for
    * continuous inputs pass `bins > 0` ([[quantize]], per side) to
    * bound the grid at bins² — monotone binning preserves concordance
    * on grid data exactly. All pair products run in DECIMAL (exact to
    * 10¹² rows/side); the one float chain is the final ratio,
    * stabilized through DECIMAL(18,8). Either side constant → null τ,
    * not a division error.
    */
  def kendallTauB(df: DataFrame, x: Column, y: Column,
      bins: Int = 0, roundDigits: Int = 6,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
      : DataFrame = {
    val d12 = org.apache.spark.sql.types.DecimalType(12, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val raw0 = df.filter(x.isNotNull && y.isNotNull)
      .select(x.cast("double").as("__x"), y.cast("double").as("__y"))
    val raw = quantize(quantize(raw0, "__x", bins), "__y", bins)
    // persisted: the pair join reads cells twice and the tie/total
    // marginals twice more — ONE input scan instead of five (the
    // chiSquareFull rule)
    val cells = scope.persist(raw.groupBy(col("__x"), col("__y"))
      .agg(count(lit(1)).as("__n")))
    // dense Dx×Dy grid (missing cells carry n = 0): the y domain is a
    // 1-row bounded array (the scalar-broadcast idiom), exploded per
    // distinct x — the only joins are a 1-row cross and an equi-join
    val yDomain = cells.agg(sort_array(collect_set(col("__y"))).as("__ys"))
    val grid = cells.select(col("__x")).distinct()
      .crossJoin(broadcast(yDomain))
      .select(col("__x"), explode(col("__ys")).as("__y"))
      .join(cells, Seq("__x", "__y"), "left")
      .select(col("__x"), col("__y"),
        coalesce(col("__n"), lit(0L)).as("__n"))
    // Knight-form prefix sums (see scaladoc): F, G, cumx per grid
    // point; every window partition is one axis value — bins-bounded
    val wF = Window.partitionBy(col("__y")).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wG = Window.partitionBy(col("__x")).orderBy(col("__y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wX = Window.partitionBy(col("__x"))
    val pq = grid
      .withColumn("__F", coalesce(sum(col("__n")).over(wF), lit(0L)))
      .withColumn("__G", coalesce(sum(col("__F")).over(wG), lit(0L)))
      .withColumn("__cumx", sum(col("__F")).over(wX))
      .filter(col("__n") > 0) // back to the real cells
      .agg(
        sum((col("__n").cast(d12) * col("__G").cast(d12)).cast(d38))
          .as("__P"),
        sum((col("__n").cast(d12)
          * (col("__cumx") - col("__G") - col("__F")).cast(d12))
          .cast(d38)).as("__Q"))
    def pairs2(c: Column): Column = {
      val n = c.cast(d12)
      ((n * (n - 1)).cast(d38) / 2).cast(d38)
    }
    val tx = cells.groupBy(col("__x")).agg(sum(col("__n")).as("__nx"))
      .agg(sum(pairs2(col("__nx"))).as("__tx"))
    val ty = cells.groupBy(col("__y")).agg(sum(col("__n")).as("__ny"))
      .agg(sum(pairs2(col("__ny"))).as("__ty"))
    val tot = cells.agg(sum(col("__n")).as("__nr"))
      .select(col("__nr"), pairs2(col("__nr")).as("__n0"))
    pq.crossJoin(broadcast(tot)).crossJoin(broadcast(tx))
      .crossJoin(broadcast(ty))
      .select(col("__nr").as("n"),
        round(when(col("__n0") > col("__tx") && col("__n0") > col("__ty"),
          (col("__P") - col("__Q")).cast("double")
            / sqrt((col("__n0") - col("__tx")).cast("double")
              * (col("__n0") - col("__ty")).cast("double")))
          .cast(stable), roundDigits).cast("double").as("tau_b"))
  }

  /** X202 — Mann–Whitney U (two-sample rank-sum) with the normal
    * approximation: `U_A = R_A − n_A(n_A+1)/2` over pooled midranks,
    * `z = (U_A − n_A·n_B/2) / σ` with the tie-corrected
    * `σ² = (n_A·n_B/12)·((n+1) − Σ(t³−t)/(n(n−1)))` — the two-sample
    * location test behind [[rocAuc]]'s identity (U/(n_A·n_B) IS the
    * AUC), reported as the test statistic a drift monitor thresholds
    * on. No continuity correction (both engines then share one float
    * chain).
    *
    * Midranks per DISTINCT pooled value (the [[spearman]] machinery);
    * `bins > 0` ([[quantize]]) bounds the window for continuous
    * columns. Rank sums run exactly in DECIMAL(28,6); the tie cube
    * runs in DECIMAL(12,0)³ (the [[kruskalWallis]] overflow rule).
    * Degenerate inputs (either side empty, or all values tied → σ = 0)
    * emit null z.
    */
  def mannWhitneyU(df: DataFrame, sideA: Column, sideB: Column,
      value: Column, bins: Int = 0, roundDigits: Int = 4): DataFrame = {
    val d12 = org.apache.spark.sql.types.DecimalType(12, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    def cubeMinus(c: Column): Column = {
      val n = c.cast(d12)
      (n * n * n).cast(d38) - n
    }
    val raw0 = df.filter((sideA || sideB) && value.isNotNull)
      .select(value.cast("double").as("__v"),
        when(sideA, lit(1L)).otherwise(lit(0L)).as("__a"))
    val raw = quantize(raw0, "__v", bins)
    val perVal = raw.groupBy(col("__v"))
      .agg(count(lit(1)).as("__n"), sum(col("__a")).as("__na"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perVal.select(col("__na"), col("__n"),
      (coalesce(sum(col("__n")).over(w), lit(0L))
        + (col("__n") + 1) / lit(2.0d)).as("__r"))
    val agg = ranked.agg(
      sum(col("__na")).as("__nA"),
      sum(col("__n") - col("__na")).as("__nB"),
      sum(col("__n")).as("__N"),
      sum((col("__na") * col("__r")).cast(dec)).as("__RA"),
      sum(cubeMinus(col("__n"))).as("__T"))
    val nA = col("__nA").cast("double")
    val nB = col("__nB").cast("double")
    val nT = col("__N").cast("double")
    val u = col("__RA").cast("double") - nA * (nA + 1) / lit(2.0d)
    val var0 = nA * nB / lit(12.0d) *
      ((nT + 1) - col("__T").cast("double") / (nT * (nT - 1)))
    agg.select(
      col("__nA").as("n_a"), col("__nB").as("n_b"),
      round(when(col("__nA") > 0 && col("__nB") > 0, u)
        .cast(stable), roundDigits).cast("double").as("u_a"),
      round(when(col("__nA") > 0 && col("__nB") > 0 &&
          col("__N") > 1 && var0 > 0,
        (u - nA * nB / lit(2.0d)) / sqrt(var0))
        .cast(stable), roundDigits).cast("double").as("z"))
  }

  /** X203 — Jensen–Shannon divergence between two slices of a
    * CATEGORICAL column: `JSD = ½·KL(p_A‖m) + ½·KL(p_B‖m)` with
    * `m = (p_A+p_B)/2` — the symmetric, always-finite drift measure
    * for discrete distributions ([[psi]] needs binning and blows up
    * on empty cells; [[ksTest]] is ordinal-only; JSD is the one that
    * works on unordered categories with disjoint support). Emitted in
    * nats plus `jsd_norm = JSD/ln 2 ∈ [0,1]` (1 = disjoint support).
    *
    * One cell aggregate to category cardinality + a 1-row broadcast
    * of totals; each category's two KL terms compute as single IEEE
    * chains over exact counts, round to DECIMAL(18,8) BEFORE the
    * exact sum (round-then-add), and absent-on-one-side categories
    * contribute only the present side's term (the lim p→0 p·ln = 0
    * convention).
    */
  def jensenShannon(df: DataFrame, sideA: Column, sideB: Column,
      value: Column, roundDigits: Int = 6,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
      : DataFrame = {
    val cells = scope.persist(df.filter(sideA || sideB)
      .select(value.cast("string").as("__v"),
        when(sideA, lit(1L)).otherwise(lit(0L)).as("__a"),
        when(sideB, lit(1L)).otherwise(lit(0L)).as("__b"))
      .groupBy(col("__v"))
      .agg(sum(col("__a")).as("__na"), sum(col("__b")).as("__nb")))
    jensenShannonFromCells(cells, roundDigits)
  }

  /** [[jensenShannon]]'s tail from pre-aggregated per-category cells
    * (__v, __na, __nb) — the from-counts entry the STREAMING
    * community-drift monitor rolls its live size histogram through
    * ([[graft.streaming.Stateful.membershipDeltaMonitor]]): identical
    * float chain, so the live JSD at any point equals the batch JSD
    * over the equivalent two-slice frame (spec-pinned). */
  def jensenShannonFromCells(cells: DataFrame, roundDigits: Int = 6)
      : DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    // totals named apart from the cell counts: Spark's default
    // case-insensitive resolution would see "__NA" == "__na"
    val tot = cells.agg(sum(col("__na")).as("__ta"),
      sum(col("__nb")).as("__tb"))
    val pa = col("__na").cast("double") / col("__ta")
    val pb = col("__nb").cast("double") / col("__tb")
    val m = (pa + pb) / lit(2.0d)
    val termA = when(col("__na") > 0, round((pa * log(pa / m))
      .cast(stable), 8)).otherwise(lit(0).cast(stable))
    val termB = when(col("__nb") > 0, round((pb * log(pb / m))
      .cast(stable), 8)).otherwise(lit(0).cast(stable))
    cells.crossJoin(broadcast(tot))
      .agg(first(col("__ta")).as("n_a"), first(col("__tb")).as("n_b"),
        sum(termA).as("__ka"), sum(termB).as("__kb"))
      .select(col("n_a"), col("n_b"),
        round(when(col("n_a") > 0 && col("n_b") > 0,
          (col("__ka").cast("double") + col("__kb").cast("double"))
            / lit(2.0d)).cast(stable), roundDigits)
          .cast("double").as("jsd"),
        round(when(col("n_a") > 0 && col("n_b") > 0,
          ((col("__ka").cast("double") + col("__kb").cast("double"))
            / lit(2.0d)) / lit(math.log(2.0))).cast(stable), roundDigits)
          .cast("double").as("jsd_norm"))
  }

  /** X205 — Lorenz curve table: values sort ascending (ties by
    * `tieBreaker`), split into k equal-population buckets by GLOBAL
    * rank, and each bucket reports its size, value total, and the
    * cumulative share held by the bottom 1..i buckets — [[gini]]'s
    * full distributional picture (gini is twice the area between this
    * curve and the diagonal; the table answers "what share do the
    * bottom 30% hold", which the scalar can't).
    *
    * Scale shape: global ranks via
    * [[graft.operators.Relational.chunkedRank]] (no single-partition
    * window, no RDD round-trip); bucket = ⌊rank·k/n⌋ capped — pure
    * arithmetic on the rank, n from a 1-row broadcast; one counting
    * aggregate to k rows; the cumulative window runs over the k-row
    * bucket table only. Value sums in DECIMAL(28,6) (exact,
    * association-free); shares stabilize through DECIMAL(18,8).
    */
  def lorenzCurve(df: DataFrame, value: Column, tieBreaker: Column,
      k: Int = 10, roundDigits: Int = 6,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
      : DataFrame = {
    require(k >= 2 && k <= 1000, s"need 2 <= k <= 1000 buckets, got $k")
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val rows = df.filter(value.isNotNull)
      .select(value.cast(dec).as("__x"), tieBreaker.as("__t"))
    val ranked = graft.operators.Relational
      .chunkedRank(rows, Seq(col("__x"), col("__t")), "__i", scope)
    val n1 = ranked.agg(count(lit(1)).as("__n"))
    // rank·k stays far below 2^53, so the double floor is exact and
    // engine-identical (the SQL twin has no integer-division `/`)
    val bucket = least(
      floor(col("__i").cast("double") * k / col("__n")) + 1, lit(k))
    val byBucket = ranked.crossJoin(broadcast(n1))
      .groupBy(bucket.cast("bigint").as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__s"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byBucket
      .withColumn("__cs", sum(col("__s")).over(wCum))
      .withColumn("__ts", sum(col("__s")).over(tot))
      .select(col("bucket"), col("n"),
        round(col("__s").cast("double"), 2).as("total"),
        round(when(col("__ts") > 0,
          col("__cs").cast("double") / col("__ts").cast("double"))
          .cast(stable), roundDigits).cast("double").as("cum_share"))
  }

  /** X211 — correlation ratio η² of a numeric column across a
    * categorical grouping: `η² = SS_between / SS_total` — "how much of
    * this metric's variance does the category explain", the
    * numeric-target feature screen next to [[graft.operators.Profiling
    * .infoGainReport]] (which needs a categorical label) and
    * [[kruskalWallis]] (which tests the same question but answers
    * with a p-statistic, not a variance share).
    *
    * One per-group moment aggregate (n, Σv, Σv² — exact decimals),
    * one group-cardinality rollup. Each group's `(Σv)²/n` term rounds
    * to DECIMAL(28,8) BEFORE the exact sum (round-then-add — the
    * [[kruskalWallis]] discipline); η² is one final float chain.
    * Zero total variance → null, not a division error.
    */
  def etaSquared(df: DataFrame, group: Column, value: Column,
      roundDigits: Int = 6): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(24, 6)
    val q12 = org.apache.spark.sql.types.DecimalType(24, 12)
    val term = org.apache.spark.sql.types.DecimalType(28, 8)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val v6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val raw = df.filter(group.isNotNull && value.isNotNull)
      .select(group.cast("string").as("__g"),
        value.cast(v6).as("__v"))
    val byG = raw.groupBy(col("__g")).agg(
      count(lit(1)).as("__ng"),
      sum(col("__v")).cast(dec).as("__sv"),
      sum((col("__v") * col("__v")).cast(q12)).cast(q12).as("__svv"))
    val m = byG.agg(
      sum(col("__ng")).as("__N"),
      count(lit(1)).as("n_groups"),
      sum(col("__sv")).cast(dec).as("__SV"),
      sum(col("__svv")).cast(q12).as("__SVV"),
      sum(round((col("__sv").cast("double") * col("__sv").cast("double")
        / col("__ng")).cast(term), 8)).as("__S"))
    val nD = col("__N").cast("double")
    val grand = col("__SV").cast("double") * col("__SV").cast("double") / nD
    val ssTot = col("__SVV").cast("double") - grand
    val ssB = col("__S").cast("double") - grand
    m.select(col("__N").as("n"), col("n_groups"),
      round(when(ssTot > 0, ssB / ssTot).cast(stable), roundDigits)
        .cast("double").as("eta_sq"))
  }

  /** X212 — two-sample Cramér–von Mises statistic
    * `T = (n_A·n_B/N²)·Σ_z (F_A(z) − F_B(z))²` summed over every
    * pooled observation — the INTEGRAL-gap drift test completing
    * [[ksTest]] (KS sees only the single worst point; CvM accumulates
    * the whole curve, so a persistent small shift that never produces
    * one big gap still scores). Same engine shape as KS: one distinct-
    * value aggregate, cumulative windows over value cardinality,
    * `bins > 0` ([[quantize]]) for continuous 100 TB columns.
    *
    * Each value's `n_z·(F_A−F_B)²` term is one IEEE chain over exact
    * counts rounded to DECIMAL(18,8) BEFORE the exact sum
    * (round-then-add); the (n_A·n_B/N²) prefactor is one final float
    * chain. Either side empty → null.
    */
  def cramerVonMises(df: DataFrame, sideA: Column, sideB: Column,
      value: Column, bins: Int = 0, roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val raw0 = df.filter((sideA || sideB) && value.isNotNull)
      .select(value.cast("double").as("__v"),
        when(sideA, lit(1L)).otherwise(lit(0L)).as("__a"),
        when(sideB, lit(1L)).otherwise(lit(0L)).as("__b"))
    val raw = quantize(raw0, "__v", bins)
    val perVal = raw.groupBy(col("__v"))
      .agg(count(lit(1)).as("__n"), sum(col("__a")).as("__na"),
        sum(col("__b")).as("__nb"))
    val wCum = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    // bounded: both windows run over the distinct-value frame
    val cdf = perVal
      .withColumn("__ca", sum(col("__na")).over(wCum))
      .withColumn("__cb", sum(col("__nb")).over(wCum))
      .withColumn("__ta", sum(col("__na")).over(wAll))
      .withColumn("__tb", sum(col("__nb")).over(wAll))
    val diff = (col("__ca").cast("double") / col("__ta")
      - col("__cb").cast("double") / col("__tb"))
    val tTerm = when(col("__ta") > 0 && col("__tb") > 0,
      round((col("__n").cast("double") * diff * diff).cast(stable), 8))
    cdf.agg(
        max(col("__ta")).as("n_a"), max(col("__tb")).as("n_b"),
        sum(tTerm).as("__s"))
      .select(col("n_a"), col("n_b"),
        round(when(col("n_a") > 0 && col("n_b") > 0,
          col("n_a").cast("double") * col("n_b")
            / (((col("n_a") + col("n_b")).cast("double"))
              * ((col("n_a") + col("n_b")).cast("double")))
            * col("__s").cast("double")).cast(stable), roundDigits)
          .cast("double").as("cvm"))
  }

  /** X214 — Cohen's κ inter-rater agreement between two categorical
    * columns over a SHARED label space: `κ = (p_o − p_e)/(1 − p_e)`
    * with observed agreement `p_o = Σ_k n_kk/N` and chance agreement
    * `p_e = Σ_k r_k·c_k/N²` — THE metric an LLM-labeling pipeline
    * runs between two annotators (model vs model, model vs human,
    * rule vs rule) before trusting either; raw agreement alone is
    * inflated by imbalanced label priors, which κ discounts.
    *
    * One cell aggregate + two marginals derived from it (the
    * mutualInfo one-scan shape); the chance term Σ r_k·c_k runs in
    * DECIMAL(12,0)² → exact to 10¹² rows; κ is one float chain over
    * exact operands. Rows missing either rating are excluded
    * (standard convention). Degenerate p_e = 1 (both raters constant
    * on the same label) → null κ.
    */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column,
      roundDigits: Int = 6,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
      : DataFrame = {
    val d12 = org.apache.spark.sql.types.DecimalType(12, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    // persisted: agreement + both marginals read cells — one scan
    val cells = scope.persist(df.filter(raterA.isNotNull && raterB.isNotNull)
      .select(raterA.cast("string").as("__ra"),
        raterB.cast("string").as("__rb"))
      .groupBy(col("__ra"), col("__rb")).agg(count(lit(1)).as("__n")))
    val agree = cells.agg(
      sum(col("__n")).as("__N"),
      sum(when(col("__ra") === col("__rb"), col("__n"))
        .otherwise(lit(0L))).as("__d"))
    val margA = cells.groupBy(col("__ra")).agg(sum(col("__n")).as("__ma"))
    val margB = cells.groupBy(col("__rb")).agg(sum(col("__n")).as("__mb"))
    // chance agreement pairs labels ACROSS raters by label equality
    val chance = margA.join(margB, col("__ra") === col("__rb"))
      .agg(coalesce(sum((col("__ma").cast(d12) * col("__mb").cast(d12))
        .cast(d38)), lit(0).cast(d38)).as("__pe"))
    val nD = col("__N").cast("double")
    val po = col("__d").cast("double") / nD
    val pe = col("__pe").cast("double") / (nD * nD)
    agree.crossJoin(broadcast(chance))
      .select(col("__N").as("n"),
        round(po.cast(stable), roundDigits).cast("double").as("p_observed"),
        round(pe.cast(stable), roundDigits).cast("double").as("p_expected"),
        round(when(col("__N") > 0 && pe < 1.0,
          (po - pe) / (lit(1.0d) - pe)).cast(stable), roundDigits)
          .cast("double").as("kappa"))
  }

  /** X217 — per-query ranking metrics: NDCG@k (linear gain — the
    * 2^rel−1 form needs libm pow and overflows graded scales), MRR@k,
    * precision@k and recall@k, one row per query group — THE offline
    * eval battery for a retrieval/recommendation pipeline, where
    * [[rocAuc]]/[[averagePrecision]] score a single global ranking
    * and this scores EVERY query's ranking (the list a user actually
    * saw).
    *
    * Shape: two rank windows per query group (by score desc and by
    * relevance desc, both tie-broken by `tieBreaker` — deterministic
    * end-to-end), each bounded by the group's candidate count — the
    * per-query candidate set is bounded by construction in any
    * retrieval eval (top-N candidates per query, never the corpus).
    * DCG/IDCG terms `rel / (ln(r+1)/ln 2)` round to DECIMAL(18,8)
    * BEFORE the exact sum (round-then-add; the ln-parity discipline —
    * ln2 is the Scala-printed literal, never re-derived); NDCG is one
    * final division. No relevant items in a group → null NDCG/MRR,
    * recall null (undefined), precision 0.
    */
  def rankingMetrics(df: DataFrame, group: Column, score: Column,
      relevance: Column, tieBreaker: Column, k: Int,
      roundDigits: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val ln2 = 0.6931471805599453
    val rows = df.filter(score.isNotNull && relevance.isNotNull)
      .select(group.as("__g"), score.cast("double").as("__s"),
        relevance.cast("double").as("__rel"), tieBreaker.as("__t"))
    val byScore = Window.partitionBy(col("__g"))
      .orderBy(col("__s").desc, col("__t"))
    val byRel = Window.partitionBy(col("__g"))
      .orderBy(col("__rel").desc, col("__t"))
    val ranked = rows
      .withColumn("__r", row_number().over(byScore))
      .withColumn("__ri", row_number().over(byRel))
    def dcgTerm(r: Column): Column =
      round((col("__rel") / (log(r.cast("double") + 1) / lit(ln2)))
        .cast(stable), 8)
    ranked.groupBy(col("__g").as("query"))
      .agg(
        count(lit(1)).as("n_items"),
        sum((col("__rel") > 0).cast("long")).as("__npos"),
        sum(when(col("__r") <= k, dcgTerm(col("__r")))
          .otherwise(lit(0).cast(stable))).as("__dcg"),
        sum(when(col("__ri") <= k, dcgTerm(col("__ri")))
          .otherwise(lit(0).cast(stable))).as("__idcg"),
        min(when(col("__r") <= k && col("__rel") > 0, col("__r")))
          .as("__fr"),
        sum((col("__r") <= k && col("__rel") > 0).cast("long"))
          .as("__hits"))
      .select(col("query"), col("n_items"),
        round(when(col("__idcg") > 0,
          col("__dcg").cast("double") / col("__idcg").cast("double"))
          .cast(stable), roundDigits).cast("double").as(s"ndcg_$k"),
        round(when(col("__fr").isNotNull,
          lit(1.0d) / col("__fr")).cast(stable), roundDigits)
          .cast("double").as(s"mrr_$k"),
        round((col("__hits").cast("double") / k).cast(stable),
          roundDigits).cast("double").as(s"precision_$k"),
        round(when(col("__npos") > 0,
          col("__hits").cast("double") / col("__npos")).cast(stable),
          roundDigits).cast("double").as(s"recall_$k"))
  }

  /** X218 — empirical-Bayes beta-binomial rate shrinkage: per-key
    * success rates pulled toward the corpus prior in proportion to
    * their evidence, `shrunk = (α + s) / (α + β + t)` with (α, β)
    * fitted by method of moments over the observed per-key rates
    * (`c = m(1−m)/v − 1, α = m·c`) — THE fix for the
    * sparse-denominator trap in any rate ranking (a 1/1 item must not
    * outrank a 950/1000 one: CTR smoothing, seller ratings, defect
    * rates, per-source quality pass rates).
    *
    * One per-key counting aggregate; the prior is ONE 1-row moment
    * aggregate over key-cardinality rows, broadcast back — per-rate
    * and per-rate² terms round to DECIMAL(18,8) BEFORE their exact
    * sums (round-then-add; a raw double sum would be
    * addition-order-dependent), m and v are single float chains over
    * those exact operands. Degenerate priors (v = 0 — all rates
    * equal — or a non-positive concentration) emit null shrunk rates;
    * keys with zero trials are excluded.
    */
  def betaShrunkRates(df: DataFrame, keyCol: String,
      success: Column, trial: Column,
      roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val byKey = df.groupBy(col(keyCol))
      .agg(sum(success.cast("long")).as("__s"),
        sum(trial.cast("long")).as("__t"))
      .filter(col("__t") > 0)
    val rate = col("__s").cast("double") / col("__t")
    val moments = byKey.agg(
      count(lit(1)).as("__k"),
      sum(round(rate.cast(stable), 8)).as("__sr"),
      sum(round((rate * rate).cast(stable), 8)).as("__srr"))
    val kD = col("__k").cast("double")
    val m = col("__sr").cast("double") / kD
    val v = (col("__srr").cast("double") - col("__sr").cast("double")
      * col("__sr").cast("double") / kD) / (kD - 1)
    val c = m * (lit(1.0d) - m) / v - 1
    val prior = moments.select(
      when(col("__k") > 1 && v > 0 && c > 0, m * c).as("__alpha"),
      when(col("__k") > 1 && v > 0 && c > 0, (lit(1.0d) - m) * c)
        .as("__beta"))
    byKey.crossJoin(broadcast(prior))
      .select(col(keyCol), col("__t").as("trials"),
        col("__s").as("successes"),
        round(rate.cast(stable), roundDigits).cast("double")
          .as("raw_rate"),
        round(((col("__alpha") + col("__s"))
          / (col("__alpha") + col("__beta") + col("__t")))
          .cast(stable), roundDigits).cast("double").as("shrunk_rate"))
  }

  /** X219 — Wilson score interval per key: the [lo, hi] confidence
    * band for a binomial rate that stays sane at small n and extreme
    * p (the normal approximation's ±z√(pq/n) collapses to a zero
    * band at 0/1 successes; Wilson never does) — and `wilson_lo` IS
    * the standard "sort by rating" answer next to
    * [[betaShrunkRates]]' posterior mean: rank by the LOWER bound and
    * a 1/1 item can't outrank a 95/100 one.
    *
    * One per-key counting aggregate; lo/hi are single float chains
    * over exact integer counts with `z` a Scala-printed literal
    * (default 1.96, the 95% two-sided normal quantile), stabilized
    * through DECIMAL(18,8). Keys with zero trials are excluded.
    */
  def wilsonInterval(df: DataFrame, keyCol: String,
      success: Column, trial: Column,
      z: Double = 1.96, roundDigits: Int = 6): DataFrame = {
    require(z > 0, s"z must be positive: $z")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val byKey = df.groupBy(col(keyCol))
      .agg(sum(success.cast("long")).as("__s"),
        sum(trial.cast("long")).as("__t"))
      .filter(col("__t") > 0)
    val n = col("__t").cast("double")
    val p = col("__s").cast("double") / n
    val z2 = z * z
    val denom = lit(1.0d) + lit(z2) / n
    val center = p + lit(z2) / (lit(2.0d) * n)
    val spread = lit(z) * sqrt(p * (lit(1.0d) - p) / n
      + lit(z2) / (lit(4.0d) * n * n))
    byKey.select(col(keyCol), col("__t").as("trials"),
      col("__s").as("successes"),
      round(p.cast(stable), roundDigits).cast("double").as("rate"),
      round(((center - spread) / denom).cast(stable), roundDigits)
        .cast("double").as("wilson_lo"),
      round(((center + spread) / denom).cast(stable), roundDigits)
        .cast("double").as("wilson_hi"))
  }

  /** X220 — CUPED variance reduction (Deng et al., WSDM'13): adjust
    * each unit's experiment metric by its PRE-period covariate,
    * `y_adj = y − θ·(x − x̄)` with `θ = cov(x, y)/var(x)` — the
    * standard "use last month's behavior to cancel this month's
    * noise" trick that shrinks A/B confidence intervals for free. The
    * 1-row summary reports θ and the variance reduction share
    * `cov²/(var_x·var_y)` (= the squared pre/post correlation — the
    * fraction of metric variance the covariate explains), which is
    * the go/no-go number for adopting CUPED on a metric.
    *
    * ONE per-unit aggregate (conditional pre/post sums off a single
    * input scan) + ONE 1-row exact-decimal moment aggregate; θ and
    * the reduction are single float chains over exact operands.
    * Degenerate var_x = 0 or var_y = 0 → null θ/reduction.
    */
  def cupedSummary(df: DataFrame, unitCol: String,
      isPre: Column, isPost: Column, value: Column,
      roundDigits: Int = 6): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(24, 6)
    val q12 = org.apache.spark.sql.types.DecimalType(28, 12)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val v6 = org.apache.spark.sql.types.DecimalType(18, 6)
    // per-unit sums clamp to DECIMAL(18,6): the x·y moment products
    // must stay under precision 38 ((18,6)² = (37,12)) — a (24,6)²
    // product overflows 38 and the two engines degrade differently
    val perUnit = df.filter((isPre || isPost) && value.isNotNull)
      .groupBy(col(unitCol))
      .agg(
        sum(when(isPre, value.cast(v6)).otherwise(lit(0).cast(v6)))
          .cast(v6).as("__x"),
        sum(when(isPost, value.cast(v6)).otherwise(lit(0).cast(v6)))
          .cast(v6).as("__y"))
    val m = perUnit.agg(
      count(lit(1)).as("__n"),
      sum(col("__x")).cast(dec).as("__sx"),
      sum(col("__y")).cast(dec).as("__sy"),
      sum((col("__x") * col("__y")).cast(q12)).cast(q12).as("__sxy"),
      sum((col("__x") * col("__x")).cast(q12)).cast(q12).as("__sxx"),
      sum((col("__y") * col("__y")).cast(q12)).cast(q12).as("__syy"))
    val n = col("__n").cast("double")
    def d(c: String): Column = col(c).cast("double")
    val covN = d("__sxy") - d("__sx") * d("__sy") / n
    val varXN = d("__sxx") - d("__sx") * d("__sx") / n
    val varYN = d("__syy") - d("__sy") * d("__sy") / n
    m.select(col("__n").as("n_units"),
      round(when(varXN > 0, covN / varXN).cast(stable), roundDigits)
        .cast("double").as("theta"),
      round(when(col("__n") > 1, varYN / (n - 1)).cast(stable),
        roundDigits).cast("double").as("var_post"),
      round(when(varXN > 0 && varYN > 0 && col("__n") > 1,
        (varYN - covN * covN / varXN) / (n - 1)).cast(stable),
        roundDigits).cast("double").as("var_adjusted"),
      round(when(varXN > 0 && varYN > 0,
        covN * covN / (varXN * varYN)).cast(stable), roundDigits)
        .cast("double").as("variance_reduction"))
  }

  /** X221 — mSPRT always-valid sequential test (mixture sequential
    * probability ratio test; Johari, Pekelis, Walsh, "Peeking at A/B
    * Tests", KDD'17): the SEQUENTIAL complement to the fixed-horizon
    * A/B tier ([[wilsonInterval]], [[cupedSummary]], two-proportion
    * z) — its p-value stays valid under CONTINUOUS monitoring, so a
    * dashboard refreshed every batch cannot manufacture significance
    * by stopping on a lucky peek. For the asymptotically normal
    * difference `Δ̂ = x̄_T − x̄_C` with estimated variance
    * `V = s²_T/n_T + s²_C/n_C` and a N(0, τ²) mixing prior over the
    * effect, the mixture likelihood ratio has the closed form
    *   ln Λ = ½·ln(V/(V+τ²)) + Δ̂²·τ² / (2·V·(V+τ²))
    * and `p = min(1, 1/Λ)` is an always-valid p-value: reject when
    * ln Λ ≥ ln(1/α). τ sets the prior effect scale (match it to the
    * smallest effect worth detecting; detection speed, not validity,
    * is what it tunes).
    *
    * ONE counting/moment aggregate over one input scan (conditional
    * per-arm sums, the [[cupedSummary]] shape); the statistic is a
    * single float chain over exact DECIMAL moments, stabilized
    * through DECIMAL(18,8) — engine-portable, τ²/ln(1/α) are
    * Scala-printed literals. Degenerate arms (n < 2 either side, or
    * zero variance) emit null statistic columns. The factored
    * [[msprtFromMoments]] rollup is shared verbatim by the streaming
    * moments monitor ([[graft.streaming.Stateful.msprtMomentsMonitor]])
    * so live emissions roll up bit-identical to this batch result.
    */
  def msprt(df: DataFrame, isTreat: Column, isControl: Column,
      value: Column, tau: Double = 0.1, alpha: Double = 0.05,
      roundDigits: Int = 6, keyCols: Seq[String] = Nil): DataFrame =
    msprtFromMoments(msprtMoments(df, isTreat, isControl, value, keyCols),
      tau, alpha, roundDigits, keyCols)

  /** The per-arm count/moment aggregate behind [[msprt]]: one row of
    * exact-decimal (n, Σv, Σv²) per arm — per `keyCols` group when
    * given (one sequential test per metric key, the input shape
    * [[bhFdr]] corrects across) — off a single input scan. A row
    * claimed by BOTH predicates counts as treatment (they should be
    * disjoint; the guard keeps the sums consistent either way). */
  private[graft] def msprtMoments(df: DataFrame, isTreat: Column,
      isControl: Column, value: Column,
      keyCols: Seq[String] = Nil): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(24, 6)
    val q12 = org.apache.spark.sql.types.DecimalType(28, 12)
    val v6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val rows = df.filter((isTreat || isControl) && value.isNotNull)
      .select(keyCols.map(col) ++ Seq(
        when(isTreat, lit(1L)).otherwise(lit(0L)).as("__t"),
        value.cast(v6).as("__v")): _*)
    rows.groupBy(keyCols.map(col): _*).agg(
      sum(col("__t")).as("__na"),
      sum(lit(1L) - col("__t")).as("__nb"),
      sum(when(col("__t") === 1, col("__v")).otherwise(lit(0).cast(v6)))
        .cast(dec).as("__sa"),
      sum(when(col("__t") === 0, col("__v")).otherwise(lit(0).cast(v6)))
        .cast(dec).as("__sb"),
      sum(when(col("__t") === 1, (col("__v") * col("__v")).cast(q12))
        .otherwise(lit(0).cast(q12))).cast(q12).as("__saa"),
      sum(when(col("__t") === 0, (col("__v") * col("__v")).cast(q12))
        .otherwise(lit(0).cast(q12))).cast(q12).as("__sbb"))
  }

  /** [[msprt]]'s statistic chain over a 1-row moment frame
    * (`__na __nb __sa __sb __saa __sbb` — [[msprtMoments]]'s schema,
    * or the latest streaming emissions cast onto it). Factored so the
    * streaming monitor's rollup IS the batch code path. */
  def msprtFromMoments(m: DataFrame, tau: Double, alpha: Double,
      roundDigits: Int = 6, keyCols: Seq[String] = Nil): DataFrame = {
    require(tau > 0, s"tau must be positive: $tau")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val dec = org.apache.spark.sql.types.DecimalType(24, 6)
    val q12 = org.apache.spark.sql.types.DecimalType(28, 12)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    // inputs re-cast onto the batch aggregate's exact types: a
    // stream-fed frame carries wider decimals, same values
    val na = col("__na").cast("long")
    val nb = col("__nb").cast("long")
    def d(c: String, t: org.apache.spark.sql.types.DecimalType): Column =
      col(c).cast(t).cast("double")
    val naD = na.cast("double")
    val nbD = nb.cast("double")
    val ma = d("__sa", dec) / naD
    val mb = d("__sb", dec) / nbD
    val va = (d("__saa", q12) - d("__sa", dec) * d("__sa", dec) / naD) /
      (naD - 1)
    val vb = (d("__sbb", q12) - d("__sb", dec) * d("__sb", dec) / nbD) /
      (nbD - 1)
    val vv = va / naD + vb / nbD
    val delta = ma - mb
    val t2 = lit(tau * tau)
    val logLambda = lit(0.5d) * log(vv / (vv + t2)) +
      delta * delta * t2 / (lit(2.0d) * vv * (vv + t2))
    val ok = na > 1 && nb > 1 && vv > 0
    m.select(keyCols.map(col) ++ Seq(
      na.as("n_treat"), nb.as("n_control"),
      round(when(na > 0, ma).cast(stable), roundDigits)
        .cast("double").as("mean_treat"),
      round(when(nb > 0, mb).cast(stable), roundDigits)
        .cast("double").as("mean_control"),
      round(when(ok, delta).cast(stable), roundDigits)
        .cast("double").as("delta"),
      round(when(ok, logLambda).cast(stable), roundDigits)
        .cast("double").as("log_lambda"),
      round(when(ok, exp(least(lit(0.0d), -logLambda))).cast(stable),
        roundDigits).cast("double").as("p_always_valid"),
      when(ok, (logLambda >= lit(math.log(1.0d / alpha))).cast("int"))
        .as("reject")): _*)
  }

  /** X222 — sample-ratio-mismatch (SRM) check: the chi-square
    * goodness-of-fit of observed arm counts against their DESIGNED
    * split, `χ² = Σ (obsᵢ − ratioᵢ·N)² / (ratioᵢ·N)` — the assignment
    * health gate every experimentation platform runs BEFORE reading a
    * metric (a biased splitter silently invalidates Wilson/CUPED/
    * mSPRT alike; Fabijan et al., "Diagnosing Sample Ratio Mismatch",
    * KDD'19). Arms come from the EXPECTED list (a `k`-row exploded
    * literal — zero-count arms still contribute their full expected
    * mass); rows with arm values outside the design are ignored.
    * `critical` is the published χ² quantile for k−1 df at the chosen
    * level (default 3.841 = df 1, α 0.05).
    *
    * One counting aggregate + a 1-row scalar broadcast; the statistic
    * is a single float chain over exact counts, stabilized through
    * DECIMAL(18,8). */
  def srmCheck(df: DataFrame, arm: Column,
      expected: Seq[(String, Double)],
      critical: Double = 3.841, roundDigits: Int = 6): DataFrame = {
    val armNames = expected.map(_._1)
    val counts = df.select(arm.cast("string").as("__arm"))
      .filter(col("__arm").isin(armNames: _*))
      .groupBy(col("__arm")).agg(count(lit(1)).as("__n"))
    srmFromArmCounts(counts, expected, critical, roundDigits)
  }

  /** [[srmCheck]]'s statistic chain over a per-arm count frame
    * (`__arm __n` — the counting aggregate's schema, or the latest
    * streaming emissions per arm,
    * [[graft.streaming.Stateful.armCountsMonitor]]). Factored so the
    * streaming rollup IS the batch code path. Arms outside the design
    * are ignored; designed arms missing from `counts` still
    * contribute their full expected mass. */
  def srmFromArmCounts(counts: DataFrame,
      expected: Seq[(String, Double)],
      critical: Double = 3.841, roundDigits: Int = 6): DataFrame = {
    require(expected.nonEmpty && expected.forall(_._2 > 0),
      s"expected ratios must be positive: $expected")
    require(math.abs(expected.map(_._2).sum - 1.0) < 1e-9,
      s"expected ratios must sum to 1: $expected")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val armNames = expected.map(_._1)
    // the design as data: explode the expected (arm, ratio) literal so
    // an arm the splitter never emitted still contributes (0 − r·N)²
    val design = counts.sparkSession.range(1).select(
      explode(typedLit(expected)).as("__e"))
      .select(col("__e._1").as("__arm"), col("__e._2").as("__r"))
    // N from a full-frame window over the k-row design-joined table —
    // a second aggregate over `counts` would RESCAN the input (counts
    // feeds the join already; one scan total, r16 plan audit)
    val byArm = design.join(
        counts.filter(col("__arm").isin(armNames: _*)), Seq("__arm"), "left")
      .select(col("__arm"), col("__r"),
        coalesce(col("__n"), lit(0L)).as("__n"))
      .withColumn("__nt", sum(col("__n")).over(Window.partitionBy()))
    val eN = col("__r") * col("__nt").cast("double")
    val dev = col("__n").cast("double") - eN
    val chi = byArm.agg(
      first(col("__nt")).as("n_total"),
      sum(round((dev * dev / eN).cast(stable), 8)).as("__chi"))
    chi.select(col("n_total"),
      lit(expected.size - 1).as("dof"),
      round(col("__chi").cast(stable), roundDigits).cast("double")
        .as("chi_square"),
      when(col("n_total") > 0,
        (round(col("__chi").cast(stable), roundDigits) > lit(critical))
          .cast("int")).as("srm_flag"))
  }

  /** X223 — Benjamini–Hochberg FDR correction over a metrics table
    * (Benjamini & Hochberg, JRSS-B 1995): rank the m p-values
    * ascending, find the largest k with `p₍ₖ₎ ≤ k·q/m`, reject
    * hypotheses 1..k — the multiple-testing discipline an
    * experimentation suite needs the moment it scores MANY metrics
    * per experiment ([[msprt]] with `keyCols` emits exactly this
    * table; per-metric α would inflate the family-wise false
    * discovery rate m-fold). The compare runs as `p·m ≤ r·q` (two
    * float products, no division) and the step-up rule is one
    * running max — every hypothesis at or below the crossing rank
    * rejects, INCLUDING non-monotone stragglers above a smaller
    * passing p (the defining difference from naive per-row
    * thresholding).
    *
    * Scale shape: the input is a METRICS table — k rows by design
    * (one per metric/experiment), so the rank window and the 1-row
    * cutoff broadcast are bounded by contract (the audited k-row
    * window class), never data-sized. Null p-values are excluded;
    * ties break by key for determinism. */
  def bhFdr(df: DataFrame, keyCol: String, pCol: Column,
      q: Double = 0.05, roundDigits: Int = 6): DataFrame = {
    require(q > 0 && q < 1, s"q must be in (0,1): $q")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val rows = df.filter(pCol.isNotNull)
      .select(col(keyCol), pCol.cast("double").as("__p"))
    val w = Window.orderBy(col("__p"), col(keyCol))
    val wAll = Window.partitionBy() // full frame over the k-row table
    val ranked = rows.select(col(keyCol), col("__p"),
      row_number().over(w).cast("long").as("rank"))
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("__k", max(when(
        col("__p") * col("__m").cast("double")
          <= col("rank").cast("double") * lit(q),
        col("rank"))).over(wAll))
    ranked.select(col(keyCol),
      round(col("__p").cast(stable), roundDigits)
        .cast("double").as("p_value"),
      col("rank"), col("__m").as("m_tests"),
      round((col("rank").cast("double") * lit(q)
        / col("__m").cast("double")).cast(stable), roundDigits)
        .cast("double").as("bh_threshold"),
      coalesce(col("rank") <= col("__k"), lit(false)).cast("int")
        .as("rejected"))
  }

  /** X224 — required sample size per arm for a two-proportion test
    * (the textbook normal-approximation formula; e.g. Fleiss,
    * Statistical Methods for Rates and Proportions):
    * `n = (z_{α/2}·√(2p̄(1−p̄)) + z_β·√(p₁(1−p₁)+p₂(1−p₂)))² / (p₂−p₁)²`
    * with `p₂ = p₁·(1+mde)` (relative lift) and `p̄ = (p₁+p₂)/2` —
    * the "how long must this experiment run" planner that closes the
    * loop around [[wilsonInterval]]/[[msprt]]: measure the baseline
    * rate from history, read off the per-arm n for the smallest lift
    * worth shipping. Defaults are the standard 95% two-sided / 80%
    * power quantiles (1.96, 0.8416), printed literals.
    *
    * One counting aggregate per key; the formula is a single float
    * chain, `CEIL`ed to whole units. Degenerate baselines (p₁ = 0 or
    * p₂ ≥ 1) emit null n. */
  def requiredSampleSize(df: DataFrame, keyCol: String,
      success: Column, trial: Column, mde: Double = 0.1,
      zAlpha: Double = 1.96, zBeta: Double = 0.8416,
      roundDigits: Int = 6): DataFrame = {
    require(mde > 0, s"mde must be a positive relative lift: $mde")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val byKey = df.groupBy(col(keyCol))
      .agg(sum(success.cast("long")).as("__s"),
        sum(trial.cast("long")).as("__t"))
      .filter(col("__t") > 0)
    val p1 = col("__s").cast("double") / col("__t").cast("double")
    val p2 = p1 * lit(1.0d + mde)
    val pbar = (p1 + p2) / lit(2.0d)
    val num = lit(zAlpha) * sqrt(lit(2.0d) * pbar * (lit(1.0d) - pbar)) +
      lit(zBeta) * sqrt(p1 * (lit(1.0d) - p1) + p2 * (lit(1.0d) - p2))
    val n = ceil(num * num / ((p2 - p1) * (p2 - p1)))
    byKey.select(col(keyCol), col("__t").as("trials"),
      round(p1.cast(stable), roundDigits).cast("double").as("rate"),
      round(when(p2 < 1, p2).cast(stable), roundDigits).cast("double")
        .as("target_rate"),
      when(p1 > 0 && p2 < 1, n.cast("long")).as("n_per_arm"))
  }

  /** X225 — delta-method CI for a RATIO metric with unit-level
    * clustering (Deng, Knoblich, Lu, "Applying the Delta Method in
    * Metric Analytics", KDD'18): for `r = Ȳ/X̄` over per-unit sums
    * (revenue per session, clicks per view — the metrics a naive
    * row-level variance gets WRONG because rows within a user
    * correlate), `Var(r) ≈ (σ²_y − 2r·σ_xy + r²·σ²_x) / (n·x̄²)` and
    * the CI is `r ± z·√Var`. The per-unit aggregate IS the clustering
    * correction.
    *
    * ONE per-unit conditional-sum aggregate + ONE 1-row exact-decimal
    * moment aggregate (the [[cupedSummary]] shape, scale-proof);
    * the ratio/variance are single float chains. Degenerate x̄ = 0 or
    * n < 2 → null CI. */
  def ratioMetricCI(df: DataFrame, unitCol: String,
      num: Column, den: Column, z: Double = 1.96,
      roundDigits: Int = 6): DataFrame = {
    require(z > 0, s"z must be positive: $z")
    val dec = org.apache.spark.sql.types.DecimalType(24, 6)
    val q12 = org.apache.spark.sql.types.DecimalType(28, 12)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val v6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val perUnit = df.groupBy(col(unitCol))
      .agg(
        sum(coalesce(num.cast(v6), lit(0).cast(v6))).cast(v6).as("__y"),
        sum(coalesce(den.cast(v6), lit(0).cast(v6))).cast(v6).as("__x"))
    val m = perUnit.agg(
      count(lit(1)).as("__n"),
      sum(col("__y")).cast(dec).as("__sy"),
      sum(col("__x")).cast(dec).as("__sx"),
      sum((col("__y") * col("__y")).cast(q12)).cast(q12).as("__syy"),
      sum((col("__x") * col("__x")).cast(q12)).cast(q12).as("__sxx"),
      sum((col("__y") * col("__x")).cast(q12)).cast(q12).as("__syx"))
    val n = col("__n").cast("double")
    def d(c: String): Column = col(c).cast("double")
    val xbar = d("__sx") / n
    val r = d("__sy") / d("__sx")
    val varY = (d("__syy") - d("__sy") * d("__sy") / n) / (n - 1)
    val varX = (d("__sxx") - d("__sx") * d("__sx") / n) / (n - 1)
    val covYX = (d("__syx") - d("__sy") * d("__sx") / n) / (n - 1)
    val varR = (varY - lit(2.0d) * r * covYX + r * r * varX) /
      (n * xbar * xbar)
    val ok = col("__n") > 1 && d("__sx") =!= 0.0d
    val se = sqrt(greatest(varR, lit(0.0d)))
    m.select(col("__n").as("n_units"),
      round(when(d("__sx") =!= 0.0d, r).cast(stable), roundDigits)
        .cast("double").as("ratio"),
      round(when(ok, se).cast(stable), roundDigits).cast("double")
        .as("se"),
      round(when(ok, r - lit(z) * se).cast(stable), roundDigits)
        .cast("double").as("ci_lo"),
      round(when(ok, r + lit(z) * se).cast(stable), roundDigits)
        .cast("double").as("ci_hi"))
  }

  /** X196 — Theil T inequality index per group:
    * `T = (1/n)·Σ (x/μ)·ln(x/μ)` over positive values — the
    * entropy-based inequality measure next to [[gini]]: T = 0 means
    * equal shares, ln(n) means one holder has everything, and unlike
    * Gini it DECOMPOSES additively into between-group + within-group
    * terms, which is why mix audits prefer it. Zero/negative values
    * are excluded (the standard convention — ln is undefined there).
    *
    * μ comes from exact decimal sums rounded to a 6 dp double (the
    * cusum discipline); each (x/μ)·ln(x/μ) term rounds to
    * DECIMAL(18,8) BEFORE the exact per-group sum (round-then-add —
    * row order must not leak through double addition), and the final
    * 1/n division is one float step. Constant groups land exactly at
    * 0; degenerate μ ≤ 0 cannot occur (positive values only).
    */
  /** Poisson(1) cumulative thresholds c₀..c₉ (full-precision
    * shortest-repr doubles — the SAME literals the oracle SQL
    * carries, so the weight decision is identical on every engine);
    * u < c_k → weight k, else 10. Shared with the streaming twin. */
  private[graft] val poissonCum: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402,
    0.9999998885745216)

  /** The per-(resample, row) uniform draw: u from the first 12 hex
    * chars of md5("b:key") scaled by 2⁻⁴⁸ (exact — a power-of-two
    * scale). Kept SEPARATE from [[poissonWeightFromU]]: inlining u
    * into the 10-branch CASE re-evaluates the md5 chain once per
    * visited branch (Spark's common-subexpression elimination only
    * covers the always-evaluated first predicate of a CaseWhen), an
    * average ~2× and worst-case 10× md5 per row on the hot
    * explode-by-B path — and the 10 inlined md5 codegen copies bloat
    * the generated method (r19: x265's cold-JIT first runs). The
    * caller materializes u as a real column in its own projection;
    * CollapseProject keeps non-cheap multi-referenced expressions in
    * their own project, so the split survives optimization. */
  private def poissonU(b: Column, key: Column): Column =
    conv(substring(md5(concat(b.cast("string"), lit(":"),
      key.cast("string"))), 1, 12), 16, 10).cast("double") /
      lit(281474976710656.0d)

  /** Inverse-CDF CASE over [[poissonCum]] for an already-materialized
    * uniform column. */
  private def poissonWeightFromU(u: Column): Column =
    poissonCum.zipWithIndex.foldRight(lit(10L): Column) {
      case ((c, k), rest) => when(u < lit(c), lit(k.toLong)).otherwise(rest)
    }

  /** The SAME weight computed driver/executor-side (java MD5,
    * identical bytes) — the streaming twin folds with it;
    * EvaluationSpec pins Scala ≡ engine equality. */
  private[graft] def poissonWeightOf(b: Int, key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$b:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h = java.lang.Long.parseLong(
      d.take(6).map(x => f"$x%02x").mkString, 16)
    val u = h.toDouble / 281474976710656.0d
    val k = poissonCum.indexWhere(u < _)
    if (k < 0) 10L else k.toLong
  }

  /** The B weighted resample means (build side of
    * [[poissonBootstrapCI]], shared with the streaming twin's parity
    * spec): explode-before-aggregate so map-side combine collapses to
    * B rows inside the scan stage — the shuffle carries ≤ B rows per
    * mapper. Weighted sums are exact DECIMAL(28,6); the mean is one
    * correctly-rounded double division. */
  private[graft] def bootstrapMeans(
      df: DataFrame, key: Column, value: Column, b: Int): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val rows0 = df.filter(key.isNotNull && value.isNotNull)
      .select(key.cast("string").as("__k"),
        value.cast(org.apache.spark.sql.types.DecimalType(18, 6))
          .as("__v"))
    // The explode multiplies WORK by B but not partitions: a compact
    // scan (one 20 MB parquet file at small SF) would push B·n md5
    // computations through one task. Spread first when the input is
    // narrower than the cluster — a cheap skinny-row shuffle locally,
    // a no-op at scale where the scan is already wide. (r16: x265
    // 91 s -> seconds at sf0.1.) Exact decimal sums make the result
    // partitioning-independent.
    val target = rows0.sparkSession.sparkContext.defaultParallelism
    val rows = if (rows0.rdd.getNumPartitions < target)
      rows0.repartition(target) else rows0
    val seeds = array((0 until b).map(j => lit(j)): _*)
    rows.select(col("__k"), col("__v"), explode(seeds).as("__b"))
      .select(col("__b"), col("__v"),
        poissonU(col("__b"), col("__k")).as("__u"))
      .select(col("__b"), col("__v"),
        poissonWeightFromU(col("__u")).as("__w"))
      .groupBy(col("__b"))
      .agg(sum(col("__w")).as("__n"),
        sum((col("__w") * col("__v")).cast(dec)).as("__s"))
      .select(col("__b"),
        (col("__s").cast("double") / col("__n").cast("double"))
          .as("__m"))
  }

  /** X232 — Poisson-bootstrap confidence interval for the mean
    * (Chamandy et al., "Estimating Uncertainty for Massive Data
    * Streams", Google '12; Kleiner et al. BLB, JRSS-B '14): B
    * independent resamples, each row carried with a Poisson(1)
    * weight drawn DETERMINISTICALLY from md5(b:key) — so the
    * resampling is reproducible across reruns, partitionings, and
    * engines (no rand()), and the whole bootstrap is ONE
    * explode-before-aggregate scan producing B weighted means (map-
    * side combine; the shuffle carries ≤ B rows per mapper — at
    * 100 TB the cost is the scan, never the resampling). This is THE
    * way to put error bars on a pipeline metric when the n² of a
    * closed form is unavailable or the statistic has no formula. The
    * CI is read at EXACT order-statistic indices: B = 81 makes
    * (B−1)·{0.025, 0.975} integral, so both engines pick the same
    * element with no interpolation arithmetic. B must satisfy that
    * property; the default almost always serves.
    */
  def poissonBootstrapCI(
      df: DataFrame, key: Column, value: Column,
      b: Int = 81): DataFrame = {
    require(b >= 41 && (b - 1) % 40 == 0,
      s"b must make (b-1)*0.025 integral (41, 81, 121, ...): $b")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val means = bootstrapMeans(df, key, value, b)
    val ci = means.agg(
      expr("percentile(__m, 0.025)").as("__lo"),
      expr("percentile(__m, 0.975)").as("__hi"))
    val rows = df.filter(key.isNotNull && value.isNotNull)
    val point = rows.agg(count(lit(1)).as("n"),
      (sum(value.cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .cast("double") / count(lit(1)).cast("double")).as("__mean"))
    point.crossJoin(ci).select(
      col("n"), lit(b).as("b"),
      round(col("__mean").cast(stable), 6).cast("double").as("mean"),
      round(col("__lo").cast(stable), 6).cast("double").as("ci_lo"),
      round(col("__hi").cast(stable), 6).cast("double").as("ci_hi"))
  }

  /** X233 — Kaplan–Meier product-limit survival estimator (Kaplan &
    * Meier, JASA 1958): from one (duration, event) row per subject —
    * event = 1 observed, 0 right-censored — the survival curve
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over the EVENT times, the
    * standard time-to-conversion / retention read when some subjects
    * haven't converted yet (dropping them would bias the curve; so
    * would counting them as converted).
    *
    * Shape: ONE aggregate collapses subjects to the per-duration
    * (deaths, censored) table — the only shuffle, carrying ≤ distinct
    * durations; risk sets and the running product come from windows
    * over that duration-cardinality-bounded table (the sanctioned
    * bounded frame). The product is portable as
    * exp(Σ round(ln(1 − d/n), 8)) — round-then-add, one exp at the
    * end; a step that exhausts the risk set (d = n) pins survival to
    * exactly 0 from that time on (ln is never called on 0).
    */
  def kaplanMeier(
      df: DataFrame, duration: Column, event: Column): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val byT = df.filter(duration.isNotNull && event.isNotNull)
      .select(duration.cast("long").as("__t"),
        event.cast("long").as("__e"))
      .groupBy(col("__t"))
      .agg(sum(col("__e")).as("__d"),
        sum(lit(1L) - col("__e")).as("__c"))
    val ord = Window.orderBy(col("__t"))
    val upToNow = ord.rowsBetween(Window.unboundedPreceding, 0)
    val withRisk = byT
      .withColumn("__n", sum(col("__d") + col("__c")).over(ord
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("__d") > 0L)
    // recompute windows on the event-time-only table: n_t still counts
    // everyone at risk at t (censoring between event times already
    // folded into __n above, BEFORE the filter)
    val lnTerm = round(log(lit(1.0) -
      col("__d").cast("double") / col("__n").cast("double"))
      .cast(stable), 8)
    val dead = max(when(col("__d") === col("__n"), 1L).otherwise(0L))
      .over(upToNow)
    withRisk
      .withColumn("__ln", when(col("__d") < col("__n"), lnTerm))
      .withColumn("__dead", dead)
      .select(col("__t").as("t"), col("__n").as("n_risk"),
        col("__d").as("d_events"), col("__c").as("c_censored"),
        when(col("__dead") === 1L, lit(0.0)).otherwise(
          round(exp(sum(col("__ln")).over(upToNow)).cast(stable), 6)
            .cast("double")).as("survival"))
  }

  /** X234 (r16) — Kaplan–Meier with Greenwood 95% confidence bands
    * (Greenwood 1926): Var(Ŝ(t)) = Ŝ(t)² · Σ_{tᵢ≤t} dᵢ/(nᵢ(nᵢ−dᵢ)) —
    * the error bars [[kaplanMeier]]'s point curve needs before anyone
    * reads a retention difference off it. Same shape as the point
    * estimator: ONE aggregate to the per-duration table (the only
    * shuffle, ≤ distinct durations), windows over that bounded table.
    *
    * Portability: each Greenwood increment d/(n(n−d)) is rounded to
    * 8 dp BEFORE the running exact-decimal sum (round-then-add); the
    * band is survival·√G with survival the ALREADY-6dp-rounded curve
    * value, so both engines multiply identical doubles; √ is IEEE
    * correctly-rounded. A step that exhausts the risk set (d = n)
    * pins survival to 0 and the band to null from that time on (the
    * increment would divide by zero; the curve is degenerate there
    * anyway). Bands clamp to [0, 1].
    */
  def kaplanMeierGreenwood(
      df: DataFrame, duration: Column, event: Column,
      z: Double = 1.96): DataFrame = {
    require(z > 0, s"z must be positive: $z")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val byT = df.filter(duration.isNotNull && event.isNotNull)
      .select(duration.cast("long").as("__t"),
        event.cast("long").as("__e"))
      .groupBy(col("__t"))
      .agg(sum(col("__e")).as("__d"),
        sum(lit(1L) - col("__e")).as("__c"))
    val ord = Window.orderBy(col("__t"))
    val upToNow = ord.rowsBetween(Window.unboundedPreceding, 0)
    val withRisk = byT
      .withColumn("__n", sum(col("__d") + col("__c")).over(ord
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("__d") > 0L)
    val lnTerm = round(log(lit(1.0) -
      col("__d").cast("double") / col("__n").cast("double"))
      .cast(stable), 8)
    val gTerm = round((col("__d").cast("double") /
      (col("__n").cast("double") *
        (col("__n") - col("__d")).cast("double"))).cast(stable), 8)
    val dead = max(when(col("__d") === col("__n"), 1L).otherwise(0L))
      .over(upToNow)
    val curve = withRisk
      .withColumn("__ln", when(col("__d") < col("__n"), lnTerm))
      .withColumn("__g", when(col("__d") < col("__n"), gTerm))
      .withColumn("__dead", dead)
      .withColumn("__s", when(col("__dead") === 1L, lit(0.0)).otherwise(
        round(exp(sum(col("__ln")).over(upToNow)).cast(stable), 6)
          .cast("double")))
      .withColumn("__G", sum(col("__g")).over(upToNow))
    val se = round((col("__s") * sqrt(col("__G").cast("double")))
      .cast(stable), 6).cast("double")
    curve.select(col("__t").as("t"), col("__n").as("n_risk"),
      col("__d").as("d_events"), col("__s").as("survival"),
      when(col("__dead") === 0L, se).as("se"),
      when(col("__dead") === 0L,
        round(greatest(lit(0.0), col("__s") - lit(z) * se)
          .cast(stable), 6).cast("double")).as("ci_lo"),
      when(col("__dead") === 0L,
        round(least(lit(1.0), col("__s") + lit(z) * se)
          .cast(stable), 6).cast("double")).as("ci_hi"))
  }

  /** X235 (r16) — restricted mean survival time (RMST; Royston &
    * Parmar, BMC Med Res 2013): the area under the Kaplan–Meier curve
    * up to a horizon τ — "expected days survived (or not-yet-
    * converted) in the first τ days", the single-number survival
    * summary that stays defined under heavy censoring where the
    * median doesn't. Reads the [[kaplanMeier]] step curve: each
    * interval [tᵢ₋₁, tᵢ) contributes Ŝ(tᵢ₋₁)·(min(tᵢ, τ) − tᵢ₋₁),
    * plus the tail Ŝ(t_last)·(τ − t_last) when the curve ends before
    * τ. One lag window over the duration-bounded event table; each
    * contribution is the 6dp-rounded survival times an integer day
    * width, rounded to 8 dp before the exact-decimal sum.
    */
  def rmst(df: DataFrame, duration: Column, event: Column,
      tau: Long): DataFrame = {
    require(tau > 0, s"tau must be positive: $tau")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val curve = kaplanMeier(df, duration, event)
    val ord = Window.orderBy(col("t"))
    val prevT = lag(col("t"), 1, 0L).over(ord)
    val prevS = lag(col("survival"), 1, 1.0).over(ord)
    val width = least(col("t"), lit(tau)) - prevT
    val contrib = when(prevT < tau,
      round((prevS * width.cast("double")).cast(stable), 8))
      .otherwise(lit(java.math.BigDecimal.ZERO).cast(stable))
    val steps = curve.select(col("t"), col("survival"),
      contrib.as("__a"))
    steps.agg(
        count(lit(1)).as("n_steps"),
        coalesce(sum(col("__a")),
          lit(java.math.BigDecimal.ZERO).cast(stable)).as("__area"),
        max(col("t")).as("__tl"),
        max(struct(col("t"), col("survival"))).as("__last"))
      .select(lit(tau).as("tau"), col("n_steps"),
        round((col("__area").cast("double") +
          when(col("__tl").isNull, lit(tau.toDouble))
            .when(col("__tl") < tau,
              col("__last.survival") *
                (lit(tau) - col("__tl")).cast("double"))
            .otherwise(lit(0.0))).cast(stable), 6)
          .cast("double").as("rmst"))
  }

  /** X236 (r16) — Cochran–Mantel–Haenszel stratified 2×2 test
    * (Mantel & Haenszel, JNCI 1959): pooled treatment-vs-outcome
    * association ACROSS strata — the Simpson's-paradox-proof read an
    * experiment sliced by country/device/cohort needs (a marginal 2×2
    * can reverse sign under confounded stratum sizes; CMH conditions
    * on each stratum's margins). Per stratum: observed a = treated
    * successes, E(a) = r₁c₁/N, Var(a) = r₁r₀c₁c₀/(N²(N−1)); the
    * statistic is (Σa − ΣE)²/ΣVar (no continuity correction — both
    * engines would have to agree on it anyway, and at pipeline n it's
    * noise), plus the Mantel–Haenszel common odds ratio
    * Σ(aᵢdᵢ/Nᵢ)/Σ(bᵢcᵢ/Nᵢ).
    *
    * ONE aggregate to the per-stratum count table (the only shuffle,
    * ≤ distinct strata rows); every per-stratum term is a rational of
    * integer counts rounded to 8 dp before the exact-decimal sums.
    * Single-subject strata (N = 1) contribute E but zero variance
    * (the hypergeometric is degenerate there).
    */
  def cmhTest(df: DataFrame, stratum: Column, isTreat: Column,
      success: Column, roundDigits: Int = 6): DataFrame = {
    val rows = df
      .filter(stratum.isNotNull && isTreat.isNotNull && success.isNotNull)
      .select(stratum.as("__s"), isTreat.cast("long").as("__t"),
        success.cast("long").as("__y"))
    val cells = rows.groupBy(col("__s")).agg(
      count(lit(1)).as("__n"), sum(col("__t")).as("__r1"),
      sum(col("__y")).as("__c1"),
      sum(col("__t") * col("__y")).as("__a"))
    cmhFromCells(cells, roundDigits)
  }

  /** The [[cmhTest]] finishing chain over an already-built per-stratum
    * cell table (__s, __n, __r1, __c1, __a) — factored so the
    * streaming cell monitor
    * ([[graft.streaming.Stateful.cmhCellsMonitor]]) rolls up through
    * the EXACT batch arithmetic. */
  private[graft] def cmhFromCells(
      cells: DataFrame, roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val n = col("__n").cast("double")
    val r1 = col("__r1").cast("double")
    val r0 = (col("__n") - col("__r1")).cast("double")
    val c1 = col("__c1").cast("double")
    val c0 = (col("__n") - col("__c1")).cast("double")
    val a = col("__a").cast("double")
    val b = (col("__r1") - col("__a")).cast("double")
    val c = (col("__c1") - col("__a")).cast("double")
    val d = (col("__n") - col("__r1") - col("__c1") + col("__a"))
      .cast("double")
    val e = round((r1 * c1 / n).cast(stable), 8)
    val v = when(col("__n") > 1L,
      round((r1 * r0 * c1 * c0 / (n * n * (n - lit(1.0d))))
        .cast(stable), 8))
      .otherwise(lit(java.math.BigDecimal.ZERO).cast(stable))
    val agg = cells.agg(
      count(lit(1)).as("k_strata"), sum(col("__n")).as("n_total"),
      sum(col("__a")).as("observed"),
      sum(e).as("__e"), sum(v).as("__v"),
      sum(round((a * d / n).cast(stable), 8)).as("__on"),
      sum(round((b * c / n).cast(stable), 8)).as("__od"))
    val dev = col("observed").cast("double") - col("__e").cast("double")
    agg.select(col("k_strata"), col("n_total"), col("observed"),
      round(col("__e").cast(stable), roundDigits).cast("double")
        .as("expected"),
      round(col("__v").cast(stable), roundDigits).cast("double")
        .as("variance"),
      round(when(col("__v") > 0, dev * dev / col("__v").cast("double"))
        .cast(stable), roundDigits).cast("double").as("cmh_chi2"),
      round(when(col("__od") > 0,
        col("__on").cast("double") / col("__od").cast("double"))
        .cast(stable), roundDigits).cast("double").as("mh_odds_ratio"))
  }

  /** X237 (r16) — Holm step-down family-wise-error correction (Holm,
    * Scand J Stat 1979): the FWER complement to [[bhFdr]]'s FDR —
    * when ANY single false rejection is unacceptable (a ship/no-ship
    * gate, not a discovery screen), Holm dominates plain Bonferroni
    * uniformly at the same guarantee. Adjusted p₍ᵢ₎ =
    * min(1, max_{j≤i} (m−j+1)·p₍ⱼ₎) — one rank window and one running
    * max over the k-row metrics table ([[msprt]] with `keyCols` emits
    * exactly this shape, so the windows are bounded by contract).
    * Ties break by key for determinism; null p-values are excluded.
    */
  def holmAdjust(df: DataFrame, keyCol: String, pCol: Column,
      alpha: Double = 0.05, roundDigits: Int = 6): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val rows = df.filter(pCol.isNotNull)
      .select(col(keyCol), pCol.cast("double").as("__p"))
    val w = Window.orderBy(col("__p"), col(keyCol))
    val wAll = Window.partitionBy()
    val upToNow = w.rowsBetween(Window.unboundedPreceding, 0)
    val ranked = rows
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("__step", round(
        ((col("__m") - col("rank") + 1L).cast("double") * col("__p"))
          .cast(stable), 8))
      .withColumn("__adj", least(lit(1.0),
        max(col("__step")).over(upToNow).cast("double")))
    ranked.select(col(keyCol),
      round(col("__p").cast(stable), roundDigits).cast("double")
        .as("p_value"),
      col("rank"), col("__m").as("m_tests"),
      round(col("__adj").cast(stable), roundDigits).cast("double")
        .as("holm_adjusted"),
      (col("__adj") <= lit(alpha)).cast("int").as("rejected"))
  }

  /** X238 (r16) — difference-in-differences estimator (Card & Krueger
    * AER '94 shape): effect = (T̄post − T̄pre) − (C̄post − C̄pre) over
    * the four (group × period) cells — the causal read when treatment
    * wasn't randomized but both groups share a pre-period trend
    * (launches, staged rollouts, policy changes). Callers pass ONE
    * row per unit×period (aggregate to units first — the
    * [[ratioMetricCI]] clustering argument); SE is the four-cell
    * pooled √(Σ s²ᵢ/nᵢ) on those unit-level rows.
    *
    * ONE aggregate over the input (4 conditional-sum cells, map-side
    * combinable, no join); cell squares are rounded to 8 dp before
    * the exact-decimal sums, cell means to 6 dp before the variance
    * combine, so both engines walk identical doubles into the final
    * float chain.
    */
  def didEstimate(df: DataFrame, isTreat: Column, isPost: Column,
      value: Column, roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val rows = df
      .filter(isTreat.isNotNull && isPost.isNotNull && value.isNotNull)
      .select(isTreat.cast("int").as("__g"), isPost.cast("int").as("__p"),
        value.cast("double").as("__v"))
    // squares and variance terms ride DECIMAL(28,8): a (18,8) square
    // would overflow (Spark nulls, DuckDB errors) once per-unit sums
    // cross ~1e5
    val wide = org.apache.spark.sql.types.DecimalType(28, 8)
    val cells = rows.groupBy(col("__g"), col("__p")).agg(
      count(lit(1)).as("__n"),
      sum(col("__v").cast(wide)).as("__s"),
      sum(round((col("__v") * col("__v")).cast(wide), 8)).as("__q"))
    val mean = round((col("__s").cast("double") / col("__n").cast("double"))
      .cast(stable), 6).cast("double")
    val variance = when(col("__n") > 1L,
      (col("__q").cast("double") - col("__n").cast("double") * mean * mean)
        / (col("__n") - 1L).cast("double"))
    val sign = ((col("__g") * 2 - 1) * (col("__p") * 2 - 1)).cast("double")
    val enriched = cells
      .withColumn("__mean", mean)
      .withColumn("__vn", round((variance / col("__n").cast("double"))
        .cast(wide), 8))
    val agg = enriched.agg(
      count(lit(1)).as("k_cells"), sum(col("__n")).as("n_rows"),
      sum(round((sign * col("__mean")).cast(stable), 8)).as("__eff"),
      sum(col("__vn")).as("__se2"),
      min(col("__n")).as("__minN"))
    val se = sqrt(col("__se2").cast("double"))
    agg.select(col("k_cells"), col("n_rows"),
      round(when(col("k_cells") === 4L, col("__eff").cast("double"))
        .cast(stable), roundDigits).cast("double").as("did_effect"),
      round(when(col("k_cells") === 4L && col("__minN") > 1L, se)
        .cast(stable), roundDigits).cast("double").as("se"),
      round(when(col("k_cells") === 4L && col("__minN") > 1L
          && col("__se2") > 0,
        (col("__eff").cast("double") / se)).cast(stable), roundDigits)
        .cast("double").as("t_stat"))
  }

  /** X246 (r16) — Weight of Evidence / Information Value feature
    * screen (the credit-scoring standard; Siddiqi, "Credit Risk
    * Scorecards" 2006): bin a numeric feature ([[quantize]]'s
    * equal-width grid — the same scale knob every rank statistic here
    * shares), then per bin WOE = ln(%events / %non-events) and
    * IV = Σ (%events − %non-events)·WOE — "how hard does this feature
    * separate the target", on the conventional ruler (IV < 0.02
    * useless, > 0.3 strong). The feature-screening complement to
    * [[infoGainReport]]'s entropy view that credit/risk teams
    * actually quote.
    *
    * ONE scan to the ≤-bins cell table (the only shuffle); totals and
    * the IV sum ride full-frame windows over that bins-bounded table.
    * Bins empty on either side have undefined WOE (null) and
    * contribute nothing to IV — the unsmoothed convention, visible in
    * the output rather than hidden behind a pseudocount. WOE's ln is
    * rounded to 6 dp, IV terms to 8 dp before the exact sum.
    */
  def woeIv(df: DataFrame, event: Column, value: Column,
      bins: Int = 10, roundDigits: Int = 6): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val raw = df.filter(value.isNotNull && event.isNotNull)
      .select(value.cast("double").as("__v"),
        event.cast("long").as("__y"))
    val cells = quantize(raw, "__v", bins)
      .groupBy(col("__v").as("__bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("__e"))
    val wAll = Window.partitionBy()
    val ne = col("n") - col("__e")
    val withTotals = cells
      .withColumn("__g", sum(col("__e")).over(wAll))
      .withColumn("__b", sum(ne).over(wAll))
    val eShare = col("__e").cast("double") / col("__g").cast("double")
    val neShare = ne.cast("double") / col("__b").cast("double")
    val woe = round(when(
      col("__e") > 0L && ne > 0L && col("__g") > 0L && col("__b") > 0L,
      log(eShare / neShare)).cast(stable), roundDigits).cast("double")
    val scored = withTotals
      .withColumn("woe", woe)
      .withColumn("__iv", round(((eShare - neShare) * col("woe"))
        .cast(stable), 8))
    scored
      .withColumn("iv_total",
        round(sum(col("__iv")).over(wAll).cast(stable), roundDigits)
          .cast("double"))
      .select(col("__bin").cast("long").as("bin"), col("n"),
        col("__e").as("events"),
        round(eShare.cast(stable), roundDigits).cast("double")
          .as("event_share"),
        col("woe"),
        round(col("__iv").cast(stable), roundDigits).cast("double")
          .as("iv_term"),
        col("iv_total"))
  }

  def theilIndex(df: DataFrame, groupCols: Seq[String], valueCol: String,
      roundDigits: Int = 6): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val gs = groupCols.map(col)
    val rows = df.filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(gs :+ col(valueCol).cast(dec).as("__v"): _*)
    val tots = rows.groupBy(gs: _*)
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    val renamed = groupCols.foldLeft(tots)((d, c) =>
      d.withColumnRenamed(c, s"__t_$c"))
    val joinCond = (groupCols.map(c => col(c) <=> col(s"__t_$c"))
      :+ lit(true)).reduce(_ && _)
    val mu = round((col("__s").cast("double") / col("__n"))
      .cast(stable), 6).cast("double")
    val ratio = col("__v").cast("double") / mu
    rows.join(renamed, joinCond)
      .groupBy(gs: _*)
      .agg(first(col("__n")).as("n"), first(mu).as("mean"),
        round((sum(round((ratio * log(ratio)).cast(stable), 8))
          .cast("double") / first(col("__n")))
          .cast(stable), roundDigits).cast("double").as("theil"))
  }

  /** Qini curve — the uplift-model complement of the x221 gains
    * table (Radcliffe 2007, "Using control groups to target on
    * predicted lift"): rank the population by a targeting score,
    * then at each score band compare cumulative responders in the
    * TREATED arm against the control arm scaled to the treated
    * volume: `qini = cumPosT - cumPosC * cumNT / cumNC`. A model
    * that only targets sure things (who'd convert anyway) shows a
    * flat curve; genuine incremental lift bends it up.
    *
    * Shape: scores quantize to `bins` equal-width buckets (the shared
    * [[quantize]] contract — `bins <= 0` trusts the raw distinct
    * cardinality), ONE conditional aggregate collapses the population
    * to per-bucket arm counts, and the cumulative walk runs over the
    * ≤-bins cell table, highest scores first.
    */
  def qiniCurve(df: DataFrame, score: Column, treated: Column,
      outcome: Column, bins: Int = 20, roundDigits: Int = 6)
      : DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val raw = df.filter(score.isNotNull && treated.isNotNull
        && outcome.isNotNull)
      .select(score.cast("double").as("__s"),
        treated.cast("boolean").as("__t"),
        outcome.cast("boolean").cast("long").as("__y"))
    val cells = quantize(raw, "__s", bins)
      .groupBy(col("__s"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__nt"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__nc"),
        sum(when(col("__t"), col("__y")).otherwise(0L)).as("__pt"),
        sum(when(!col("__t"), col("__y")).otherwise(0L)).as("__pc"))
    // ≤ bins rows: the unpartitioned cumulative window is bounded
    val w = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.select(col("__s"),
      col("__nt"), col("__nc"), col("__pt"), col("__pc"),
      sum(col("__nt")).over(w).as("__cnt"),
      sum(col("__nc")).over(w).as("__cnc"),
      sum(col("__pt")).over(w).as("__cpt"),
      sum(col("__pc")).over(w).as("__cpc"))
    val cnt = col("__cnt").cast("double")
    val cnc = col("__cnc").cast("double")
    val qini = when(col("__cnc") > 0,
      col("__cpt").cast("double")
        - col("__cpc").cast("double") * cnt / cnc)
    val uplift = when(col("__cnt") > 0 && col("__cnc") > 0,
      col("__cpt").cast("double") / cnt
        - col("__cpc").cast("double") / cnc)
    cum.select(col("__s").as("score_bin"),
      col("__cnt").as("cum_treated"), col("__cnc").as("cum_control"),
      col("__cpt").as("cum_pos_treated"),
      col("__cpc").as("cum_pos_control"),
      round(qini.cast(stable), roundDigits).cast("double").as("qini"),
      round(uplift.cast(stable), roundDigits).cast("double")
        .as("uplift"))
      .orderBy(col("score_bin").desc)
  }

  /** Black-box label-shift estimate, two-class BBSE (Lipton et al.
    * 2018, "Detecting and correcting for label shift with black box
    * predictors"): with a fixed classifier, the TARGET positive rate
    * among predictions `mu` relates to the true target prior `q`
    * through the validation confusion rates — `mu = q·tpr +
    * (1-q)·fpr`, so `q = (mu - fpr)/(tpr - fpr)`. The "did the class
    * balance move under me" read that needs NO target labels — only
    * predictions. Raw estimate reported alongside its [0,1] clamp
    * (outside [0,1] = the label-shift assumption itself is violated).
    * One conditional aggregate over each side.
    */
  def labelShiftBbse(df: DataFrame, inValid: Column, label: Column,
      pred: Column, roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val rows = df.filter(inValid.isNotNull && pred.isNotNull)
      .select(inValid.cast("boolean").as("__v"),
        label.cast("boolean").as("__y"), pred.cast("boolean").as("__p"))
    val agg = rows.agg(
      sum(when(col("__v"), 1L).otherwise(0L)).as("n_valid"),
      sum(when(!col("__v"), 1L).otherwise(0L)).as("n_target"),
      sum(when(col("__v") && col("__y"), 1L).otherwise(0L)).as("__pos"),
      sum(when(col("__v") && col("__y") && col("__p"), 1L)
        .otherwise(0L)).as("__tp"),
      sum(when(col("__v") && !col("__y"), 1L).otherwise(0L)).as("__neg"),
      sum(when(col("__v") && !col("__y") && col("__p"), 1L)
        .otherwise(0L)).as("__fp"),
      sum(when(!col("__v") && col("__p"), 1L).otherwise(0L)).as("__mp"))
    val tpr = col("__tp").cast("double") / col("__pos").cast("double")
    val fpr = col("__fp").cast("double") / col("__neg").cast("double")
    val mu = col("__mp").cast("double") / col("n_target").cast("double")
    val q = (mu - fpr) / (tpr - fpr)
    agg.filter(col("n_valid") > 0 && col("n_target") > 0
        && col("__pos") > 0 && col("__neg") > 0)
      .select(col("n_valid"), col("n_target"),
        round((col("__pos").cast("double")
          / col("n_valid").cast("double")).cast(stable), roundDigits)
          .cast("double").as("valid_prior"),
        round(mu.cast(stable), roundDigits).cast("double")
          .as("target_pred_rate"),
        round(when(tpr =!= fpr, q).cast(stable), roundDigits)
          .cast("double").as("shifted_prior"),
        round(when(tpr =!= fpr,
          greatest(least(q, lit(1.0d)), lit(0.0d))).cast(stable),
          roundDigits).cast("double").as("shifted_prior_clamped"))
  }

  /** Cochran–Armitage trend test (Armitage 1955): is an event rate
    * MONOTONE in an ordered dose — the ordered-alternative question a
    * plain chi-square wastes power on. `z = Σd(r_i - n_i R/N) /
    * sqrt(p(1-p)(Σd²n - (Σdn)²/N))` over per-dose (n, events) cells;
    * every accumulator is an integer or one-product term, one scan.
    */
  def cochranArmitage(df: DataFrame, dose: Column, event: Column,
      roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells = df.filter(dose.isNotNull && event.isNotNull)
      .select(dose.cast("long").as("__d"),
        event.cast("boolean").cast("long").as("__e"))
      .groupBy(col("__d"))
      .agg(count(lit(1)).as("__n"), sum(col("__e")).as("__r"))
    val agg = cells.agg(sum(col("__n")).as("__N"), sum(col("__r")).as("__R"),
      count(lit(1)).as("doses"),
      sum((col("__d").cast(d38) * col("__n").cast(d38)).cast(d38))
        .as("__dn"),
      sum((col("__d").cast(d38) * col("__d").cast(d38)
        * col("__n").cast(d38)).cast(d38)).as("__d2n"),
      sum((col("__d").cast(d38) * col("__r").cast(d38)).cast(d38))
        .as("__dr"))
    val nD = col("__N").cast("double")
    val p = col("__R").cast("double") / nD
    val num = col("__dr").cast("double") - col("__dn").cast("double") * p
    val vr = p * (lit(1.0d) - p)
      .*(col("__d2n").cast("double")
        - col("__dn").cast("double") * col("__dn").cast("double") / nD)
    agg.filter(col("__N") > 0 && col("doses") >= 2)
      .select(col("__N").as("n"), col("doses"),
        round(p.cast(stable), roundDigits).cast("double")
          .as("event_rate"),
        round(when(vr > 0, num / sqrt(vr)).cast(stable), roundDigits)
          .cast("double").as("z"))
  }

  /** Hellinger distance between two eras' distributions over `bins`
    * equal-width buckets (with the Bhattacharyya coefficient it is
    * built from): bounded in [0,1], symmetric, defined when bins are
    * empty on one side — the drift gauge to reach for when PSI's
    * log blows up on empty bins. One conditional aggregate to ≤ bins
    * cells; per-bin sqrt terms ride DECIMAL(18,10).
    */
  def hellingerDrift(df: DataFrame, value: Column, inA: Column,
      bins: Int = 20, roundDigits: Int = 6): DataFrame = {
    // bins <= 0 = the shared quantize contract's exact mode (cells
    // keyed by the raw distinct values)
    require(bins <= 0 || bins >= 2, s"bins must be <= 0 or >= 2: $bins")
    val raw = df.filter(value.isNotNull && inA.isNotNull)
      .select(value.cast("double").as("__v"),
        inA.cast("boolean").as("__a"))
    val cells = quantize(raw, "__v", bins)
      .groupBy(col("__v").as("__b"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("__na"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("__nb"))
    hellingerFromCells(cells, roundDigits)
  }

  /** The Hellinger finishing chain behind [[hellingerDrift]], entered
    * at the (bin, count_a, count_b) cell level — the streaming
    * histogram monitor ([[graft.streaming.Stateful]]) rolls its live
    * bin counters up through THIS exact code path against a frozen
    * base histogram. */
  private[graft] def hellingerFromCells(cells: DataFrame,
      roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val dec = org.apache.spark.sql.types.DecimalType(18, 10)
    val tot = cells.agg(sum(col("__na")).as("__ta"),
      sum(col("__nb")).as("__tb"))
    // guard: a one-sided input (every row in one era) must yield the
    // empty result, not an ANSI division error
    val bc = cells.crossJoin(broadcast(tot))
      .agg(first(col("__ta")).as("__ta"), first(col("__tb")).as("__tb"),
        sum(when(col("__ta") > 0 && col("__tb") > 0,
          sqrt((col("__na").cast("double") / col("__ta").cast("double"))
            * (col("__nb").cast("double") / col("__tb").cast("double"))))
          .cast(dec)).as("__bc"))
    bc.filter(col("__ta") > 0 && col("__tb") > 0)
      .select(col("__ta").as("n_a"), col("__tb").as("n_b"),
        round(col("__bc").cast("double").cast(stable), roundDigits)
          .cast("double").as("bhattacharyya"),
        round(sqrt(greatest(lit(1.0d) - col("__bc").cast("double"),
          lit(0.0d))).cast(stable), roundDigits).cast("double")
          .as("hellinger"))
  }

  /** Operating-point selection from the score distribution: sweep
    * every candidate threshold (one per score cell, the shared
    * [[quantize]] `bins` contract) and report the maximizer of
    * Youden's J (tpr − fpr, the cost-free default) AND of expected
    * utility under the caller's cost matrix — the "where do I cut"
    * answer served from the same one-scan cell table ROC AUC uses.
    * Ties break to the LOWEST threshold. Predicted-positive means
    * score >= threshold.
    */
  def optimalThreshold(df: DataFrame, score: Column, label: Column,
      bins: Int = 0, utilityTp: Double = 1.0, utilityTn: Double = 0.0,
      costFp: Double = 1.0, costFn: Double = 1.0,
      roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val raw = df.filter(score.isNotNull && label.isNotNull)
      .select(score.cast("double").as("__s"),
        label.cast("boolean").cast("long").as("__y"))
    val cells = quantize(raw, "__s", bins)
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"))
    // cumulative from the top: predicted positive = score >= threshold
    val w = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.agg(sum(col("__n")).as("__tn"), sum(col("__p")).as("__tp"))
    val curve = cells
      .select(col("__s"), sum(col("__n")).over(w).as("__cn"),
        sum(col("__p")).over(w).as("__cp"))
      .crossJoin(broadcast(tot))
      .filter(col("__tp") > 0 && col("__tn") > col("__tp"))
    val tp = col("__cp").cast("double")
    val fp = (col("__cn") - col("__cp")).cast("double")
    val fn = (col("__tp") - col("__cp")).cast("double")
    val tn = (col("__tn") - col("__cn") - col("__tp") + col("__cp"))
      .cast("double")
    val j = round((tp / col("__tp").cast("double")
      - fp / (col("__tn") - col("__tp")).cast("double")).cast(stable), 8)
    val util = round(((tp * utilityTp + tn * utilityTn
      - fp * costFp - fn * costFn) / col("__tn").cast("double"))
      .cast(stable), 8)
    val scored = curve.select(col("__s"), j.as("__j"), util.as("__u"))
    val bestJ = scored.agg(min(struct((-col("__j")).as("j"),
      col("__s").as("s"))).as("__b"))
      .select(col("__b.s").as("threshold_j"),
        round((-col("__b.j")).cast(stable), roundDigits).cast("double")
          .as("youden_j"))
    val bestU = scored.agg(min(struct((-col("__u")).as("u"),
      col("__s").as("s"))).as("__b"))
      .select(col("__b.s").as("threshold_utility"),
        round((-col("__b.u")).cast(stable), roundDigits).cast("double")
          .as("utility"))
    bestJ.crossJoin(bestU)
  }

  /** Levene's test for variance homogeneity (Levene 1960, mean-
    * centered form): ANOVA on the absolute deviations `Z = |x - x̄_g|`
    * — the "can I even pool these groups' variances" check that
    * gates Welch-vs-pooled decisions and flags heteroscedastic
    * segments a drift report's means miss. Two passes by necessity
    * (means, then deviations), both group-bounded aggregates.
    */
  def leveneTest(df: DataFrame, group: Column, value: Column,
      roundDigits: Int = 6,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
      : DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val wide = org.apache.spark.sql.types.DecimalType(28, 8)
    val rows = scope.persist(df.filter(group.isNotNull && value.isNotNull)
      .select(group.cast("string").as("__g"),
        value.cast("double").as("__v")))
    val means = rows.groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), (sum(col("__v"))
        / count(lit(1)).cast("double")).as("__mu"))
    val z = rows.join(means, Seq("__g"))
      .select(col("__g"), col("__n"), abs(col("__v") - col("__mu"))
        .as("__z"))
    val zg = z.groupBy(col("__g"))
      .agg(first(col("__n")).as("__n"), sum(col("__z")).as("__zs"),
        sum(col("__z") * col("__z")).as("__zs2"))
    val tot = zg.agg(sum(col("__n")).as("__tn"), count(lit(1)).as("__k"),
      sum(round(col("__zs").cast(wide), 8)).as("__tzs"))
    val zBarG = col("__zs") / col("__n").cast("double")
    val terms = zg.crossJoin(broadcast(tot))
      .select(col("__tn"), col("__k"),
        round((col("__n").cast("double")
          * (zBarG - col("__tzs").cast("double")
            / col("__tn").cast("double"))
          * (zBarG - col("__tzs").cast("double")
            / col("__tn").cast("double"))).cast(wide), 8).as("__b"),
        round((col("__zs2") - col("__zs") * col("__zs")
          / col("__n").cast("double")).cast(wide), 8).as("__w"))
      .agg(first(col("__tn")).as("__tn"), first(col("__k")).as("__k"),
        sum(col("__b")).as("__B"), sum(col("__w")).as("__W"))
    val nD = col("__tn").cast("double")
    val kD = col("__k").cast("double")
    terms.filter(col("__k") >= 2 && col("__tn") > col("__k"))
      .select(col("__tn").as("n"), col("__k").as("groups"),
        round(when(col("__W").cast("double") > 0,
          (nD - kD) / (kD - lit(1.0d))
            * col("__B").cast("double") / col("__W").cast("double"))
          .cast(stable), roundDigits).cast("double").as("w_stat"))
  }

  /** One-way ANOVA F (Fisher): between-group over within-group mean
    * squares, assembled entirely from per-group moment sums — ONE
    * scan, shuffle bounded by groups. The parametric complement to
    * kruskalWallis (x219) and the effect-size source behind
    * correlationRatio (x244).
    */
  def anovaF(df: DataFrame, group: Column, value: Column,
      roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val wide = org.apache.spark.sql.types.DecimalType(28, 8)
    val cells = df.filter(group.isNotNull && value.isNotNull)
      .select(group.cast("string").as("__g"),
        value.cast("double").as("__v"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__s2"))
    val tot = cells.agg(sum(col("__n")).as("__tn"),
      count(lit(1)).as("__k"),
      sum(round(col("__s").cast(wide), 8)).as("__ts"))
    val gm = col("__ts").cast("double") / col("__tn").cast("double")
    val mu = col("__s") / col("__n").cast("double")
    val terms = cells.crossJoin(broadcast(tot))
      .select(col("__tn"), col("__k"),
        round((col("__n").cast("double") * (mu - gm) * (mu - gm))
          .cast(wide), 8).as("__b"),
        round((col("__s2") - col("__s") * col("__s")
          / col("__n").cast("double")).cast(wide), 8).as("__w"))
      .agg(first(col("__tn")).as("__tn"), first(col("__k")).as("__k"),
        sum(col("__b")).as("__B"), sum(col("__w")).as("__W"))
    val nD = col("__tn").cast("double")
    val kD = col("__k").cast("double")
    val msb = col("__B").cast("double") / (kD - lit(1.0d))
    val msw = col("__W").cast("double") / (nD - kD)
    terms.filter(col("__k") >= 2 && col("__tn") > col("__k"))
      .select(col("__tn").as("n"), col("__k").as("groups"),
        round(msb.cast(stable), roundDigits).cast("double")
          .as("ms_between"),
        round(msw.cast(stable), roundDigits).cast("double")
          .as("ms_within"),
        round(when(msw > 0, msb / msw).cast(stable), roundDigits)
          .cast("double").as("f_stat"))
  }

  /** Per-group calibration page: Brier, ECE, and MCE per segment
    * from ONE pass — the "is the model calibrated for THIS language/
    * source/market" read that a global x300 hides (segments can be
    * miscalibrated in opposite directions and cancel). Cells bounded
    * by groups × bins.
    */
  def calibrationByGroup(df: DataFrame, group: Column, prob: Column,
      outcome: Column, bins: Int = 10, roundDigits: Int = 6)
      : DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val cells = df.filter(group.isNotNull && prob.isNotNull
        && outcome.isNotNull)
      .select(group.cast("string").as("__g"),
        prob.cast("double").as("__p"),
        outcome.cast("boolean").cast("long").as("__y"))
      .filter(col("__p") >= 0 && col("__p") <= 1)
      .groupBy(col("__g"),
        least(floor(col("__p") * bins), lit(bins - 1).cast("long"))
          .as("__b"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__s"),
        sum(col("__p")).as("__sp"),
        sum((col("__p") - col("__y")) * (col("__p") - col("__y")))
          .as("__se"))
    val pk = col("__sp") / col("__n").cast("double")
    val yk = col("__s").cast("double") / col("__n").cast("double")
    cells
      .groupBy(col("__g"))
      .agg(sum(col("__n")).as("n"),
        sum(round(col("__se").cast(stable), 8)).as("__tse"),
        sum(round((col("__n").cast("double") * abs(pk - yk))
          .cast(stable), 8)).as("__tce"),
        max(round(abs(pk - yk).cast(stable), 8)).as("__tmce"))
      .select(col("__g").as("group"), col("n"),
        round((col("__tse").cast("double") / col("n").cast("double"))
          .cast(stable), roundDigits).cast("double").as("brier"),
        round((col("__tce").cast("double") / col("n").cast("double"))
          .cast(stable), roundDigits).cast("double").as("ece"),
        round(col("__tmce").cast("double").cast(stable), roundDigits)
          .cast("double").as("mce"))
      .orderBy(col("group"))
  }

  /** McNemar's test with continuity correction (McNemar 1947): for
    * two classifiers/models scored on the SAME items, only the
    * discordant pairs carry information — `b` = A right & B wrong,
    * `c` = A wrong & B right, `chi2 = (|b-c|-1)²/(b+c)` — the paired
    * eval read that a two-proportion z test silently gets wrong (it
    * ignores the pairing). One aggregate; one row.
    */
  def mcnemar(df: DataFrame, correctA: Column, correctB: Column,
      roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val agg = df.filter(correctA.isNotNull && correctB.isNotNull)
      .select(correctA.cast("boolean").as("__a"),
        correctB.cast("boolean").as("__b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__a") && !col("__b"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("__a") && col("__b"), 1L).otherwise(0L)).as("c"))
    val bD = col("b").cast("double")
    val cD = col("c").cast("double")
    agg.filter(col("n") > 0)
      .select(col("n"), col("b"), col("c"),
        round(when(col("b") + col("c") > 0,
          (abs(bD - cD) - lit(1.0d)) * (abs(bD - cD) - lit(1.0d))
            / (bD + cD)).cast(stable), roundDigits)
          .cast("double").as("chi2"))
  }

  /** Cochran's Q (Cochran 1950): the k-classifier generalization of
    * McNemar — do k models scored on the same items share a success
    * rate? `Q = (k-1)(k·ΣC_j² - N²) / (kN - ΣR_i²)` over items with
    * a response from ALL k raters; every term is an integer sum, so
    * the statistic is one exact division. Shape: one (item, rater)
    * cell pass, one per-item + one per-rater aggregate.
    */
  def cochranQ(df: DataFrame, item: Column, rater: Column,
      success: Column, roundDigits: Int = 6,
      scope: graft.util.CacheScope = graft.util.CacheScope.unmanaged)
      : DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // one repartition by item after the combined dedup (r20, guide
    // §2.4): `full`'s per-item aggregate and the matched-block join
    // both key on __i, so they run exchange-free off this layout
    val r = scope.persist(
      df.filter(item.isNotNull && rater.isNotNull && success.isNotNull)
        .select(item.cast("string").as("__i"),
          rater.cast("string").as("__r"),
          success.cast("boolean").cast("long").as("__x"))
        .groupBy(col("__i"), col("__r")).agg(max(col("__x")).as("__x"))
        .repartition(col("__i")))
    val k = r.select(col("__r")).distinct().count()
    require(k >= 2, s"need >= 2 raters, got $k")
    // only items every rater responded to (the matched-block rule)
    val full = r.groupBy(col("__i"))
      .agg(count(lit(1)).as("__m"), sum(col("__x")).as("__ri"))
      .filter(col("__m") === k)
    val kept = scope.persist(r.join(full.select(col("__i")), Seq("__i")))
    val rows = full.agg(count(lit(1)).as("__items"),
      coalesce(sum(col("__ri")), lit(0L)).as("__N"),
      coalesce(sum((col("__ri").cast(d38) * col("__ri").cast(d38))
        .cast(d38)), lit(0).cast(d38)).as("__r2"))
    val cols2 = kept.groupBy(col("__r")).agg(sum(col("__x")).as("__cj"))
      .agg(coalesce(sum((col("__cj").cast(d38) * col("__cj").cast(d38))
        .cast(d38)), lit(0).cast(d38)).as("__c2"))
    val nD = col("__N").cast("double")
    val num = lit((k - 1).toDouble)
      .*(lit(k.toDouble) * col("__c2").cast("double") - nD * nD)
    val den = lit(k.toDouble) * nD - col("__r2").cast("double")
    rows.crossJoin(broadcast(cols2))
      .filter(col("__items") > 0)
      .select(col("__items").as("items"), lit(k).as("k"),
        col("__N").as("successes"),
        round(when(den > 0, num / den).cast(stable), roundDigits)
          .cast("double").as("q"))
  }

  /** Brier score with Murphy's (1973) reliability/resolution/
    * uncertainty decomposition plus ECE/MCE (Naeini et al. 2015) over
    * `bins` equal-width probability bins — the full "can I trust this
    * model's probabilities" page in one pass: `brier` is the direct
    * mean squared error of the probabilities; `reliability` (lower
    * better) is calibration error mass; `resolution` (higher better)
    * is how much the bins separate outcomes; `ece`/`mce` are the
    * calibration-drift gauges dashboards alert on.
    *
    * Shape: ONE conditional aggregate to ≤ `bins` cells (probability
    * floor-binned, p = 1 clamped into the top bin); every term after
    * runs on the cell table.
    */
  def brierDecomposition(df: DataFrame, prob: Column, outcome: Column,
      bins: Int = 10, roundDigits: Int = 6): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val raw = df.filter(prob.isNotNull && outcome.isNotNull)
      .select(prob.cast("double").as("__p"),
        outcome.cast("boolean").cast("long").as("__y"))
      .filter(col("__p") >= 0 && col("__p") <= 1)
    val cells = raw
      .groupBy(least(floor(col("__p") * bins), lit(bins - 1).cast("long"))
        .as("__b"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__s"),
        sum(col("__p")).as("__sp"),
        sum((col("__p") - col("__y")) * (col("__p") - col("__y")))
          .as("__se"))
    val tot = cells.agg(sum(col("__n")).as("__tn"),
      sum(col("__s")).as("__ts"),
      sum(round(col("__se").cast(stable), 8)).as("__tse"))
    val nD = col("__tn").cast("double")
    val yBar = col("__ts").cast("double") / nD
    val pk = col("__sp") / col("__n").cast("double")
    val yk = col("__s").cast("double") / col("__n").cast("double")
    val terms = cells.crossJoin(broadcast(tot))
      .select(col("__n"), col("__tn"), col("__ts"), col("__tse"),
        round((col("__n").cast("double") * (pk - yk) * (pk - yk))
          .cast(stable), 8).as("__rel"),
        round((col("__n").cast("double") * (yk - yBar) * (yk - yBar))
          .cast(stable), 8).as("__res"),
        round((col("__n").cast("double") * abs(pk - yk)).cast(stable), 8)
          .as("__ce"),
        round(abs(pk - yk).cast(stable), 8).as("__gap"))
      .agg(first(col("__tn")).as("__tn"), first(col("__ts")).as("__ts"),
        first(col("__tse")).as("__tse"),
        sum(col("__rel")).as("__trel"), sum(col("__res")).as("__tres"),
        sum(col("__ce")).as("__tce"), max(col("__gap")).as("__tmce"))
    val n2 = col("__tn").cast("double")
    val yb2 = col("__ts").cast("double") / n2
    terms.filter(col("__tn") > 0)
      .select(col("__tn").as("n"),
        round((col("__tse").cast("double") / n2).cast(stable), roundDigits)
          .cast("double").as("brier"),
        round((col("__trel").cast("double") / n2).cast(stable),
          roundDigits).cast("double").as("reliability"),
        round((col("__tres").cast("double") / n2).cast(stable),
          roundDigits).cast("double").as("resolution"),
        round((yb2 * (lit(1.0d) - yb2)).cast(stable), roundDigits)
          .cast("double").as("uncertainty"),
        round((col("__tce").cast("double") / n2).cast(stable), roundDigits)
          .cast("double").as("ece"),
        round(col("__tmce").cast("double").cast(stable), roundDigits)
          .cast("double").as("mce"))
  }

  /** Stratified average treatment effect with its inverse-propensity
    * twin (Imbens–Rubin ch. 17 / Horvitz–Thompson): strata come from
    * the caller's covariate column; within each both-arm stratum the
    * arm-mean difference weights by stratum size, and the IPW form
    * reweights outcome sums by the WITHIN-STRATUM propensity
    * `e_s = nT_s/n_s` — with stratum-constant propensities the two
    * coincide, so reporting both is a built-in specification check
    * (they diverge only when single-arm strata got dropped).
    *
    * Shape: ONE conditional aggregate to per-stratum arm cells;
    * everything after runs on the ≤-distinct-strata cell table.
    */
  def stratifiedAte(df: DataFrame, outcome: Column, treated: Column,
      stratum: Column, roundDigits: Int = 6): DataFrame = {
    val stable = org.apache.spark.sql.types.DecimalType(18, 8)
    val cells = df.filter(outcome.isNotNull && treated.isNotNull
        && stratum.isNotNull)
      .select(stratum.cast("string").as("__g"),
        treated.cast("boolean").as("__t"),
        outcome.cast("double").as("__y"))
      .groupBy(col("__g"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__nt"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__nc"),
        sum(when(col("__t"), col("__y")).otherwise(0.0d)).as("__yt"),
        sum(when(!col("__t"), col("__y")).otherwise(0.0d)).as("__yc"))
      .filter(col("__nt") > 0 && col("__nc") > 0)
    val n = (col("__nt") + col("__nc")).cast("double")
    val delta = col("__yt") / col("__nt").cast("double") -
      col("__yc") / col("__nc").cast("double")
    // IPW: sumYT*(n/nT) - sumYC*(n/nC), summed then / N
    val ipw = col("__yt") * n / col("__nt").cast("double") -
      col("__yc") * n / col("__nc").cast("double")
    cells.agg(count(lit(1)).as("strata"),
        sum(col("__nt") + col("__nc")).as("__n"),
        sum(round((delta * n).cast(stable), 8)).as("__wd"),
        sum(round(ipw.cast(stable), 8)).as("__ipw"))
      .filter(col("__n") > 0)
      .select(col("strata"), col("__n").as("n"),
        round((col("__wd").cast("double") / col("__n").cast("double"))
          .cast(stable), roundDigits).cast("double")
          .as("ate_stratified"),
        round((col("__ipw").cast("double") / col("__n").cast("double"))
          .cast(stable), roundDigits).cast("double").as("ate_ipw"))
  }
}
