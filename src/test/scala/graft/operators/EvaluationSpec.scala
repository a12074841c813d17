package graft.operators

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec

class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Double, Boolean)], bins: Int = 0): Option[Double] = {
    val df = rows.toDF("s", "y")
    Evaluation.rocAuc(df, col("y"), col("s"), bins = bins)
      .select("auc").as[Option[Double]].head()
  }

  test("rocAuc: perfect separation is 1.0, inverted is 0.0, constant score is 0.5") {
    val perfect = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
    assert(auc(perfect).contains(1.0))
    assert(auc(perfect.map { case (s, y) => (-s, y) }).contains(0.0))
    assert(auc(Seq((5.0, true), (5.0, false), (5.0, true))).contains(0.5))
  }

  test("rocAuc: tied scores take the midrank (hand Mann-Whitney)") {
    // scores 1,2,2,3 with labels 0,1,0,1: midranks 1, 2.5, 2.5, 4;
    // pos rank-sum 6.5, P=N=2 -> AUC = (6.5 - 3) / 4 = 0.875
    val got = auc(Seq((1.0, false), (2.0, true), (2.0, false), (3.0, true)))
    assert(got.contains(0.875), s"got $got")
  }

  test("rocAuc: degenerate single-class input yields null, not a crash") {
    assert(auc(Seq((1.0, true), (2.0, true))).isEmpty)
    assert(auc(Seq((1.0, false), (2.0, false))).isEmpty)
  }

  test("rocAuc: binning that preserves score order preserves the AUC exactly") {
    // integer scores 0..9, 10 bins over [0,9]: the quantization is
    // injective on the support, and AUC is monotone-invariant
    val rows = (0 to 9).map(i => (i.toDouble, i >= 6)) ++
      Seq((3.0, true), (7.0, false))
    assert(auc(rows, bins = 10) == auc(rows))
  }

  private def ks(a: Seq[Double], b: Seq[Double]): (Long, Long, Option[Double]) = {
    val df = a.map(v => (v, "a")).union(b.map(v => (v, "b"))).toDF("v", "side")
    Evaluation.ksTest(df, col("side") === "a", col("side") === "b", col("v"))
      .as[(Long, Long, Option[Double])].head()
  }

  test("ksTest: identical samples give D = 0, disjoint supports give D = 1") {
    assert(ks(Seq(1, 2, 3), Seq(1, 2, 3)) == (3L, 3L, Some(0.0)))
    assert(ks(Seq(1, 2), Seq(10, 11)) == (2L, 2L, Some(1.0)))
  }

  test("ksTest: hand ECDF gap with overlap") {
    // A={1,2}, B={2,3}: ECDF gaps at pooled points 1,2,3 are
    // 1/2, 1/2, 0 -> D = 0.5
    assert(ks(Seq(1, 2), Seq(2, 3)) == (2L, 2L, Some(0.5)))
  }

  test("psi: identical baseline and current give zero terms in every bin") {
    val vals = (1 to 200).map(_.toDouble)
    val df = vals.map(v => (v, "base")).union(vals.map(v => (v, "cur")))
      .toDF("v", "era")
    val terms = Evaluation.psi(df, col("era") === "base",
        col("era") === "cur", col("v"))
      .select("psi_term").as[Double].collect()
    assert(terms.length == 10 && terms.forall(_ == 0.0), terms.toSeq)
  }

  test("psi: a hard shift into the top decile crosses the 0.25 action threshold") {
    val base = (1 to 200).map(_.toDouble -> "base")
    val cur = (1 to 50).map(_ => 199.5 -> "cur")
    val df = (base ++ cur).toDF("v", "era")
    val out = Evaluation.psi(df, col("era") === "base",
        col("era") === "cur", col("v"))
      .select("bin", "n_base", "n_cur", "psi_term")
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._2).sum == 200 && out.map(_._3).sum == 50)
    // all current mass sits in bin 10
    assert(out.filter(_._1 == 10).map(_._3).sum == 50)
    assert(out.map(_._4).sum > 0.25, s"PSI ${out.map(_._4).sum}")
  }

  test("psi: non-decimal bin counts (k=3, 7) work — cut probabilities are exact rationals") {
    // the r12 exact-quantile migration hardcoded thousandth
    // probabilities, so k=3 (cuts at 1/3, 2/3) threw deep inside the
    // quantile machinery; probRational restores psi's own k>=2 contract
    val vals = (1 to 210).map(_.toDouble)
    val df = vals.map(v => (v, "base")).union(vals.map(v => (v, "cur")))
      .toDF("v", "era")
    for (k <- Seq(3, 7)) {
      val terms = Evaluation.psi(df, col("era") === "base",
          col("era") === "cur", col("v"), k = k)
        .select("psi_term").as[Double].collect()
      assert(terms.length == k && terms.forall(_ == 0.0),
        s"k=$k: ${terms.toSeq}")
    }
  }

  private def gini(vals: Seq[Double]): (Long, Double, Option[Double]) = {
    val df = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      .toDF("v", "id")
    Evaluation.gini(df, col("v"), col("id"))
      .as[(Long, Double, Option[Double])].head()
  }

  test("gini: equal shares give 0, one-holder-has-all gives (n-1)/n") {
    assert(gini(Seq(5, 5, 5, 5)) == (4L, 20.0, Some(0.0)))
    assert(gini(Seq(0, 0, 0, 10)) == (4L, 10.0, Some(0.75)))
  }

  test("gini: hand value on 1,2,3,4 and invariance to tie order") {
    // sum i*x = 30, sum x = 10, n = 4: G = 60/40 - 5/4 = 0.25
    assert(gini(Seq(1, 2, 3, 4))._3.contains(0.25))
    // ties: any rank permutation of equal values yields the same G
    assert(gini(Seq(2, 2, 1, 4, 1)) == gini(Seq(1, 1, 2, 2, 4)))
  }

  test("welchTTest: hand moments, and a single-observation side yields null") {
    val df = (Seq(1.0, 2.0, 3.0).map((_, "a")) ++
      Seq(5.0, 6.0, 7.0, 8.0).map((_, "b"))).toDF("v", "side")
    val got = Evaluation.welchTTest(df, col("side") === "a",
        col("side") === "b", col("v"))
      .as[(Long, Long, Option[Double], Option[Double])].head()
    // hand: ma=2 va=1 sa=1/3; mb=6.5 vb=5/3 sb=5/12
    val sa = 1.0 / 3; val sb = (5.0 / 3) / 4
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t = (2.0 - 6.5) / math.sqrt(sa + sb)
    val dof = (sa + sb) * (sa + sb) / (sa * sa / 2 + sb * sb / 3)
    assert(got._1 == 3L && got._2 == 4L)
    assert(got._3.contains(r4(t)) && got._4.contains(r4(dof)), s"got $got")

    val degenerate = (Seq(1.0).map((_, "a")) ++
      Seq(2.0, 3.0).map((_, "b"))).toDF("v", "side")
    val d = Evaluation.welchTTest(degenerate, col("side") === "a",
        col("side") === "b", col("v"))
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(d._3.isEmpty && d._4.isEmpty, s"got $d")
  }

  test("spearman: monotone nonlinear is 1.0, inverted is -1.0, constant is null") {
    val cube = Seq(1.0, 2.0, 3.0, 4.0).map(x => (x, x * x * x))
      .toDF("x", "y")
    assert(Evaluation.spearman(cube, col("x"), col("y"))
      .as[(Long, Option[Double])].head() == ((4L, Some(1.0))))
    val inv = Seq(1.0, 2.0, 3.0, 4.0).map(x => (x, -x * x * x))
      .toDF("x", "y")
    assert(Evaluation.spearman(inv, col("x"), col("y"))
      .as[(Long, Option[Double])].head() == ((4L, Some(-1.0))))
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "y")
    assert(Evaluation.spearman(const, col("x"), col("y"))
      .as[(Long, Option[Double])].head()._2.isEmpty)
  }

  test("spearman: ties take midranks (hand-computed rho)") {
    // x = 1,2,2,3 -> ranks 1, 2.5, 2.5, 4; y = 10,20,20,40 -> same
    // rank pattern on both sides -> rho exactly 1
    val tied = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0))
      .toDF("x", "y")
    assert(Evaluation.spearman(tied, col("x"), col("y"))
      .as[(Long, Option[Double])].head() == ((4L, Some(1.0))))
    // perturb one tie: x ranks 1, 2.5, 2.5, 4 vs y ranks 1, 2, 3, 4;
    // pearson over those rank vectors = 3/sqrt(2.5*2^2)... compute
    // directly from the midrank definition
    val mixed = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 30.0), (3.0, 40.0))
      .toDF("x", "y")
    val rx = Seq(1.0, 2.5, 2.5, 4.0); val ry = Seq(1.0, 2.0, 3.0, 4.0)
    val n = 4.0
    val (sx, sy) = (rx.sum, ry.sum)
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (rx.map(a => a * a).sum, ry.map(a => a * a).sum)
    val rho = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val expected = BigDecimal(rho)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(Evaluation.spearman(mixed, col("x"), col("y"))
      .as[(Long, Option[Double])].head() == ((4L, Some(expected))))
  }

  test("calibration: hand bins, top-inclusive edge, and the exact Brier") {
    // p=1.0 lands in bin 9 (top-inclusive), not a phantom bin 10
    val rows = Seq((0.05, false), (0.05, true), (0.95, true), (1.0, true))
      .toDF("p", "y")
    val got = Evaluation.calibration(rows, col("p"), col("y"), k = 10)
      .orderBy("bin")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val brier = BigDecimal(
      ((0.05 - 0) * (0.05 - 0) + (0.05 - 1) * (0.05 - 1)
        + (0.95 - 1) * (0.95 - 1) + 0.0) / 4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (0L, 2L, 0.05, 0.5, brier),
      (9L, 2L, 0.975, 1.0, brier)), s"got $got")
  }

  test("gini: zero-total and empty inputs yield null, not a crash") {
    assert(gini(Seq(0, 0))._3.isEmpty)
    val empty = Seq.empty[(Double, Long)].toDF("v", "id")
    assert(Evaluation.gini(empty, col("v"), col("id"))
      .select("gini").as[Option[Double]].head().isEmpty)
  }

  test("kruskalWallis: hand H with and without ties, tie correction") {
    // a=(1,2), b=(3,4): ranks 1..4, Ra=3, Rb=7
    // H = 12/(4·5)·(9/2 + 49/2) − 3·5 = 2.4; no ties -> corrected equal
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Evaluation.kruskalWallis(df, col("g"), col("v")).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L, s"got $r")
    assert(r.getDouble(2) == 2.4 && r.getDouble(3) == 2.4, s"got $r")
    // a=(1,1), b=(2,2): midranks 1.5/3.5, same H; T = 12,
    // C = 1 − 12/60 = 0.8 -> corrected 3.0
    val tied = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    val t = Evaluation.kruskalWallis(tied, col("g"), col("v")).head()
    assert(t.getDouble(2) == 2.4 && t.getDouble(3) == 3.0, s"got $t")
    // all values identical: C = 0 -> null corrected, never a crash
    val const = Seq(("a", 5.0), ("b", 5.0)).toDF("g", "v")
    assert(Evaluation.kruskalWallis(const, col("g"), col("v"))
      .head().isNullAt(3))
  }

  test("logRank: identical survival in both groups gives chi2 = 0") {
    import java.sql.Timestamp
    def ts(day: Int) = new Timestamp(day * 86400000L)
    // durations (1, 2) in each group, censorLastDays = 0 -> all events
    val events = Seq(
      ("u1", ts(0)), ("u1", ts(1)),
      ("u2", ts(0)), ("u2", ts(2)),
      ("u3", ts(0)), ("u3", ts(1)),
      ("u4", ts(0)), ("u4", ts(2))).toDF("user", "t")
    val r = Evaluation.logRank(events, "user", "t",
      groupA = col("user").isin("u1", "u2"), censorLastDays = 0).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, s"got $r")
    assert(r.getLong(2) == 2L && r.getDouble(3) == 2.0, s"got $r")
    assert(r.getDouble(4) == 0.0, s"identical curves must give chi2 0: $r")
  }

  test("averagePrecision: hand PR steps, perfect ranking 1.0, no positives null") {
    // scores 3,2,1 labels 1,0,1: AP = 0.5·1 + 0.5·(2/3) = 0.833333
    val df = Seq((3.0, true), (2.0, false), (1.0, true)).toDF("s", "y")
    val r = Evaluation.averagePrecision(df, col("y"), col("s")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L &&
      r.getDouble(2) == 0.833333, s"got $r")
    val perfect = Seq((2.0, true), (1.0, false)).toDF("s", "y")
    assert(Evaluation.averagePrecision(perfect, col("y"), col("s"))
      .head().getDouble(2) == 1.0)
    val nopos = Seq((2.0, false), (1.0, false)).toDF("s", "y")
    assert(Evaluation.averagePrecision(nopos, col("y"), col("s"))
      .head().isNullAt(2))
  }

  test("spearman/kruskalWallis/averagePrecision: binning a grid-valued fixture is exact (bins knob)") {
    // values already on an 8-point integer grid: 8-bin equal-width
    // quantization is injective on the support, and all three are
    // RANK statistics — binned ≡ exact, bit for bit (the x133
    // rocAuc-binning argument, extended to the whole rank family)
    val rows = (0 until 400).map { i =>
      val x = (i * 13 % 8).toDouble
      (x, (i * 7 % 8).toDouble, s"g${i % 3}", i % 11 == 0)
    }.toDF("x", "y", "g", "lab")
    val spExact = Evaluation.spearman(rows, col("x"), col("y")).collect().toSeq
    val spBinned = Evaluation.spearman(rows, col("x"), col("y"), bins = 8)
      .collect().toSeq
    assert(spExact == spBinned, s"$spExact vs $spBinned")
    val kwExact = Evaluation.kruskalWallis(rows, col("g"), col("x"))
      .collect().toSeq
    val kwBinned = Evaluation.kruskalWallis(rows, col("g"), col("x"), bins = 8)
      .collect().toSeq
    assert(kwExact == kwBinned, s"$kwExact vs $kwBinned")
    val apExact = Evaluation.averagePrecision(rows, col("lab"), col("x"))
      .collect().toSeq
    val apBinned = Evaluation.averagePrecision(rows, col("lab"), col("x"),
      bins = 8).collect().toSeq
    assert(apExact == apBinned, s"$apExact vs $apBinned")
  }

  test("bins > 0 bounds every rank window: quantization sits below each Window node") {
    // continuous scores (distinct ~ rows): with bins set, every Window
    // in the optimized plan must consume the quantized-and-aggregated
    // frame (<= bins rows), never raw distinct values — the r14
    // verdict's scale-killer, closed
    val cont = (0 until 300).map(i => (i * 0.017 + 1.0 / (i + 1), i % 5 == 0))
      .toDF("s", "lab")
    def windowChildren(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
          w.child.toString
      }
    val apW = windowChildren(
      Evaluation.averagePrecision(cont, col("lab"), col("s"), bins = 16))
    assert(apW.nonEmpty && apW.forall(c =>
      c.toLowerCase.contains("floor") && c.contains("Aggregate")),
      s"AP windows must sit above the quantized aggregate:\n${apW.mkString}")
    val kwW = windowChildren(Evaluation.kruskalWallis(
      cont.withColumn("g", col("lab").cast("string")), col("g"), col("s"),
      bins = 16))
    assert(kwW.nonEmpty && kwW.forall(c =>
      c.toLowerCase.contains("floor") && c.contains("Aggregate")),
      s"KW windows must sit above the quantized aggregate:\n${kwW.mkString}")
    val spW = windowChildren(Evaluation.spearman(
      cont.withColumn("y", col("s") * 2 + 1), col("s"), col("y"), bins = 16))
    assert(spW.nonEmpty && spW.forall(c =>
      c.toLowerCase.contains("floor") && c.contains("Aggregate")),
      s"spearman windows must sit above the quantized aggregate:\n${spW.mkString}")
  }

  test("kruskalWallis: no Long overflow in the N³ tie guard past 2^21 rows (ANSI)") {
    // N = 3M: N³ ≈ 2.7e19 > Long.MaxValue — the pre-r15 Long cube
    // raised ARITHMETIC_OVERFLOW under ANSI mode exactly here; the
    // DECIMAL(12,0)³ form is exact to 10^12 rows
    val big = spark.range(0, 3000000).selectExpr(
      "cast(pmod(id, 3) as string) as g", "cast(pmod(id, 10) as double) as v")
    val r = Evaluation.kruskalWallis(big, col("g"), col("v")).head()
    assert(r.getLong(0) == 3000000L && r.getLong(1) == 3L, s"got $r")
    assert(!r.isNullAt(3) && r.getDouble(3) >= 0.0, s"got $r")
  }

  test("kendallTauB: perfect +1/-1, hand tied case, constant side null, grid binning exact") {
    def tau(rows: Seq[(Double, Double)], bins: Int = 0): Option[Double] = {
      val df = rows.toDF("x", "y")
      val r = Evaluation.kendallTauB(df, col("x"), col("y"), bins = bins).head()
      if (r.isNullAt(1)) None else Some(r.getDouble(1))
    }
    val mono = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0))
    assert(tau(mono).contains(1.0))
    assert(tau(mono.map { case (a, b) => (a, -b) }).contains(-1.0))
    // x=(1,1,2,2), y=(1,2,3,4): P=4, Q=0, n0=6, tx=2, ty=0
    // tau_b = 4/sqrt(4*6) = 0.816497
    assert(tau(Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0), (2.0, 4.0)))
      .contains(0.816497))
    assert(tau(Seq((5.0, 1.0), (5.0, 2.0))).isEmpty, "constant x -> null")
    // integer grid 0..7: 8-bin quantization is injective -> identical
    val grid = (0 until 40).map(i => ((i * 13 % 8).toDouble, (i * 7 % 8).toDouble))
    assert(tau(grid, bins = 8) == tau(grid))
  }

  test("msprt: hand mixture LR, planted effect crosses the boundary, A/A and degenerates null/clean") {
    // hand case, tau = 1: treat {0.9, 1.1}, control {-0.1, 0.1} ->
    // ma=1, mb=0, va=vb=0.02, V=0.02/2+0.02/2=0.02, delta=1,
    // logLam = 0.5*ln(0.02/1.02) + 1/(2*0.02*1.02) = 22.543891;
    // p = exp(-22.54...) rounds to 0, reject at alpha=0.05
    val hand = Seq((1, 0.9), (1, 1.1), (0, -0.1), (0, 0.1)).toDF("t", "v")
    val r = Evaluation.msprt(hand, col("t") === 1, col("t") === 0,
      col("v"), tau = 1.0).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, s"got $r")
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 0.0
      && r.getDouble(4) == 1.0, s"got $r")
    assert(r.getDouble(5) == 22.543891 && r.getDouble(6) == 0.0
      && r.getInt(7) == 1, s"got $r")

    // planted effect +0.3 over +-0.5 alternating noise: the SAME
    // generator crosses the ln(1/alpha) boundary as n grows — the
    // sequential test's defining behavior (not significant early,
    // significant once evidence accumulates; the p-value was valid at
    // BOTH peeks)
    def arm(n: Int, shift: Double) =
      (0 until n).map(i => (shift > 0, shift + (if (i % 2 == 0) 0.5 else -0.5)))
    def run(n: Int) = {
      val df = (arm(n, 0.3) ++ arm(n, 0.0)).toDF("treat", "v")
      Evaluation.msprt(df, col("treat"), !col("treat"), col("v"),
        tau = 1.0).head()
    }
    val early = run(4)
    assert(early.getInt(7) == 0 && early.getDouble(6) == 1.0,
      s"n=4/arm must not reject: $early")
    val late = run(100)
    assert(late.getInt(7) == 1 && late.getDouble(6) < 0.05,
      s"n=100/arm must reject: $late")

    // A/A: identical arms -> delta 0 -> logLam < 0 -> p = 1, no reject
    val aa = ((0 until 20).map(i => (true, (i % 5).toDouble))
      ++ (0 until 20).map(i => (false, (i % 5).toDouble))).toDF("treat", "v")
    val aaR = Evaluation.msprt(aa, col("treat"), !col("treat"), col("v"),
      tau = 1.0).head()
    assert(aaR.getDouble(6) == 1.0 && aaR.getInt(7) == 0, s"got $aaR")

    // degenerate: single-row arm, and zero-variance arms -> null stats
    val tiny = Seq((1, 1.0), (0, 0.0), (0, 0.5)).toDF("t", "v")
    val tinyR = Evaluation.msprt(tiny, col("t") === 1, col("t") === 0,
      col("v")).head()
    assert(tinyR.isNullAt(5) && tinyR.isNullAt(6) && tinyR.isNullAt(7),
      s"got $tinyR")
    val const = Seq((1, 2.0), (1, 2.0), (0, 1.0), (0, 1.0)).toDF("t", "v")
    val constR = Evaluation.msprt(const, col("t") === 1, col("t") === 0,
      col("v")).head()
    assert(constR.isNullAt(5) && constR.isNullAt(7), s"got $constR")
  }

  test("srmCheck: hand chi-square, healthy split clean, missing arm contributes expected mass") {
    // 60/40 vs designed 50/50: chi = 2*(10^2/50) = 4.0 > 3.841 -> flag
    val biased = ((1 to 60).map(_ => "A") ++ (1 to 40).map(_ => "B")).toDF("arm")
    val b = Evaluation.srmCheck(biased, col("arm"),
      Seq(("A", 0.5), ("B", 0.5))).head()
    assert(b.getLong(0) == 100L && b.getInt(1) == 1
      && b.getDouble(2) == 4.0 && b.getInt(3) == 1, s"got $b")
    // 52/48: chi = 2*(2^2/50) = 0.16 -> clean
    val ok = ((1 to 52).map(_ => "A") ++ (1 to 48).map(_ => "B")).toDF("arm")
    val o = Evaluation.srmCheck(ok, col("arm"),
      Seq(("A", 0.5), ("B", 0.5))).head()
    assert(o.getDouble(2) == 0.16 && o.getInt(3) == 0, s"got $o")
    // an arm the splitter never emitted still contributes (0 - rN)^2:
    // all-A at 50/50 design -> chi = 5 + 5 = 10 on N=10
    val oneArm = (1 to 10).map(_ => "A").toDF("arm")
    val m = Evaluation.srmCheck(oneArm, col("arm"),
      Seq(("A", 0.5), ("B", 0.5))).head()
    assert(m.getDouble(2) == 10.0 && m.getInt(3) == 1, s"got $m")
    // out-of-design arm values are ignored, ratios must sum to 1
    val extra = (Seq("A", "A", "B", "B", "junk")).toDF("arm")
    assert(Evaluation.srmCheck(extra, col("arm"),
      Seq(("A", 0.5), ("B", 0.5))).head().getLong(0) == 4L)
    intercept[IllegalArgumentException] {
      Evaluation.srmCheck(extra, col("arm"), Seq(("A", 0.7), ("B", 0.5)))
    }
  }

  test("bhFdr: classic step-up, non-monotone rescue, none/all reject edges") {
    // p = [.01 .02 .04 .2], q = .1: thresholds k/40 -> reject first 3
    val ps = Seq(("m1", 0.01), ("m2", 0.02), ("m3", 0.04), ("m4", 0.2))
      .toDF("metric", "p")
    val got = Evaluation.bhFdr(ps, "metric", col("p"), q = 0.1)
      .orderBy("rank").select("metric", "rejected")
      .as[(String, Int)].collect().toSeq
    assert(got == Seq(("m1", 1), ("m2", 1), ("m3", 1), ("m4", 0)), s"got $got")
    // the DEFINING step-up behavior: p1 = .04 fails ITS OWN threshold
    // (.02) but the k=3 crossing rescues everything at or below rank 3
    val nm = Seq(("a", 0.04), ("b", 0.05), ("c", 0.051)).toDF("metric", "p")
    val nmGot = Evaluation.bhFdr(nm, "metric", col("p"), q = 0.06)
      .orderBy("rank").select("metric", "rejected")
      .as[(String, Int)].collect().toSeq
    assert(nmGot == Seq(("a", 1), ("b", 1), ("c", 1)), s"got $nmGot")
    // nothing passes -> zero rejections, null-free output
    val none = Seq(("a", 0.5), ("b", 0.9)).toDF("metric", "p")
    val noneGot = Evaluation.bhFdr(none, "metric", col("p"), q = 0.05)
      .select("rejected").as[Int].collect().toSeq
    assert(noneGot == Seq(0, 0), s"got $noneGot")
  }

  test("requiredSampleSize: hand Fleiss n, degenerate baselines null") {
    // p1 = 0.1, +10% relative: n = 14751 per arm (hand-computed)
    val df = (1 to 100).map(i => ("k", if (i <= 10) 1L else 0L))
      .toDF("key", "conv")
    val r = Evaluation.requiredSampleSize(df, "key", col("conv"),
      lit(1L), mde = 0.1).head()
    assert(r.getLong(1) == 100L && r.getDouble(2) == 0.1
      && r.getDouble(3) == 0.11 && r.getLong(4) == 14751L, s"got $r")
    // p1 = 0 -> null n; p2 >= 1 -> null n
    val zero = Seq(("z", 0L), ("z", 0L)).toDF("key", "conv")
    assert(Evaluation.requiredSampleSize(zero, "key", col("conv"),
      lit(1L)).head().isNullAt(4))
    val high = (1 to 100).map(i => ("h", if (i <= 95) 1L else 0L))
      .toDF("key", "conv")
    assert(Evaluation.requiredSampleSize(high, "key", col("conv"),
      lit(1L), mde = 0.1).head().isNullAt(4))
  }

  test("ratioMetricCI: hand delta-method variance with unit clustering") {
    // units: u1 (y=2, x=1), u2 (y=0, x=1), u3 (y=4 over 2 rows, x=2):
    // r = 6/4 = 1.5, vy=4, vx=1/3, cyx=1, varR = 1.75/(3*(4/3)^2),
    // se = 0.572822, CI = 1.5 +- 1.96*se (hand-computed)
    val df = Seq(("u1", 2.0, 1L), ("u2", 0.0, 1L),
      ("u3", 3.0, 1L), ("u3", 1.0, 1L)).toDF("u", "y", "x")
    val r = Evaluation.ratioMetricCI(df, "u", col("y"), col("x")).head()
    assert(r.getLong(0) == 3L && r.getDouble(1) == 1.5, s"got $r")
    assert(r.getDouble(2) == 0.572822 && r.getDouble(3) == 0.377269
      && r.getDouble(4) == 2.622731, s"got $r")
    // single unit -> null CI; zero denominator -> null ratio
    val one = Seq(("u1", 2.0, 1L)).toDF("u", "y", "x")
    val oneR = Evaluation.ratioMetricCI(one, "u", col("y"), col("x")).head()
    assert(oneR.isNullAt(2) && oneR.isNullAt(3), s"got $oneR")
    val zeroDen = Seq(("u1", 2.0, 0L), ("u2", 1.0, 0L)).toDF("u", "y", "x")
    assert(Evaluation.ratioMetricCI(zeroDen, "u", col("y"), col("x"))
      .head().isNullAt(1))
  }

  test("kendallTauB plan carries no cartesian / nested-loop θ-join at any bins (r15 verdict #3)") {
    // the Knight-form rewrite's point, pinned: the old ordered cell-
    // pair join (`__x1 < __x2`) planned a BroadcastNestedLoopJoin with
    // a comparison condition — quadratic pair work in cells. The grid
    // form's only BNLJ nodes are the house 1-row scalar crossJoins
    // (condition-free); nothing in the plan may compare across join
    // sides or fall back to CartesianProduct.
    val df = (0 until 200).map(i => ((i % 7).toDouble, (i % 5).toDouble))
      .toDF("x", "y")
    for (bins <- Seq(0, 8)) {
      val plan = Evaluation.kendallTauB(df, col("x"), col("y"), bins = bins)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"bins=$bins plan must not fall back to CartesianProduct:\n$plan")
      assert(!"""BroadcastNestedLoopJoin[^\n]*[<>]""".r.findFirstIn(plan).isDefined,
        s"bins=$bins plan must carry no θ-condition nested-loop join:\n$plan")
    }
  }

  test("mannWhitneyU: hand U and z on disjoint samples, degenerate sides null") {
    val df = Seq((1.0, "a"), (2.0, "a"), (3.0, "b"), (4.0, "b")).toDF("v", "g")
    val r = Evaluation.mannWhitneyU(df, col("g") === "a", col("g") === "b",
      col("v")).head()
    // R_A = 3, U = 0; var = (4/12)*5 = 5/3; z = -2/sqrt(5/3) = -1.5492
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, s"got $r")
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == -1.5492, s"got $r")
    // all tied -> sigma = 0 -> null z; one empty side -> nulls
    val tied = Seq((5.0, "a"), (5.0, "b")).toDF("v", "g")
    assert(Evaluation.mannWhitneyU(tied, col("g") === "a", col("g") === "b",
      col("v")).head().isNullAt(3))
    val empty = Seq((1.0, "a"), (2.0, "a")).toDF("v", "g")
    val e = Evaluation.mannWhitneyU(empty, col("g") === "a", col("g") === "b",
      col("v")).head()
    assert(e.isNullAt(2) && e.isNullAt(3), s"got $e")
  }

  test("jensenShannon: identical mix is 0, disjoint support is ln2 (norm 1)") {
    val same = Seq(("x", "a"), ("y", "a"), ("x", "b"), ("y", "b"))
      .toDF("v", "side")
    val s = Evaluation.jensenShannon(same, col("side") === "a",
      col("side") === "b", col("v")).head()
    assert(s.getDouble(2) == 0.0 && s.getDouble(3) == 0.0, s"got $s")
    val disjoint = Seq(("x", "a"), ("y", "b")).toDF("v", "side")
    val d = Evaluation.jensenShannon(disjoint, col("side") === "a",
      col("side") === "b", col("v")).head()
    assert(d.getDouble(2) == 0.693147 && d.getDouble(3) == 1.0, s"got $d")
  }

  test("lorenzCurve: hand buckets on 1..4, equal shares are linear") {
    val df = Seq((1.0, 1L), (2.0, 2L), (3.0, 3L), (4.0, 4L)).toDF("v", "id")
    val got = Evaluation.lorenzCurve(df, col("v"), col("id"), k = 2)
      .orderBy("bucket")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 3.0, 0.3), (2L, 2L, 7.0, 1.0)), s"got $got")
    val eq = Seq((5.0, 1L), (5.0, 2L), (5.0, 3L), (5.0, 4L)).toDF("v", "id")
    val lin = Evaluation.lorenzCurve(eq, col("v"), col("id"), k = 4)
      .orderBy("bucket")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(lin.map(_._4) == Seq(0.25, 0.5, 0.75, 1.0), s"got $lin")
  }

  test("cramerVonMises: hand value on overlapping samples, identical gives 0") {
    def cvm(a: Seq[Double], b: Seq[Double]): Double = {
      val df = (a.map((_, "a")) ++ b.map((_, "b"))).toDF("v", "side")
      Evaluation.cramerVonMises(df, col("side") === "a",
        col("side") === "b", col("v")).head().getDouble(2)
    }
    // A={1,2}, B={2,3}: terms 1·0.25 + 2·0.25 + 1·0 = 0.75;
    // T = (2·2/16)·0.75 = 0.1875
    assert(cvm(Seq(1, 2), Seq(2, 3)) == 0.1875)
    assert(cvm(Seq(1, 2, 3), Seq(1, 2, 3)) == 0.0)
  }

  test("etaSquared: perfectly explained is 1, identical groups 0, constant null") {
    val perfect = Seq(("a", 1.0), ("a", 1.0), ("b", 5.0), ("b", 5.0))
      .toDF("g", "v")
    val p = Evaluation.etaSquared(perfect, col("g"), col("v")).head()
    assert(p.getLong(0) == 4L && p.getLong(1) == 2L &&
      p.getDouble(2) == 1.0, s"got $p")
    val none = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    assert(Evaluation.etaSquared(none, col("g"), col("v"))
      .head().getDouble(2) == 0.0)
    val const = Seq(("a", 3.0), ("b", 3.0)).toDF("g", "v")
    assert(Evaluation.etaSquared(const, col("g"), col("v"))
      .head().isNullAt(2))
  }

  test("cohenKappa: hand 2x2 agreement, perfect 1, chance-level 0") {
    // 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no: po=0.7, pe=0.5, k=0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Evaluation.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .head()
    assert(r.getLong(0) == 50L && r.getDouble(1) == 0.7 &&
      r.getDouble(2) == 0.5 && r.getDouble(3) == 0.4, s"got $r")
    val perfect = Seq(("x", "x"), ("y", "y")).toDF("a", "b")
    assert(Evaluation.cohenKappa(perfect, col("a"), col("b"))
      .head().getDouble(3) == 1.0)
    // both raters constant on the same label: pe = 1 -> null kappa
    val degen = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Evaluation.cohenKappa(degen, col("a"), col("b"))
      .head().isNullAt(3))
  }

  test("rankingMetrics: hand NDCG/MRR/P/R at k=5, no-positive group nulls") {
    val items = Seq(
      (5.0, 1.0, 1L), (4.0, 0.0, 2L), (3.0, 1.0, 3L),
      (2.0, 0.0, 4L), (1.0, 1.0, 5L), (0.5, 1.0, 6L))
      .map { case (s, r, id) => ("q", s, r, id) }
      .toDF("q", "s", "rel", "id")
    val got = Evaluation.rankingMetrics(items, col("q"), col("s"),
      col("rel"), col("id"), k = 5).head()
    def r8(x: Double) =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val ln2 = 0.6931471805599453
    def term(r: Int) = r8(1.0 / (math.log(r + 1.0) / ln2))
    // relevant items rank 1/3/5 by score; 1/2/3/4 in the ideal order
    val dcg = term(1) + term(3) + term(5)
    val idcg = term(1) + term(2) + term(3) + term(4)
    val ndcg = BigDecimal(dcg.toDouble / idcg.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(1) == 6L, s"got $got")
    assert(got.getDouble(2) == ndcg, s"got $got expected $ndcg")
    assert(got.getDouble(3) == 1.0 && got.getDouble(4) == 0.6 &&
      got.getDouble(5) == 0.75, s"got $got")
    val nopos = Seq(("q", 2.0, 0.0, 1L), ("q", 1.0, 0.0, 2L))
      .toDF("q", "s", "rel", "id")
    val n = Evaluation.rankingMetrics(nopos, col("q"), col("s"),
      col("rel"), col("id"), k = 5).head()
    assert(n.isNullAt(2) && n.isNullAt(3) && n.getDouble(4) == 0.0 &&
      n.isNullAt(5), s"got $n")
  }

  test("betaShrunkRates: sparse keys pull toward the prior mean, heavy keys barely move") {
    // 20 keys at 50/100 (rate .5), one key at 1/1 (rate 1), one at 0/1
    val rows = (1 to 20).flatMap(k =>
      Seq((s"k$k", 50L, 100L))) ++ Seq(("hot", 1L, 1L), ("cold", 0L, 1L))
    val df = rows.toDF("key", "s", "t")
    val got = Evaluation.betaShrunkRates(
        df.selectExpr("key", "s AS succ", "t AS tri"), "key",
        col("succ"), col("tri"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    val (hotRaw, hotShrunk) = got("hot")
    val (coldRaw, coldShrunk) = got("cold")
    val (kRaw, kShrunk) = got("k1")
    assert(hotRaw == 1.0 && coldRaw == 0.0 && kRaw == 0.5)
    // one observation: both extremes shrink far toward ~0.5
    assert(hotShrunk < 0.9 && hotShrunk > 0.5, s"hot $hotShrunk")
    assert(coldShrunk > 0.1 && coldShrunk < 0.5, s"cold $coldShrunk")
    assert(hotShrunk + coldShrunk == 1.0,
      "symmetric evidence must shrink symmetrically around the mean")
    // 100 trials at the prior mean: essentially unmoved
    assert(math.abs(kShrunk - 0.5) < 0.01, s"k1 $kShrunk")
    // degenerate prior: every rate identical -> v = 0 -> null shrunk
    val flat = Seq(("a", 1L, 2L), ("b", 2L, 4L)).toDF("key", "s", "t")
    val f = Evaluation.betaShrunkRates(flat, "key", col("s"), col("t"))
      .collect()
    assert(f.forall(_.isNullAt(4)), "v = 0 must yield null shrunk rates")
  }

  test("wilsonInterval: hand 1/1 bound, band brackets the rate, lower-bound ranking sanity") {
    val df = Seq(("one", 1L, 1L), ("big", 95L, 100L))
      .flatMap { case (k, s, t) =>
        (1L to t).map(i => (k, if (i <= s) 1L else 0L, 1L)) }
      .toDF("key", "s", "t")
    val got = Evaluation.wilsonInterval(df, "key", col("s"), col("t"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // hand: s=t=1, p=1 -> lo = 1/(1+z^2) with z=1.96
    val z = 1.96; val z2 = z * z
    val lo11 = BigDecimal((1.0 + z2 / (2.0 * 1.0) - z * math.sqrt(
      1.0 * (1.0 - 1.0) / 1.0 + z2 / (4.0 * 1.0 * 1.0)))
      / (1.0 + z2 / 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("one")._2 == lo11, s"got ${got("one")} expected lo $lo11")
    got.values.foreach { case (p, lo, hi) =>
      assert(lo <= p && p <= hi, s"band must bracket the rate: $p in [$lo,$hi]")
    }
    // the whole point: 1/1 must NOT outrank 95/100 by lower bound
    assert(got("one")._2 < got("big")._2,
      s"1/1 lower bound must sit below 95/100's: $got")
  }

  test("cupedSummary: perfectly correlated covariate gives theta 2, full variance reduction") {
    val rows = (1 to 5).flatMap { u =>
      Seq((s"u$u", "pre", u.toDouble), (s"u$u", "post", 2.0 * u))
    }.toDF("unit", "era", "v")
    val got = Evaluation.cupedSummary(rows, "unit",
      col("era") === "pre", col("era") === "post", col("v")).head()
    assert(got.getLong(0) == 5L && got.getDouble(1) == 2.0, s"got $got")
    assert(got.getDouble(3) == 0.0 && got.getDouble(4) == 1.0,
      s"y = 2x exactly: adjusted variance 0, reduction 1: $got")
    // constant covariate: var_x = 0 -> null theta/reduction
    val flat = (1 to 4).flatMap(u =>
      Seq((s"u$u", "pre", 3.0), (s"u$u", "post", u.toDouble)))
      .toDF("unit", "era", "v")
    val f = Evaluation.cupedSummary(flat, "unit",
      col("era") === "pre", col("era") === "post", col("v")).head()
    assert(f.isNullAt(1) && f.isNullAt(4), s"got $f")
  }

  test("theilIndex: equal shares score exactly 0, hand two-value case, nonpositives excluded") {
    val df = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0),
      ("h", 1.0), ("h", 3.0), ("h", 0.0), ("h", -2.0)).toDF("k", "v")
    val got = Evaluation.theilIndex(df, Seq("k"), "v")
      .orderBy("k")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got(0) == (("g", 3L, 5.0, 0.0)), s"got ${got(0)}")
    // h: mu=2, terms .5·ln.5 and 1.5·ln1.5 rounded at 8dp, /2 -> .130812
    assert(got(1)._2 == 2L && got(1)._3 == 2.0 &&
      got(1)._4 == 0.130812, s"got ${got(1)}")
  }

  test("gainsTable: hand deciles over scores 1..10, top band captures everything") {
    val df = (1 to 10).map(i => (i.toDouble, if (i >= 9) 1L else 0L))
      .toDF("s", "y")
    val got = Evaluation.gainsTable(df, col("s"), col("y"), k = 5)
      .orderBy("band")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    // cutoffs 2.8/4.6/6.4/8.2: bands of 2; positives (9, 10) in band 1
    assert(got.map(g => (g._1, g._2, g._3)) ==
      (1 to 5).map(b => (b.toLong, 2L, if (b == 1) 2L else 0L)),
      s"got $got")
    assert(got.head._4 == 1.0 && got.head._5 == 5.0, s"got ${got.head}")
    assert(got(1)._4 == 1.0 && got(1)._5 == 2.5, s"got ${got(1)}")
    assert(got.last._5 == 1.0, s"full population lift is 1: ${got.last}")
  }

  test("poissonBootstrap: Scala weight twin ≡ engine, weights average ~1") {
    import spark.implicits._
    val keys = (1 to 2000).map(i => s"row$i")
    val df = keys.map(k => (k, 1.0)).toDF("k", "v")
    val engine = Evaluation.bootstrapMeans(df, col("k"), col("v"), b = 41)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // value 1.0 everywhere → each resample mean is exactly 1 (Σw/Σw)
    assert(engine.values.forall(_ == 1.0), s"constant-value means: $engine")
    // a Poisson(1) weight averages 1: per-seed Σw within 4σ of n
    val sums = (0 until 41).map(j =>
      keys.map(k => Evaluation.poissonWeightOf(j, k)).sum)
    assert(sums.forall(s => math.abs(s - 2000L) < 4 * math.sqrt(2000.0)),
      s"per-seed weight sums: $sums")
  }

  test("poissonBootstrap: CI brackets the true mean, deterministic across partitionings") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (s"r$i", (i % 100).toDouble))
      .toDF("k", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Evaluation.poissonBootstrapCI(d, col("k"), col("v"), b = 41)
        .collect().head
    val out = run(df)
    val mean = out.getAs[Double]("mean")
    val (lo, hi) = (out.getAs[Double]("ci_lo"), out.getAs[Double]("ci_hi"))
    assert(mean == 49.5 && lo < 49.5 && 49.5 < hi && lo < hi,
      s"CI [$lo, $hi] around $mean")
    // hash-based resampling: identical output on a different layout
    val again = run(df.repartition(17))
    assert(again.getAs[Double]("ci_lo") == lo &&
      again.getAs[Double]("ci_hi") == hi, "must be partition-invariant")
    intercept[IllegalArgumentException] {
      Evaluation.poissonBootstrapCI(df, col("k"), col("v"), b = 50)
    }
  }

  test("kaplanMeier: hand-computed product-limit curve with censoring") {
    import spark.implicits._
    // subjects: death@1, death@2, censor@2, death@3, censor@4, death@5
    val df = Seq((1L, 1L), (2L, 1L), (2L, 0L), (3L, 1L), (4L, 0L),
      (5L, 1L)).toDF("dur", "ev")
    val got = Evaluation.kaplanMeier(df, col("dur"), col("ev"))
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // event times only (t=4 is censor-only: no row)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 5L))
    val expected = Seq(
      (1L, 6L, 1L, 0L, 5.0 / 6.0),
      (2L, 5L, 1L, 1L, 5.0 / 6.0 * 4.0 / 5.0),
      (3L, 3L, 1L, 0L, 5.0 / 6.0 * 4.0 / 5.0 * 2.0 / 3.0),
      (5L, 1L, 1L, 0L, 0.0)) // risk set exhausted → exactly 0
    got.zip(expected).foreach { case ((t, n, d, c, s), (et, en, ed, ec, es)) =>
      assert(t == et && n == en && d == ed && c == ec,
        s"counts at t=$t: ($n,$d,$c)")
      assert(math.abs(s - es) < 2e-6, s"survival at t=$t: $s vs $es")
    }
    assert(got.last._5 == 0.0, "exhausted risk set pins survival to 0")
    // no-censoring sanity: survival at last event = 0, monotone
    val all = Evaluation.kaplanMeier(
      Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("dur", "ev"),
      col("dur"), col("ev")).orderBy("t").collect().map(_.getDouble(4))
    assert(all.zip(all.tail).forall { case (a, b) => a >= b } &&
      all.last == 0.0)
  }

  test("kaplanMeierGreenwood: hand-computed bands, clamped and dead-nulled") {
    import spark.implicits._
    val df = Seq((1L, 1L), (2L, 1L), (2L, 0L), (3L, 1L), (4L, 0L),
      (5L, 1L)).toDF("dur", "ev")
    val got = Evaluation.kaplanMeierGreenwood(df, col("dur"), col("ev"))
      .orderBy("t").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L))
    // Greenwood: G accumulates d/(n(n-d)); se = S * sqrt(G)
    val g1 = 1.0 / 30; val g2 = g1 + 1.0 / 20; val g3 = g2 + 1.0 / 6
    val s = Seq(5.0 / 6, 2.0 / 3, 4.0 / 9)
    val ses = Seq(s(0) * math.sqrt(g1), s(1) * math.sqrt(g2),
      s(2) * math.sqrt(g3))
    got.take(3).zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getAs[Double]("se") - ses(i)) < 1e-4,
        s"se at row $i: ${r.getAs[Double]("se")} vs ${ses(i)}")
      assert(math.abs(r.getAs[Double]("ci_lo") -
        math.max(0.0, s(i) - 1.96 * ses(i))) < 1e-4)
      assert(math.abs(r.getAs[Double]("ci_hi") -
        math.min(1.0, s(i) + 1.96 * ses(i))) < 1e-4)
    }
    // t=1: upper band would be 1.13 -> clamps to exactly 1
    assert(got(0).getAs[Double]("ci_hi") == 1.0)
    // exhausted risk set: survival 0, band null (increment undefined)
    assert(got(3).getAs[Double]("survival") == 0.0)
    assert(got(3).isNullAt(got(3).fieldIndex("se")))
    assert(got(3).isNullAt(got(3).fieldIndex("ci_lo")))
  }

  test("rmst: hand-computed areas, tail and empty-curve conventions") {
    import spark.implicits._
    val df = Seq((1L, 1L), (2L, 1L), (2L, 0L), (3L, 1L), (4L, 0L),
      (5L, 1L)).toDF("dur", "ev")
    // tau=4: 1*1 + 0.833333*1 + 0.666667*1 + 0.444444*(4-3)
    val at4 = Evaluation.rmst(df, col("dur"), col("ev"), tau = 4L).head()
    assert(at4.getAs[Long]("tau") == 4L && at4.getAs[Long]("n_steps") == 4L)
    assert(math.abs(at4.getAs[Double]("rmst") - 2.944444) < 1e-5)
    // tau=10: curve ends at t=5 with survival exactly 0 -> no tail mass
    val at10 = Evaluation.rmst(df, col("dur"), col("ev"), tau = 10L).head()
    assert(math.abs(at10.getAs[Double]("rmst") - 3.388888) < 1e-5)
    // all-censored input: empty curve integrates survival 1 to tau
    val cens = Seq((3L, 0L), (7L, 0L)).toDF("dur", "ev")
    val flat = Evaluation.rmst(cens, col("dur"), col("ev"), tau = 30L).head()
    assert(flat.getAs[Long]("n_steps") == 0L &&
      flat.getAs[Double]("rmst") == 30.0)
    intercept[IllegalArgumentException] {
      Evaluation.rmst(df, col("dur"), col("ev"), tau = 0L)
    }
  }

  test("cmhTest: hand-computed two-stratum pooled test and MH odds ratio") {
    import spark.implicits._
    // stratum A: treat 3 (2 success), control 3 (1 success)
    // stratum B: treat 2 (1 success), control 2 (0 success)
    val rows = Seq(
      ("A", 1, 1), ("A", 1, 1), ("A", 1, 0),
      ("A", 0, 1), ("A", 0, 0), ("A", 0, 0),
      ("B", 1, 1), ("B", 1, 0), ("B", 0, 0), ("B", 0, 0))
      .toDF("s", "t", "y")
    val got = Evaluation.cmhTest(rows, col("s"), col("t") === 1,
      col("y") === 1).head()
    assert(got.getAs[Long]("k_strata") == 2L)
    assert(got.getAs[Long]("n_total") == 10L)
    assert(got.getAs[Long]("observed") == 3L)
    // E = 1.5 + 0.5; V = 81/180 + 12/48 = 0.45 + 0.25
    assert(math.abs(got.getAs[Double]("expected") - 2.0) < 1e-6)
    assert(math.abs(got.getAs[Double]("variance") - 0.7) < 1e-6)
    assert(math.abs(got.getAs[Double]("cmh_chi2") - 1.0 / 0.7) < 1e-4)
    // OR = (2*2/6 + 1*2/4) / (1*1/6 + 0) = 7
    assert(math.abs(got.getAs[Double]("mh_odds_ratio") - 7.0) < 1e-4)
    // single-subject strata: E contributes, variance does not
    val tiny = Seq(("A", 1, 1), ("B", 1, 1), ("B", 0, 0))
      .toDF("s", "t", "y")
    val deg = Evaluation.cmhTest(tiny, col("s"), col("t") === 1,
      col("y") === 1).head()
    assert(math.abs(deg.getAs[Double]("expected") - 1.5) < 1e-6)
    assert(math.abs(deg.getAs[Double]("variance") - 0.25) < 1e-6)
  }

  test("holmAdjust: classic step-down, monotone clamp, FWER rejection") {
    import spark.implicits._
    val df = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.04))
      .toDF("k", "p")
    val got = Evaluation.holmAdjust(df, "k", col("p"), alpha = 0.05)
      .orderBy("rank").collect()
    // steps 0.04, 0.06, 0.06, 0.04 -> running max 0.04, 0.06, 0.06, 0.06
    val adj = got.map(_.getAs[Double]("holm_adjusted")).toSeq
    assert(adj == Seq(0.04, 0.06, 0.06, 0.06), s"got $adj")
    assert(got.map(_.getAs[Int]("rejected")).toSeq == Seq(1, 0, 0, 0))
    assert(adj.zip(adj.tail).forall { case (a, b) => a <= b },
      "adjusted p must be monotone in rank")
    // clamp at 1: a large p times a large factor saturates
    val big = Evaluation.holmAdjust(
      Seq(("a", 0.9), ("b", 0.95), ("c", 0.99)).toDF("k", "p"),
      "k", col("p")).orderBy("rank").collect()
    assert(big.forall(_.getAs[Double]("holm_adjusted") == 1.0))
  }

  test("woeIv: hand two-bin WOE and IV, empty-side bins null out") {
    import spark.implicits._
    // values 1..20, 2 bins -> bin0 = 1..10 (2 events), bin1 = 11..20
    // (8 events): woe = ±ln 4, IV = 2 * 0.6 * ln 4
    val rows = (1 to 20).map(v => (v.toDouble,
      if (v <= 10) v <= 2 else v <= 18))
    val got = Evaluation.woeIv(rows.toDF("v", "y"), col("y"), col("v"),
      bins = 2).orderBy("bin").collect()
    assert(got.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L))
    assert(got.map(_.getAs[Long]("events")).toSeq == Seq(2L, 8L))
    val ln4 = math.log(4.0)
    assert(math.abs(got(0).getAs[Double]("woe") - -ln4) < 1e-5)
    assert(math.abs(got(1).getAs[Double]("woe") - ln4) < 1e-5)
    assert(math.abs(got(0).getAs[Double]("iv_total") - 1.2 * ln4) < 1e-4)
    assert(got(0).getAs[Double]("iv_total") ==
      got(1).getAs[Double]("iv_total"))
    // a bin empty on either side has undefined WOE and no IV mass
    val deg = Evaluation.woeIv(
      Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
        .toDF("v", "y"), col("y"), col("v"), bins = 2)
      .orderBy("bin").collect()
    assert(deg.forall(_.isNullAt(deg.head.fieldIndex("woe"))))
    assert(deg.forall(_.isNullAt(deg.head.fieldIndex("iv_total"))))
    intercept[IllegalArgumentException] {
      Evaluation.woeIv(rows.toDF("v", "y"), col("y"), col("v"), bins = 1)
    }
  }

  test("didEstimate: hand-computed four-cell effect and pooled SE") {
    import spark.implicits._
    val rows = Seq(
      (0, 0, 1.0), (0, 0, 3.0), (0, 1, 2.0), (0, 1, 4.0),
      (1, 0, 1.0), (1, 0, 5.0), (1, 1, 6.0), (1, 1, 8.0))
      .toDF("g", "p", "v")
    val got = Evaluation.didEstimate(rows, col("g") === 1, col("p") === 1,
      col("v")).head()
    assert(got.getAs[Long]("k_cells") == 4L && got.getAs[Long]("n_rows") == 8L)
    // (7-3) - (3-2) = 3; se = sqrt(1+1+4+1) = sqrt(7)
    assert(math.abs(got.getAs[Double]("did_effect") - 3.0) < 1e-6)
    assert(math.abs(got.getAs[Double]("se") - math.sqrt(7.0)) < 1e-5)
    assert(math.abs(got.getAs[Double]("t_stat") - 3.0 / math.sqrt(7.0)) < 1e-5)
    // a missing cell nulls the estimate rather than mis-reading 3 cells
    val threeCells = rows.filter(!(col("g") === 1 && col("p") === 1))
    val deg = Evaluation.didEstimate(threeCells, col("g") === 1,
      col("p") === 1, col("v")).head()
    assert(deg.getAs[Long]("k_cells") == 3L &&
      deg.isNullAt(deg.fieldIndex("did_effect")))
  }

  test("plan pin: the r16 eval chains carry no CartesianProduct and " +
      "their windows sit above the bounded cell tables") {
    import spark.implicits._
    val df = (0 until 100).map(i =>
      (i.toDouble, i % 2 == 0, i % 3 == 0)).toDF("s", "t", "y")
    val plans = Seq(
      Evaluation.qiniCurve(df, col("s"), col("t"), col("y"), bins = 8),
      Evaluation.stratifiedAte(df, col("s"), col("t"), col("y")),
      Evaluation.hellingerDrift(df, col("s"), col("t"), bins = 8),
      Evaluation.optimalThreshold(df, col("s"), col("y"), bins = 8))
      .map(_.queryExecution.executedPlan.toString)
    plans.foreach(p => assert(!p.contains("CartesianProduct"),
      s"plan fell back to CartesianProduct:\n$p"))
  }

  test("labelShiftBbse recovers the planted target prior from " +
      "predictions alone") {
    import spark.implicits._
    // validation: tpr = .8 (4/5 pos pred+), fpr = .2 (1/5 neg pred+)
    // target prior .75 -> mu = .75*.8 + .25*.2 = .65 -> q = .75
    val valid = (Seq.fill(4)((true, true, true)) ++
      Seq((true, true, false)) ++ Seq((true, false, true)) ++
      Seq.fill(4)((true, false, false)))
      .map { case (v, y, p) => (v, y, p) }
    // target rows: label column is ignored on the target side; mu
    // rate .65 planted directly via 13/20 positive predictions
    val target = (Seq.fill(13)((false, false, true)) ++
      Seq.fill(7)((false, false, false)))
    val df = (valid ++ target).toDF("v", "y", "p")
    val r = Evaluation.labelShiftBbse(df, col("v"), col("y"), col("p"))
      .head()
    assert(r.getAs[Long]("n_valid") === 10L)
    assert(r.getAs[Long]("n_target") === 20L)
    assert(r.getAs[Double]("valid_prior") === 0.5)
    assert(r.getAs[Double]("target_pred_rate") === 0.65)
    assert(r.getAs[Double]("shifted_prior") === 0.75)
    assert(r.getAs[Double]("shifted_prior_clamped") === 0.75)
  }

  test("cochranArmitage: hand monotone fixture z = 2.828427, " +
      "reversed trend flips the sign") {
    import spark.implicits._
    val rows = (Seq.fill(4)((0, false)) ++
      Seq.fill(2)((1, true)) ++ Seq.fill(2)((1, false)) ++
      Seq.fill(4)((2, true))).toDF("d", "e")
    val r = Evaluation.cochranArmitage(rows, col("d"), col("e")).head()
    assert(r.getAs[Long]("n") === 12L)
    assert(r.getAs[Double]("event_rate") === 0.5)
    assert(r.getAs[Double]("z") === 2.828427) // 4/sqrt(2)
    val rev = rows.select((lit(2) - col("d")).as("d"), col("e"))
    val z2 = Evaluation.cochranArmitage(rev, col("d"), col("e"))
      .head().getAs[Double]("z")
    assert(z2 === -2.828427)
  }

  test("hellingerDrift: identical arms read 0, disjoint arms read 1, " +
      "one-sided input yields the empty result") {
    import spark.implicits._
    val same = Seq((1.0, true), (1.0, false), (5.0, true), (5.0, false))
      .toDF("v", "a")
    val s = Evaluation.hellingerDrift(same, col("v"), col("a"),
      bins = 4).head()
    assert(s.getAs[Double]("bhattacharyya") === 1.0)
    assert(s.getAs[Double]("hellinger") === 0.0)
    val dis = Seq((0.0, true), (0.0, true), (10.0, false), (10.0, false))
      .toDF("v", "a")
    val d = Evaluation.hellingerDrift(dis, col("v"), col("a"),
      bins = 4).head()
    assert(d.getAs[Double]("bhattacharyya") === 0.0)
    assert(d.getAs[Double]("hellinger") === 1.0)
    val oneSided = Seq((1.0, true), (2.0, true)).toDF("v", "a")
    assert(Evaluation.hellingerDrift(oneSided, col("v"), col("a"))
      .count() === 0L)
  }

  test("optimalThreshold picks the separating cut on clean data") {
    import spark.implicits._
    val df = (Seq.fill(3)((0.9, true)) ++ Seq.fill(3)((0.1, false)))
      .toDF("s", "y")
    val r = Evaluation.optimalThreshold(df, col("s"), col("y")).head()
    assert(r.getAs[Double]("threshold_j") === 0.9)
    assert(r.getAs[Double]("youden_j") === 1.0)
    assert(r.getAs[Double]("threshold_utility") === 0.9)
    assert(r.getAs[Double]("utility") === 0.5) // (3*1 - 0)/6
  }

  test("leveneTest matches the hand two-group fixture") {
    import spark.implicits._
    // Z_A = {2,1,3}, Z_B = {2,2,4}: B = 2/3, W = 14/3
    // -> W_stat = (6-2)/(2-1) * (2/3)/(14/3) = 4/7
    val df = (Seq(0.0, 1.0, 5.0).map(("A", _)) ++
      Seq(10.0, 10.0, 16.0).map(("B", _))).toDF("g", "v")
    val r = Evaluation.leveneTest(df, col("g"), col("v")).head()
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("groups") === 2L)
    assert(r.getAs[Double]("w_stat") === 0.571429) // 4/7
  }

  test("anovaF matches the hand fixture") {
    import spark.implicits._
    val df = (Seq(1.0, 2.0, 3.0).map(("A", _)) ++
      Seq(4.0, 5.0, 6.0).map(("B", _))).toDF("g", "v")
    val r = Evaluation.anovaF(df, col("g"), col("v")).head()
    assert(r.getAs[Double]("ms_between") === 13.5)
    assert(r.getAs[Double]("ms_within") === 1.0)
    assert(r.getAs[Double]("f_stat") === 13.5)
  }

  test("calibrationByGroup separates the calibrated segment from " +
      "the overconfident one") {
    import spark.implicits._
    val rows = (Seq.fill(4)(("g1", 0.8, true)) ++ Seq(("g1", 0.8, false))
      ++ Seq(("g1", 0.2, true)) ++ Seq.fill(4)(("g1", 0.2, false))
      ++ Seq.fill(2)(("g2", 0.9, true)) ++ Seq.fill(2)(("g2", 0.9, false)))
      .toDF("g", "p", "y")
    val out = Evaluation.calibrationByGroup(rows, col("g"), col("p"),
      col("y")).collect().map(r => r.getString(0) ->
        (r.getAs[Double]("ece"), r.getAs[Double]("mce"),
          r.getAs[Double]("brier"))).toMap
    assert(out("g1") === ((0.0, 0.0, 0.16)))
    assert(out("g2") === ((0.4, 0.4, 0.41)))
  }

  test("mcnemar counts only discordant pairs, continuity-corrected") {
    import spark.implicits._
    val df = (Seq.fill(6)((true, false)) ++ Seq.fill(2)((false, true)) ++
      Seq.fill(5)((true, true)) ++ Seq.fill(3)((false, false)))
      .toDF("ca", "cb")
    val r = Evaluation.mcnemar(df, col("ca"), col("cb")).head()
    assert(r.getAs[Long]("b") === 6L)
    assert(r.getAs[Long]("c") === 2L)
    assert(r.getAs[Double]("chi2") === 1.125) // (|6-2|-1)^2/8
    assert(r.getAs[Long]("n") === 16L)
  }

  test("cochranQ matches the hand 3x4 fixture and drops partial items") {
    import spark.implicits._
    val rows = Seq(
      ("i1", "r1", true), ("i1", "r2", true), ("i1", "r3", false),
      ("i2", "r1", true), ("i2", "r2", true), ("i2", "r3", false),
      ("i3", "r1", true), ("i3", "r2", false), ("i3", "r3", false),
      ("i4", "r1", false), ("i4", "r2", false), ("i4", "r3", false),
      ("part", "r1", true)) // missing r2/r3 -> dropped
      .toDF("i", "r", "x")
    val q = Evaluation.cochranQ(rows, col("i"), col("r"), col("x"))
      .head()
    assert(q.getAs[Long]("items") === 4L)
    assert(q.getAs[Long]("k") === 3L)
    assert(q.getAs[Long]("successes") === 5L)
    assert(q.getAs[Double]("q") === 4.666667) // 2*(3*13-25)/(15-9)
  }

  test("brierDecomposition: Murphy identity holds on the calibrated " +
      "and miscalibrated fixtures") {
    import spark.implicits._
    // perfectly calibrated: p=.8 bin has 4/5 positives, p=.2 has 1/5
    val cal = (Seq.fill(4)((0.8, true)) ++ Seq((0.8, false)) ++
      Seq((0.2, true)) ++ Seq.fill(4)((0.2, false))).toDF("p", "y")
    val c = Evaluation.brierDecomposition(cal, col("p"), col("y")).head()
    assert(c.getAs[Double]("brier") === 0.16)
    assert(c.getAs[Double]("reliability") === 0.0)
    assert(c.getAs[Double]("resolution") === 0.09)
    assert(c.getAs[Double]("uncertainty") === 0.25)
    assert(c.getAs[Double]("ece") === 0.0)
    assert(c.getAs[Double]("mce") === 0.0)
    // overconfident: p=.9 everywhere, outcomes 50/50
    val over = (Seq.fill(2)((0.9, true)) ++ Seq.fill(2)((0.9, false)))
      .toDF("p", "y")
    val o = Evaluation.brierDecomposition(over, col("p"), col("y")).head()
    assert(o.getAs[Double]("brier") === 0.41)
    assert(o.getAs[Double]("reliability") === 0.16)
    assert(o.getAs[Double]("resolution") === 0.0)
    assert(o.getAs[Double]("ece") === 0.4)
    assert(o.getAs[Double]("mce") === 0.4)
  }

  test("qiniCurve matches the hand-computed three-band fixture") {
    import spark.implicits._
    val df = Seq(
      (3.0, true, true), (3.0, true, false), (3.0, false, false),
      (2.0, false, true), (2.0, true, true),
      (1.0, false, true), (1.0, true, false)).toDF("s", "t", "y")
    val out = Evaluation.qiniCurve(df, col("s"), col("t"), col("y"),
      bins = 0).orderBy(col("score_bin").desc).collect()
    assert(out.map(_.getAs[Double]("qini")).toSeq
      === Seq(1.0, 0.5, -0.666667))
    assert(out.map(_.getAs[Double]("uplift")).toSeq
      === Seq(0.5, 0.166667, -0.166667))
    assert(out.head.getAs[Long]("cum_treated") === 2L)
    assert(out.last.getAs[Long]("cum_control") === 3L)
  }

  test("stratifiedAte: the stratified and IPW forms coincide on " +
      "both-arm strata and drop single-arm strata") {
    import spark.implicits._
    val df = Seq(
      ("A", true, 10.0), ("A", false, 0.0),
      ("B", true, 2.0), ("B", true, 4.0), ("B", false, 1.0),
      ("solo", true, 99.0)) // no control arm -> dropped
      .toDF("g", "t", "y")
    val r = Evaluation.stratifiedAte(df, col("y"), col("t"), col("g"))
      .head()
    assert(r.getAs[Long]("strata") === 2L)
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Double]("ate_stratified") === 5.2)
    assert(r.getAs[Double]("ate_ipw") === 5.2)
  }
}
